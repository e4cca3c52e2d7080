#!/usr/bin/env bash
# Fetch the Maestro v1.0.0 MIDI corpus (counterpart of reference
# data/get_data.sh). Run from the directory that should hold the
# dataset, then encode with:
#   python cli/encode.py --input_folder maestro-v1.0.0 \
#       --output_folder maestro_magenta_s5_t3 --mode midi_to_npy \
#       --encode_official_maestro
set -euo pipefail
wget https://storage.googleapis.com/magentadata/datasets/maestro/v1.0.0/maestro-v1.0.0-midi.zip
unzip maestro-v1.0.0-midi.zip
