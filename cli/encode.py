#!/usr/bin/env python
"""Preprocessing CLI — counterpart of reference data/music_encoder.py.

Same flags and modes (--mode {to_txt, to_midi, midi_to_npy, npy_to_midi},
--stretch_factors, --pitch_transpose_lower/upper, --encode_official_maestro)
over the from-scratch codec. Train split gets the 35x augmentation grid,
valid/test the canonical encoding (reference music_encoder.py:158-173).
"""

import argparse
import functools
import multiprocessing as mpl
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_CURR_DIR = os.path.realpath(os.path.dirname(os.path.realpath(__file__)))
MAESTRO_V1_DIR = os.path.join(_CURR_DIR, "..", "data", "maestro-v1.0.0")


def find_files_by_extensions(root, exts):
    for dirpath, _, files in os.walk(root):
        for fname in files:
            if os.path.splitext(fname)[1].lower() in exts:
                yield os.path.join(dirpath, fname)


def read_maestro_meta_info(data_dir):
    """Maestro v1/v2 CSV split parsing (reference music_encoder.py:27-56),
    without pandas: returns {split: [midi_filename, ...]}."""
    import csv
    for version in ("maestro-v1.0.0.csv", "maestro-v2.0.0.csv"):
        csv_path = os.path.join(data_dir, version)
        if os.path.exists(csv_path):
            break
    else:
        raise ValueError("Cannot find valid csv files!")
    splits = {"train": [], "validation": [], "test": []}
    with open(csv_path, newline="", encoding="utf-8") as f:
        for row in csv.DictReader(f):
            splits[row["split"]].append(row["midi_filename"])
    return splits


def get_midi_paths(maestro_dir):
    if not os.path.exists(maestro_dir):
        raise ValueError(
            "Cannot find maestro-v1.0.0; download and extract the data.")
    splits = read_maestro_meta_info(maestro_dir)
    return tuple(
        [os.path.join(maestro_dir, p) for p in splits[k]]
        for k in ("train", "validation", "test"))


# Worker functions are module-level (with the encoder in a global set before
# the fork) so multiprocessing.Pool can dispatch them (the reference relies on
# the same fork-inherits-globals property, music_encoder.py:108-135).
ENCODER = None


def _out_path(path, out_dir, ext):
    filename, _ = os.path.splitext(os.path.basename(path))
    return os.path.join(out_dir, filename + ext)


def run_to_text(path, out_dir):
    ENCODER.to_text(path, _out_path(path, out_dir, ".txt"))


def run_to_text_trans(path, out_dir):
    ENCODER.to_text_transposition(path, _out_path(path, out_dir, ".txt"))


def run_to_npy(path, out_dir):
    ENCODER.to_npy(path, _out_path(path, out_dir, ".npy"))


def run_to_npy_trans(path, out_dir):
    ENCODER.to_npy_transposition(path, _out_path(path, out_dir, ".npy"))


def run_from_text(path, out_dir):
    ENCODER.from_text(path, _out_path(path, out_dir, ".mid"))


def run_npy_to_midi(path, out_dir):
    ENCODER.npy_to_midi(path, _out_path(path, out_dir, ".mid"))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--input_folder", type=str, default=MAESTRO_V1_DIR,
                        help="Directory with the downloaded MAESTRO dataset")
    parser.add_argument("--output_folder", type=str, required=True,
                        help="Directory to encode the event signals")
    parser.add_argument("--encode_official_maestro", action="store_true",
                        help="Whether to encode the official Maestro dataset.")
    parser.add_argument("--mode", type=str, default="to_txt",
                        choices=["to_txt", "to_midi", "midi_to_npy",
                                 "npy_to_midi"],
                        help="Convert to/from MIDIs to TXT/Numpy")
    parser.add_argument("--stretch_factors", type=str,
                        default="0.95,0.975,1.0,1.025,1.05")
    parser.add_argument("--pitch_transpose_lower", type=int, default=-3)
    parser.add_argument("--pitch_transpose_upper", type=int, default=3)
    args = parser.parse_args()

    from transformer_gan_tpu.data.codec import PerformanceEventRepo

    global ENCODER
    stretch_factors = [float(x) for x in args.stretch_factors.split(",")]
    ENCODER = PerformanceEventRepo(
        steps_per_second=100, num_velocity_bins=32,
        stretch_factors=stretch_factors,
        pitch_transpose_lower=args.pitch_transpose_lower,
        pitch_transpose_upper=args.pitch_transpose_upper)
    encoder = ENCODER

    num_cpus = max(1, mpl.cpu_count() - 1)
    os.makedirs(args.output_folder, exist_ok=True)

    if args.mode in ("to_txt", "midi_to_npy"):
        if args.mode == "to_txt":
            convert_transposition_f, convert_f = run_to_text_trans, run_to_text
        else:
            convert_transposition_f, convert_f = run_to_npy_trans, run_to_npy

        if args.encode_official_maestro:
            train_paths, valid_paths, test_paths = get_midi_paths(
                args.input_folder)
            print("Load MAESTRO from {}. Train/Val/Test={}/{}/{}".format(
                args.input_folder, len(train_paths), len(valid_paths),
                len(test_paths)))
            for split_name, midi_paths in [("train", train_paths),
                                           ("valid", valid_paths),
                                           ("test", test_paths)]:
                convert_function = (convert_transposition_f
                                    if split_name == "train" else convert_f)
                out_split_dir = os.path.join(args.output_folder, split_name)
                os.makedirs(out_split_dir, exist_ok=True)
                start = time.time()
                with mpl.Pool(num_cpus) as pool:
                    pool.map(functools.partial(convert_function,
                                               out_dir=out_split_dir),
                             midi_paths)
                print("Split {} converted! Spent {:.1f}s to convert {}"
                      " samples.".format(split_name, time.time() - start,
                                         len(midi_paths)))
            encoder.create_vocab_txt(args.output_folder)
        else:
            midi_paths = list(find_files_by_extensions(
                args.input_folder, {".mid", ".midi"}))
            start = time.time()
            with mpl.Pool(num_cpus) as pool:
                pool.map(functools.partial(convert_f,
                                           out_dir=args.output_folder),
                         midi_paths)
            print("Converted {} midi files in {:.1f}s.".format(
                len(midi_paths), time.time() - start))
    else:
        convert_f = (run_from_text if args.mode == "to_midi"
                     else run_npy_to_midi)
        ext = {".npy"} if args.mode == "npy_to_midi" else {".txt"}
        input_paths = list(find_files_by_extensions(args.input_folder, ext))
        start = time.time()
        with mpl.Pool(num_cpus) as pool:
            pool.map(functools.partial(convert_f,
                                       out_dir=args.output_folder),
                     input_paths)
        print("Converted! Spent {:.1f}s to convert {} samples.".format(
            time.time() - start, len(input_paths)))


if __name__ == "__main__":
    main()
