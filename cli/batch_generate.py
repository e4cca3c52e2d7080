#!/usr/bin/env python
"""Batch inference — counterpart of reference model/batch_generate.py:
loop generation over prefix files x sampling configurations, then convert
the token text outputs to MIDI (reference :40-42 shells out to
music_encoder --mode to_midi; here the codec is called in-process).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def generate_files(model_directory, checkpoint_name, vocab_file,
                   output_base, prefixes, sampling_configs,
                   memory_length=4146, generation_length=4096,
                   num_midi_files=1, num_conditional_tokens=50):
    from transformer_gan_tpu.config import get_default_cfg_inference
    from transformer_gan_tpu.data.codec import PerformanceEventRepo

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import generate as generate_cli

    repo = PerformanceEventRepo()
    runs = []
    for prefix in (prefixes or [None]):
        for scfg in sampling_configs:
            tag = "{}_{}_{}".format(
                os.path.splitext(os.path.basename(prefix))[0]
                if prefix else "uncond",
                scfg["technique"], scfg["temperature"])
            out_dir = os.path.join(output_base, tag)

            icfg = get_default_cfg_inference()
            icfg.defrost()
            icfg.EVENT.vocab_file_path = vocab_file
            icfg.MODEL.model_directory = model_directory
            icfg.MODEL.checkpoint_name = checkpoint_name
            icfg.MODEL.memory_length = memory_length
            icfg.SAMPLING.technique = scfg["technique"]
            icfg.SAMPLING.threshold = float(scfg.get("threshold", 32.0))
            icfg.SAMPLING.temperature = float(scfg["temperature"])
            icfg.GENERATION.generation_length = generation_length
            icfg.INPUT.time_extension = prefix is not None
            icfg.INPUT.conditional_input_melody = prefix or "Null"
            icfg.INPUT.num_conditional_tokens = num_conditional_tokens
            icfg.INPUT.num_midi_files = num_midi_files
            icfg.OUTPUT.output_txt_directory = out_dir
            icfg.freeze()

            print(f"=== generating {tag} ===")
            generate_cli.main(icfg)

            midi_dir = os.path.join(out_dir, "midi")
            os.makedirs(midi_dir, exist_ok=True)
            for fname in os.listdir(out_dir):
                if fname.endswith(".txt") and fname[0].isdigit():
                    repo.from_text(
                        os.path.join(out_dir, fname),
                        os.path.join(midi_dir,
                                     fname.replace(".txt", ".mid")))
            runs.append(out_dir)
    return runs


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--model_directory", type=str, required=True)
    parser.add_argument("--checkpoint_name", type=str,
                        default="checkpoint_best")
    parser.add_argument("--vocab_file", type=str, required=True)
    parser.add_argument("--output_base", type=str, required=True)
    parser.add_argument("--prefix", type=str, action="append", default=[],
                        help="conditional prefix npy (repeatable)")
    parser.add_argument("--temperatures", type=str, default="0.95")
    parser.add_argument("--techniques", type=str, default="topk")
    parser.add_argument("--threshold", type=float, default=32.0)
    parser.add_argument("--memory_length", type=int, default=4146)
    parser.add_argument("--generation_length", type=int, default=4096)
    parser.add_argument("--num_midi_files", type=int, default=1)
    parser.add_argument("--num_conditional_tokens", type=int, default=50)
    args = parser.parse_args()

    sampling_configs = [
        {"technique": tech, "temperature": float(temp),
         "threshold": args.threshold}
        for tech in args.techniques.split(",")
        for temp in args.temperatures.split(",")]
    generate_files(args.model_directory, args.checkpoint_name,
                   args.vocab_file, args.output_base,
                   args.prefix, sampling_configs,
                   memory_length=args.memory_length,
                   generation_length=args.generation_length,
                   num_midi_files=args.num_midi_files,
                   num_conditional_tokens=args.num_conditional_tokens)


if __name__ == "__main__":
    main()
