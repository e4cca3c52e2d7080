#!/usr/bin/env python
"""Training CLI — argument surface matches reference model/train.py:117-142
(--data_dir, --work_dir, --cfg, --restart, --debug, --save-all; --fp16 is
subsumed by TPU.compute_dtype in the YAML)."""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args():
    parser = argparse.ArgumentParser(
        description="TPU Transformer-GAN Language Model")
    parser.add_argument("--data_dir", type=str, required=True,
                        help="location of the data corpus")
    parser.add_argument("--work_dir", type=str, required=True,
                        help="Base directory to save the trained model.")
    parser.add_argument("--cfg", type=str, default="transformer_xl.yml",
                        help="path to the cfg file")
    parser.add_argument("--restart", action="store_true",
                        help="Whether to restart from the existing checkpoint")
    parser.add_argument("--debug", action="store_true",
                        help="Debug the program (no checkpoints).")
    parser.add_argument("--save-all", action="store_true",
                        help="Save all checkpoints")
    return parser.parse_args()


def main():
    args = parse_args()
    from transformer_gan_tpu.config import get_default_cfg_training
    from transformer_gan_tpu.train.loop import Trainer

    cfg = get_default_cfg_training()
    cfg.defrost()
    cfg.merge_from_file(args.cfg)
    cfg.freeze()

    trainer = Trainer(cfg, data_dir=args.data_dir, work_dir=args.work_dir,
                      restart=args.restart, debug=args.debug,
                      save_all=args.save_all)
    trainer.train()
    # reference train.py:1337-1371: reload checkpoint_best, test-eval,
    # log the "| End of training | test nll ..." line
    trainer.final_best_eval()


if __name__ == "__main__":
    main()
