#!/usr/bin/env python
"""BERT MLM pretraining CLI — counterpart of reference BERT/main.py.

Key flags mirror the reference: --train_data_file (dir of npy shards with
train/ valid/ subdirs), --output_dir, --vocab_file, --num_hidden_layers,
--hidden_size, --block_size, --mlm_probability, optimizer/schedule options,
checkpoint rotation via --save_total_limit.
"""

import argparse
import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--train_data_file", type=str, required=True,
                        help="Directory with train/ and valid/ npy shards")
    parser.add_argument("--output_dir", type=str, required=True)
    parser.add_argument("--vocab_file", type=str, required=True)
    parser.add_argument("--num_hidden_layers", default=5, type=int)
    parser.add_argument("--hidden_size", default=768, type=int)
    parser.add_argument("--block_size", default=512, type=int)
    parser.add_argument("--per_gpu_train_batch_size", default=16, type=int)
    parser.add_argument("--learning_rate", default=5e-5, type=float)
    parser.add_argument("--weight_decay", default=0.0, type=float)
    parser.add_argument("--adam_epsilon", default=1e-8, type=float)
    parser.add_argument("--warmup_steps", default=0, type=int)
    parser.add_argument("--max_steps", default=10000, type=int)
    parser.add_argument("--max_grad_norm", default=1.0, type=float)
    parser.add_argument("--mlm_probability", default=0.15, type=float)
    parser.add_argument("--seed", default=42, type=int)
    parser.add_argument("--logging_steps", default=100, type=int)
    parser.add_argument("--save_steps", default=1000, type=int)
    parser.add_argument("--save_total_limit", default=2, type=int)
    parser.add_argument("--eval_steps", default=1000, type=int)
    parser.add_argument("--compute_dtype", default="float32", type=str,
                        help="matmul/activation dtype (bfloat16 on TPU; "
                        "the reference's apex-fp16 counterpart)")
    args = parser.parse_args()

    logging.basicConfig(level=logging.INFO,
                        format="%(asctime)s %(levelname)s %(message)s")

    # data-parallel over all local devices (reference BERT/main.py:267-275
    # used DDP/DataParallel); batch rows shard over the mesh
    import jax
    from transformer_gan_tpu.parallel import mesh as pmesh
    mesh = pmesh.make_mesh() if len(jax.devices()) > 1 else None

    from transformer_gan_tpu.bert.mlm import MlmTrainer
    trainer = MlmTrainer(
        mesh=mesh,
        data_dir=args.train_data_file, output_dir=args.output_dir,
        vocab_file=args.vocab_file,
        num_hidden_layers=args.num_hidden_layers,
        hidden_size=args.hidden_size, block_size=args.block_size,
        # DDP semantics: global batch = per-device batch x device count
        batch_size=args.per_gpu_train_batch_size * (
            len(jax.devices()) if mesh is not None else 1),
        learning_rate=args.learning_rate, weight_decay=args.weight_decay,
        adam_epsilon=args.adam_epsilon, warmup_steps=args.warmup_steps,
        max_steps=args.max_steps, max_grad_norm=args.max_grad_norm,
        mlm_probability=args.mlm_probability, seed=args.seed,
        logging_steps=args.logging_steps, save_steps=args.save_steps,
        save_total_limit=args.save_total_limit, eval_steps=args.eval_steps,
        compute_dtype=args.compute_dtype)
    trainer.train()


if __name__ == "__main__":
    main()
