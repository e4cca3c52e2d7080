#!/usr/bin/env python
"""Dump generated token sequences as .npy files for metrics/bert_score.

The reference scores per-model directories of generated .npy files
(metrics/bert_score.py:141-167, populated by its inference pipeline);
this tool produces such a directory straight from a training checkpoint
using the same argmax-gumbel sampler the quality metrics use.

Usage: python tools/gen_npy_samples.py --model_dir DIR --out DIR
           [--checkpoint checkpoint_best] [--num 16] [--seq_len 2048]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model_dir", required=True)
    ap.add_argument("--checkpoint", default="checkpoint_best")
    ap.add_argument("--out", required=True)
    ap.add_argument("--num", type=int, default=16)
    ap.add_argument("--seq_len", type=int, default=2048)
    ap.add_argument("--wave", type=int, default=4)
    ap.add_argument("--temperature", type=float, default=1.0)
    ap.add_argument("--seed", type=int, default=1234)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from transformer_gan_tpu.config import get_default_cfg_training
    from transformer_gan_tpu.infer.sample import generate_tokens_gumbel
    from transformer_gan_tpu.models import xl
    from transformer_gan_tpu.train import checkpoint as ckpt

    jax.devices()

    cfg = get_default_cfg_training()
    cfg.defrost()
    cfg.merge_from_file(os.path.join(args.model_dir, "config.yml"))
    cfg.DISCRIMINATOR.type = "Null"
    cfg.freeze()
    xcfg = xl.XLConfig.from_cfg(cfg, 310, 0)
    payload = ckpt.load_checkpoint(
        os.path.join(args.model_dir, args.checkpoint))
    params = jax.device_put(
        payload["params"] if "params" in payload else payload)

    os.makedirs(args.out, exist_ok=True)
    assert args.num % args.wave == 0
    rng = jax.random.key(args.seed,
                         impl=getattr(cfg.TPU, "rng_impl", "threefry2x32"))
    waves = []
    for _ in range(args.num // args.wave):
        rng, r = jax.random.split(rng)
        mems = xl.init_mems(xcfg, args.seq_len, args.wave)
        first = jnp.zeros((args.wave,), jnp.int32)
        waves.append(generate_tokens_gumbel(
            params, xcfg, args.temperature, args.seq_len, first, mems, r))
    k = 0
    for toks in jax.device_get(waves):
        for col in np.asarray(toks).T:          # [wave, seq_len]
            np.save(os.path.join(args.out, f"sample_{k:04d}.npy"),
                    col.astype(np.int32))
            k += 1
    print(f"wrote {k} x {args.seq_len}-token samples to {args.out}")


if __name__ == "__main__":
    main()
