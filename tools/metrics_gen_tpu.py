#!/usr/bin/env python
"""Wave-size sweep for the quality-metrics generation op-point.

Trainer._generate_tokens samples 512-token sequences with
``generate_tokens_gumbel`` at mem_len = seq_len = 512. At batch 128 the
fused generation kernel's gate (bsz <= 32) rejects the call and the
chunked jnp decode runs — eval cadence showed this path dominating the
soak evals. This probe measures aggregate tokens/s for wave sizes
128/64/32/16/8 on the real chip with trained weights so the trainer can
pick the fastest wave (the generate CLI already adapts its wave size
the same way, cli/generate.py:166-177).

Usage: python tools/metrics_gen_tpu.py [--model_dir DIR]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model_dir", default="/tmp/runs/soak/20260820-160002")
    ap.add_argument("--checkpoint", default="checkpoint_best")
    ap.add_argument("--seq_len", type=int, default=512)
    ap.add_argument("--out", default="/tmp/metrics_gen.json")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from transformer_gan_tpu.config import get_default_cfg_training
    from transformer_gan_tpu.infer.sample import generate_tokens_gumbel
    from transformer_gan_tpu.models import xl
    from transformer_gan_tpu.train import checkpoint as ckpt

    jax.devices()  # claim at start

    cfg = get_default_cfg_training()
    cfg.defrost()
    cfg.merge_from_file(os.path.join(args.model_dir, "config.yml"))
    cfg.DISCRIMINATOR.type = "Null"
    cfg.freeze()
    xcfg = xl.XLConfig.from_cfg(cfg, 310, 0)
    payload = ckpt.load_checkpoint(
        os.path.join(args.model_dir, args.checkpoint))
    params = jax.tree.map(jnp.asarray,
                          payload["params"] if "params" in payload
                          else payload)

    L = args.seq_len
    report = {"seq_len": L, "waves": {}}
    for bsz in (128, 64, 32, 16, 8, 4):
        rng = jax.random.key(7, impl=getattr(cfg.TPU, "rng_impl",
                                             "threefry2x32"))
        mems = xl.init_mems(xcfg, L, bsz)
        first = jnp.zeros((bsz,), jnp.int32)

        def run(r):
            toks = generate_tokens_gumbel(params, xcfg, 1.0, L, first,
                                          mems, r)
            return int(np.asarray(toks)[-1, 0])  # host sync

        run(rng)  # compile
        t0 = time.time()
        n = 3
        for i in range(n):
            rng, r = jax.random.split(rng)
            run(r)
        dt = (time.time() - t0) / n
        tps = bsz * L / dt
        report["waves"][bsz] = {"wall_s": round(dt, 3),
                                "agg_tokens_per_s": round(tps, 1)}
        print(f"bsz {bsz:4d}: {dt:7.3f}s/wave  {tps:9.1f} tok/s",
              flush=True)

    best = max(report["waves"], key=lambda b:
               report["waves"][b]["agg_tokens_per_s"])
    report["best_bsz"] = int(best)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
