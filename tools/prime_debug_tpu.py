#!/usr/bin/env python
"""On-chip triage for the generate-CLI debug mems check at mem 4146.

The CLI debug assert (incremental decode mems == chunked batch-prime
mems, reference generate.py:309-327) tripped at max diff 0.21 (bf16
atol 0.08) at the inference op-point (mem 4146, ~4146-token sequence)
while the same comparison on CPU (pure jnp, mem 1024 / seq 2048, bf16)
agrees to 1 ulp (0.0078). This tool attributes the gap on the real
chip, pairwise:

  inc  = fused generation decode kernel mems (sample_scan)
  bp   = chunked batch prime, Pallas train kernel (window 128)
  bj   = chunked batch prime, pure-jnp attention (the oracle path)

bp-vs-bj isolates the train kernel at klen ~4k; inc-vs-bj isolates the
decode kernel; bj-vs-CPU-expectation bounds plain bf16 accumulation.

Usage: python tools/prime_debug_tpu.py [--model_dir DIR] [--mem 4146]
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
    ap.add_argument("--mem", type=int, default=4146)
    ap.add_argument("--gen_len", type=int, default=4096)
    ap.add_argument("--out", default="/tmp/prime_debug.json")
    args = ap.parse_args()

    import dataclasses

    import jax
    import jax.numpy as jnp

    from transformer_gan_tpu.config import get_default_cfg_training
    from transformer_gan_tpu.infer import sample as sampling
    from transformer_gan_tpu.models import xl
    from transformer_gan_tpu.train import checkpoint as ckpt

    jax.devices()  # claim at start

    cfg = get_default_cfg_training()
    cfg.defrost()
    cfg.merge_from_file(os.path.join(args.model_dir, "config.yml"))
    cfg.DISCRIMINATOR.type = "Null"
    cfg.MODEL.same_length = True
    cfg.freeze()

    xcfg = xl.XLConfig.from_cfg(cfg, 310, 0)
    xcfg_jnp = dataclasses.replace(xcfg, use_pallas=False)
    payload = ckpt.load_checkpoint(
        os.path.join(args.model_dir, args.checkpoint))
    params = jax.tree.map(jnp.asarray,
                          payload["params"] if "params" in payload
                          else payload)

    scfg = sampling.SamplingConfig(technique="topk", topk=32,
                                   temperature=0.95)
    M, L = args.mem, args.gen_len
    rng = jax.random.key(0, impl=getattr(cfg.TPU, "rng_impl",
                                         "threefry2x32"))

    t = time.time()
    toks, mems_inc = sampling.sample_scan(
        params, xcfg, scfg, jnp.zeros((1,), jnp.int32),
        xl.init_mems(xcfg, M, 1), L, rng)
    seq = [0] + [int(x) for x in np.asarray(toks)[:, 0]]
    print(f"incremental: {time.time()-t:.1f}s", flush=True)

    data = jnp.asarray(np.array(seq[:-1], np.int32)[:, None])

    t = time.time()
    _, mems_bp = sampling.make_prime_step(xcfg)(
        params, data, xl.init_mems(xcfg, M, 1))
    f = float(np.asarray(mems_bp.hids, np.float32).sum())  # sync
    print(f"batch prime pallas: {time.time()-t:.1f}s (sum {f:.3f})",
          flush=True)

    t = time.time()
    _, mems_bj = sampling.make_prime_step(xcfg_jnp)(
        params, data, xl.init_mems(xcfg_jnp, M, 1))
    f = float(np.asarray(mems_bj.hids, np.float32).sum())
    print(f"batch prime jnp: {time.time()-t:.1f}s (sum {f:.3f})",
          flush=True)

    def d(a, b):
        x = np.abs(np.asarray(a.hids, np.float32)
                   - np.asarray(b.hids, np.float32))
        return {"max": float(x.max()), "mean": float(x.mean())}

    rep = {
        "op_point": {"mem": M, "gen_len": L,
                     "dtype": str(mems_inc.hids.dtype)},
        "scale": float(np.abs(np.asarray(mems_bj.hids,
                                         np.float32)).max()),
        "inc_vs_bj": d(mems_inc, mems_bj),
        "inc_vs_bp": d(mems_inc, mems_bp),
        "bp_vs_bj": d(mems_bp, mems_bj),
    }
    print(json.dumps(rep, indent=1), flush=True)
    with open(args.out, "w") as f:
        json.dump(rep, f, indent=1)


if __name__ == "__main__":
    main()
