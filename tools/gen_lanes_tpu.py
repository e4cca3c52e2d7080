"""Aggregate multi-lane generation throughput at the reference
unconditional op-point (mem 4146, top-k 32, T 0.95), on the production
``sample_scan_jit`` dispatch (fused generation kernel when the gate
allows, jnp chunked decode otherwise).

Motivation: PERF.md's "batched multi-lane generation is KV-HBM-bound"
note (b=1: 4.7k, b=8: 6.8k, b=32: 5.7k aggregate events/s) was measured
on the pre-kernel jnp decode; the fused kernel changed the single-lane
number 5.6k -> 9.2k, so the multi-lane aggregate (what
``cli/generate.py`` wave batching and ``cli/batch_generate.py``
actually deliver) needs a fresh record.

Run ALONE (one TPU process rule):
    python tools/gen_lanes_tpu.py [--quick] [--lanes 1,8,16,32]
"""
from __future__ import annotations

import jax

# Claim the TPU IMMEDIATELY at process start (grant expires in seconds).
jax.devices()

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp
import numpy as np

from transformer_gan_tpu.infer import sample as isample
from transformer_gan_tpu.models import xl
from transformer_gan_tpu.ops import pallas_generate as pgen


def main():
    quick = "--quick" in sys.argv
    lane_list = [1, 8, 16, 32]
    if "--lanes" in sys.argv:
        lane_list = [int(x) for x in
                     sys.argv[sys.argv.index("--lanes") + 1].split(",")]
    xcfg = xl.XLConfig(compute_dtype="bfloat16", cache_kv=True,
                       use_pallas=True)
    params = xl.init_xl_params(xcfg, seed=0)
    # --argmax: temperature-0 branch (no top-k select loop) — isolates
    # the epilogue's 31-pass k-th-largest loop from the layer compute
    temp = 0.0 if "--argmax" in sys.argv else 0.95
    scfg = isample.SamplingConfig(technique="topk", topk=32,
                                  temperature=temp)
    mem_len = 4146
    if "--mem" in sys.argv:
        mem_len = int(sys.argv[sys.argv.index("--mem") + 1])
    length = 512 if quick else 1024
    chunk = min(32, mem_len)

    no_res = "--no-res-kv" in sys.argv
    if no_res:
        pgen._KV_RES_BUDGET = 0

    for lanes in lane_list:
        fused = pgen.supports_fused_generate(
            xcfg, scfg, lanes, mem_len, chunk)
        kv_res = pgen.supports_kv_resident(
            xcfg, scfg, lanes, mem_len, chunk)
        path = ("fused+resKV" if kv_res
                else "fused" if fused else "jnp")
        first = jnp.full((lanes,), 2, jnp.int32)
        mems = xl.init_mems(xcfg, mem_len, lanes)
        t0 = time.time()
        toks, _ = isample.sample_scan_jit(
            params, xcfg, scfg, first, mems, length,
            jax.random.PRNGKey(0))
        np.asarray(toks)
        print(f"lanes={lanes:3d} path={path} "
              f"compile+first: {time.time()-t0:.1f}s", flush=True)
        iters = 1 if quick else 2
        t0 = time.time()
        for i in range(iters):
            toks, _ = isample.sample_scan_jit(
                params, xcfg, scfg, first, mems, length,
                jax.random.PRNGKey(1 + i))
            np.asarray(toks)
        dt = (time.time() - t0) / iters
        print(f"lanes={lanes:3d} path={path}: "
              f"{length * lanes / dt:.1f} events/s aggregate "
              f"({dt / length * 1e6:.0f} us/step)", flush=True)


if __name__ == "__main__":
    main()
