"""On-chip validation + timing of the whole-chunk fused sampler
(ops/pallas_decode.py _decode_chunk_kernel) at the spanbert GAN
op-point.

1. Sample-id agreement: whole-chunk kernel vs the per-token kernel
   scan over one full phase batch (both on real Mosaic; bf16 near-tie
   argmax flips are counted, like the round-3 fused-decode record).
2. Timing: sample_only (all 4 micro-chunks, forward-only) with the
   chunk kernel vs the per-token scan.

Run ALONE (one TPU process rule):
    python tools/chunk_sampler_tpu.py [--quick]
"""
from __future__ import annotations

import os

os.environ["TGTPU_CHUNK_SAMPLER"] = "1"   # this IS the validation run

import jax

# Claim the TPU IMMEDIATELY at process start: the pool pre-grants the
# device when sitecustomize registers the backend at interpreter boot,
# and the grant expires within seconds ("grant unclaimed past timeout
# -- client lost") -- initializing after heavy imports hangs/fails.
jax.devices()

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from transformer_gan_tpu.models import gan as gan_mod
from transformer_gan_tpu.models import xl
from transformer_gan_tpu.ops import pallas_decode as pdec


def main():
    quick = "--quick" in sys.argv
    xcfg = xl.XLConfig(compute_dtype="bfloat16", cache_kv=True,
                       use_pallas=True)
    gcfg = gan_mod.GanConfig(
        dis_type="bert", loss_type="wgan-gp", tgt_len=128, mem_len=128,
        context_len=5, sample_chunks_mem=2, batch_chunk=4, n_token=310)
    bsz, bc = 128, 4
    gen_params = xl.init_xl_params(xcfg, seed=0)
    rng = np.random.RandomState(0)
    data = jnp.asarray(rng.randint(2, 310, (128, bsz)))
    data_c = data.reshape(128, bc, bsz // bc).transpose(1, 0, 2)
    key = jax.random.PRNGKey(7)

    def make_sample_only():
        @jax.jit
        def sample_only(gp, rng_):
            rngs = jax.random.split(rng_, bc)

            def body(_, xs):
                d, r = xs
                chunks = gan_mod.sample_fake_chunks(
                    jax.lax.stop_gradient(gp), xcfg, gcfg, d, 1.0, r,
                    forward_only=True)
                ids = jnp.stack([jnp.argmax(f, -1) for f, _ in chunks])
                return None, ids

            _, ids = jax.lax.scan(body, None, (data_c, rngs))
            return ids

        return sample_only

    results = {}
    for name, force_per_token in (("chunk", False), ("per_token", True)):
        if force_per_token:
            orig = pdec.supports_fused_decode_chunk
            pdec.supports_fused_decode_chunk = lambda *a, **k: False
        try:
            fn = make_sample_only()
            t0 = time.time()
            ids = fn(gen_params, key)
            ids.block_until_ready()
            ids_np = np.asarray(ids)
            print(f"sample_only[{name}] compile+first: "
                  f"{time.time()-t0:.1f}s", flush=True)
            iters = 2 if quick else 5
            t0 = time.time()
            for _ in range(iters):
                ids = fn(gen_params, key)
            ids_np = np.asarray(ids)
            dt = (time.time() - t0) / iters * 1000
            print(f"sample_only[{name}]: {dt:.1f} ms", flush=True)
            results[name] = ids_np
        finally:
            if force_per_token:
                pdec.supports_fused_decode_chunk = orig

    a, b = results["chunk"], results["per_token"]
    agree = float((a == b).mean())
    print(f"sampled-id agreement chunk vs per-token: {agree*100:.2f}% "
          f"({(a != b).sum()} of {a.size} flipped; bf16 near-tie argmax "
          f"flips cascade within a lane)", flush=True)


if __name__ == "__main__":
    main()
