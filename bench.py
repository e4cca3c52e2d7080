#!/usr/bin/env python
"""Benchmark: training tokens/sec/chip on the flagship XL model.

Runs the REAL jitted training step (the same program cli/train.py uses) at
the reference baseline operating point scaled per chip: 6L/10H/d500/ffn1000,
tgt_len 128, mem_len 1024, Adam+inv_sqrt, bf16 compute — per-chip batch 128
(the reference ran global batch 512 over 4 GPUs; training_config/
experiment_baseline.yml:8-35).

Prints ONE JSON line. ``vs_baseline`` divides by the BASELINE.md target of
5x the reference's per-GPU throughput; the reference publishes no numbers
(BASELINE.json "published": {}), so the denominator uses an estimated
12k tokens/s per V100 for the 4-GPU DDP baseline -> target 60k
tokens/s/chip. vs_baseline >= 1.0 means the >=5x goal is met under that
estimate.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

ASSUMED_REF_TOKENS_PER_S_PER_GPU = 12_000.0
TARGET_MULTIPLIER = 5.0
TARGET = ASSUMED_REF_TOKENS_PER_S_PER_GPU * TARGET_MULTIPLIER


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from transformer_gan_tpu.models import xl
    from transformer_gan_tpu.train import optim as topt
    from transformer_gan_tpu.train import step as tstep

    platform = jax.devices()[0].platform
    on_tpu = platform == "tpu"

    xcfg = xl.XLConfig(
        compute_dtype="bfloat16" if on_tpu else "float32",
        cache_kv=True, use_pallas=on_tpu)
    params = xl.init_xl_params(xcfg, seed=0)

    bsz = 128 if on_tpu else 16
    tgt, mem = 128, 1024
    batch_chunk = 1  # one fused pass per step; chunking is a memory knob
    warmup, iters = 3, 20

    schedule = topt.make_schedule("inv_sqrt", 4e-3, 100000, 1e-4, 4000)
    optimizer = topt.make_optimizer("adam", 4e-3, schedule, 1.0)
    state = tstep.init_train_state(params, optimizer, xcfg, batch_chunk,
                                   mem, bsz // batch_chunk, seed=0,
                                   rng_impl="rbg")
    step_fn = tstep.make_mle_train_step(xcfg, optimizer, batch_chunk,
                                        pad_id=1, donate=True)

    rng = np.random.RandomState(0)

    def make_batch():
        data = tstep.chunk_batch(
            rng.randint(2, 310, (tgt, bsz)), batch_chunk)
        target = tstep.chunk_batch(
            rng.randint(2, 310, (tgt, bsz)), batch_chunk)
        reset = tstep.chunk_rows(np.zeros((bsz,), bool), batch_chunk)
        return (jnp.asarray(data), jnp.asarray(target), jnp.asarray(reset))

    batches = [make_batch() for _ in range(4)]

    for i in range(warmup):
        state, metrics = step_fn(state, *batches[i % len(batches)])
    # A host fetch is the only reliable barrier on the tunnel-backed TPU
    # runtime (block_until_ready can return before remote execution).
    float(metrics["loss_weighted"])

    t0 = time.perf_counter()
    for i in range(iters):
        state, metrics = step_fn(state, *batches[i % len(batches)])
    float(metrics["loss_weighted"])
    elapsed = time.perf_counter() - t0

    tokens_per_s = bsz * tgt * iters / elapsed
    print(json.dumps({
        "metric": "train_tokens_per_sec_per_chip",
        "value": round(tokens_per_s, 1),
        "unit": "tokens/s",
        "vs_baseline": round(tokens_per_s / TARGET, 3),
    }))


if __name__ == "__main__":
    main()
