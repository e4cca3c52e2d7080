#!/usr/bin/env python
"""Ablation profile of the MLE training step on the current backend.

Times the full jitted step and a ladder of ablations to attribute the
wall-clock (the tunnel-backed TPU runtime doesn't support on-device trace
capture, so attribution is by differencing):

  full            the production step (fwd+bwd+optimizer, dropout on)
  no_optimizer    grads computed, update skipped       -> optimizer cost
  no_dropout      dropout/dropatt = 0                  -> RNG+mask cost
  fwd_only        loss only, no grad                   -> backward cost
  xla_attn        use_pallas=False                     -> kernel benefit
  fp32_softmax    softmax_dtype=float32 (default) vs bf16

Usage: python tools/profile_mle.py [bsz] (TPU: defaults 128)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))


def build(xcfg, use_mle=True):
    from transformer_gan_tpu.train import optim as topt
    from transformer_gan_tpu.train import step as tstep
    schedule = topt.make_schedule("inv_sqrt", 4e-3, 100000, 1e-4, 4000)
    optimizer = topt.make_optimizer("adam", 4e-3, schedule, 1.0)
    return optimizer, tstep.make_mle_train_step(
        xcfg, optimizer, 1, pad_id=1, donate=True, use_mle=use_mle)


def time_step(xcfg, bsz, tgt, mem, *, use_mle=True, fwd_only=False,
              iters=20, warmup=3):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from transformer_gan_tpu.models import xl
    from transformer_gan_tpu.train import step as tstep

    params = xl.init_xl_params(xcfg, seed=0)
    rng = np.random.RandomState(0)
    data = jnp.asarray(tstep.chunk_batch(
        rng.randint(2, 310, (tgt, bsz)), 1))
    target = jnp.asarray(tstep.chunk_batch(
        rng.randint(2, 310, (tgt, bsz)), 1))
    reset = jnp.asarray(tstep.chunk_rows(np.zeros((bsz,), bool), 1))

    if fwd_only:
        mems0 = xl.init_mems(xcfg, mem, bsz)
        key = jax.random.key(0, impl="rbg")

        @jax.jit
        def fwd(params, d, t, r, mems, rng):
            nll, new_mems = xl.forward_nll(
                params, xcfg, d, t, r, mems, train=True, rng=rng)
            return nll.mean(), new_mems

        loss, mems = fwd(params, data[0], target[0], reset[0], mems0, key)
        for _ in range(warmup):
            loss, mems = fwd(params, data[0], target[0], reset[0], mems0,
                             key)
        float(loss)
        t0 = time.perf_counter()
        for _ in range(iters):
            loss, mems = fwd(params, data[0], target[0], reset[0], mems0,
                             key)
        float(loss)
        return (time.perf_counter() - t0) / iters

    optimizer, step_fn = build(xcfg, use_mle=use_mle)
    state = tstep.init_train_state(params, optimizer, xcfg, 1, mem, bsz,
                                   seed=0, rng_impl="rbg")
    for _ in range(warmup):
        state, metrics = step_fn(state, data, target, reset)
    float(metrics["loss_weighted"])
    t0 = time.perf_counter()
    for _ in range(iters):
        state, metrics = step_fn(state, data, target, reset)
    float(metrics["loss_weighted"])
    return (time.perf_counter() - t0) / iters


def main():
    import jax

    from transformer_gan_tpu.models import xl

    on_tpu = jax.devices()[0].platform == "tpu"
    bsz = int(sys.argv[1]) if len(sys.argv) > 1 else (128 if on_tpu else 8)
    tgt, mem = 128, 1024
    dtype = "bfloat16" if on_tpu else "float32"

    base = dict(compute_dtype=dtype, cache_kv=True, use_pallas=on_tpu)
    variants = [
        ("full", dict(base), {}),
        ("no_optimizer", dict(base), {"use_mle": False}),
        ("no_dropout", dict(base, dropout=0.0, dropatt=0.0), {}),
        ("fwd_only", dict(base), {"fwd_only": True}),
        ("xla_attn", dict(base, use_pallas=False), {}),
        ("bf16_softmax", dict(base, softmax_dtype=dtype), {}),
    ]
    results = {}
    for name, cfg_kw, kw in variants:
        xcfg = xl.XLConfig(**cfg_kw)
        dt = time_step(xcfg, bsz, tgt, mem, **kw)
        results[name] = dt
        print(f"{name:>14}: {dt * 1e3:8.2f} ms/step "
              f"({bsz * tgt / dt / 1e3:8.1f}k tokens/s)", flush=True)

    full = results["full"]
    print("\nattribution (vs full):")
    for name, dt in results.items():
        if name == "full":
            continue
        print(f"{name:>14}: {(full - dt) * 1e3:+8.2f} ms")


if __name__ == "__main__":
    main()
