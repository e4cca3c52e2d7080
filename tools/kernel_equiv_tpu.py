#!/usr/bin/env python
"""On-chip COMPILED-kernel equivalence: v1/v2 Pallas attention vs the jnp
cache_kv oracle, loss + all parameter gradients.

The CPU test suite proves this equivalence in interpret mode only
(tests/test_xl_parity.py); this script records the same comparison with
the real Mosaic-compiled kernels (bf16 shift stages, _FAST_BF16_SHIFT,
alignment-dependent lowering) on the chip, at the two op-points that
matter: the training step (tgt 128, mem 1024) and the GAN dis phase
(tgt 128, mem 128). Ref contract: mem_transformer.py:200-239.

Run ALONE (one TPU process at a time on this runtime):
    python tools/kernel_equiv_tpu.py
Writes KERNEL_EQUIV_TPU.json at the repo root.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def compare_point(tgt, mem, bsz, dtype):
    import jax
    import jax.numpy as jnp

    from transformer_gan_tpu.models import xl
    from transformer_gan_tpu.ops import pallas_attention_v2 as v2mod

    def build(use_pallas):
        return xl.XLConfig(compute_dtype=dtype, cache_kv=True,
                           use_pallas=use_pallas)

    xcfg_oracle = build(False)
    params = xl.init_xl_params(xcfg_oracle, seed=0)
    rng = np.random.RandomState(1)
    # keep batch tensors as HOST numpy: device arrays closed over or
    # embedded as constants force host fetches / constant blowups on the
    # tunnel runtime — everything crosses the jit boundary as arguments
    data = rng.randint(2, 310, (tgt, bsz))
    target = rng.randint(2, 310, (tgt, bsz))
    reset = np.zeros((bsz,), bool)
    warm_data = rng.randint(2, 310, (mem, bsz))

    # fill the memory with REAL projected K/V (one jitted oracle forward
    # from empty) so the kernels' memory-side compute is exercised
    @jax.jit
    def warm(p, wd, r):
        empty = xl.init_mems(xcfg_oracle, mem, bsz)
        _, m = xl.forward_nll(p, xcfg_oracle, wd, wd, r, empty)
        return m

    mems = jax.tree.map(jax.lax.stop_gradient,
                        warm(params, warm_data, reset))

    def make_loss(xcfg):
        def loss_fn(p, m, d, t, r):
            nll, new_mems = xl.forward_nll(p, xcfg, d, t, r, m)
            return nll.mean(), new_mems
        return jax.jit(jax.value_and_grad(loss_fn, has_aux=True))

    def run(xcfg):
        (loss, new_mems), grads = make_loss(xcfg)(params, mems, data,
                                                  target, reset)
        return (float(loss), jax.tree.map(np.asarray, grads),
                np.asarray(new_mems.hids, np.float32))

    results = {}
    loss_o, grads_o, mems_o = run(xcfg_oracle)
    results["oracle_loss"] = loss_o

    for name in ("v2", "v1"):
        if name == "v1":
            orig = v2mod.supports_v2
            v2mod.supports_v2 = lambda *a, **k: False
        try:
            loss_k, grads_k, mems_k = run(build(True))
        finally:
            if name == "v1":
                v2mod.supports_v2 = orig
        gdiffs = [float(np.abs(a - b).max())
                  for a, b in zip(jax.tree.leaves(grads_o),
                                  jax.tree.leaves(grads_k))]
        gscale = max(float(np.abs(a).max())
                     for a in jax.tree.leaves(grads_o))
        results[name] = {
            "loss": loss_k,
            "loss_diff": abs(loss_k - loss_o),
            "max_grad_diff": max(gdiffs),
            "max_grad_magnitude": gscale,
            "max_mems_diff": float(np.abs(mems_k - mems_o).max()),
        }
    return results


def main():
    import jax
    assert jax.devices()[0].platform == "tpu", (
        "this records COMPILED Mosaic behavior; run on the chip")
    out = {"device": str(jax.devices()[0].device_kind)}
    for tgt, mem, tag in [(128, 1024, "train_op_point"),
                          (128, 128, "gan_dis_op_point")]:
        for dtype in ("float32", "bfloat16"):
            key = f"{tag}_{dtype}"
            print(f"== {key} (tgt={tgt}, mem={mem}) ==", flush=True)
            res = compare_point(tgt, mem, bsz=32, dtype=dtype)
            out[key] = res
            for k in ("v2", "v1"):
                r = res[k]
                print(f"  {k}: loss_diff={r['loss_diff']:.3e} "
                      f"max_grad_diff={r['max_grad_diff']:.3e} "
                      f"(grad scale {r['max_grad_magnitude']:.3e}) "
                      f"mems_diff={r['max_mems_diff']:.3e}", flush=True)
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "KERNEL_EQUIV_TPU.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
