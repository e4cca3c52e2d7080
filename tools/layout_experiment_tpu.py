#!/usr/bin/env python
"""Mems entry-layout experiment (PERF.md "Known residual overheads").

The optimized train-step HLO assigns the donated mems carry an M-minor
ENTRY layout and inserts ~3.15 GB/step of re-layout copies around the
ring update. with_layout_constraint on the internal value cannot fix
this — entry layouts are chosen at the jit boundary. This experiment
pins them there: ``make_mle_train_step(auto_mems_layout=True)`` marks
state.mems.hids AUTO in jit in/out shardings so XLA picks the entry
layout to match compute, then the initial carry is device_put with the
compiled format.

Run ALONE (one TPU process at a time):
    python tools/layout_experiment_tpu.py
Prints baseline vs auto-layout step times and the chosen layout; writes
LAYOUT_EXPERIMENT_TPU.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def count_big_copies(compiled, dim_token: str = "1024"):
    """Crude count of full-buffer copy/transpose fusions touching the
    mems M dimension in the optimized HLO."""
    try:
        txt = compiled.as_text()
    except Exception:
        return None
    n = 0
    for line in txt.splitlines():
        if (" copy(" in line or "kLoop" in line and "copy" in line) \
                and dim_token in line:
            n += 1
    return n


def main():
    import jax
    import jax.numpy as jnp

    from transformer_gan_tpu.models import xl
    from transformer_gan_tpu.train import optim as topt
    from transformer_gan_tpu.train import step as tstep

    assert jax.devices()[0].platform == "tpu"
    xcfg = xl.XLConfig(compute_dtype="bfloat16", cache_kv=True,
                       use_pallas=True)
    bsz, tgt, mem, bc = 128, 128, 1024, 1
    warmup, iters = 3, 20

    schedule = topt.make_schedule("inv_sqrt", 4e-3, 100000, 1e-4, 4000)
    optimizer = topt.make_optimizer("adam", 4e-3, schedule, 1.0)

    rng = np.random.RandomState(0)

    def make_batches():
        out = []
        for _ in range(4):
            data = tstep.chunk_batch(rng.randint(2, 310, (tgt, bsz)), bc)
            target = tstep.chunk_batch(rng.randint(2, 310, (tgt, bsz)), bc)
            reset = tstep.chunk_rows(np.zeros((bsz,), bool), bc)
            out.append((jnp.asarray(data), jnp.asarray(target),
                        jnp.asarray(reset)))
        return out

    def fresh_state():
        params = xl.init_xl_params(xcfg, seed=0)
        return tstep.init_train_state(params, optimizer, xcfg, bc, mem,
                                      bsz // bc, seed=0, rng_impl="rbg")

    def timeit(step_fn, state, batches):
        for i in range(warmup):
            state, metrics = step_fn(state, *batches[i % len(batches)])
        float(metrics["loss_weighted"])  # host fetch = the only barrier
        t0 = time.perf_counter()
        for i in range(iters):
            state, metrics = step_fn(state, *batches[i % len(batches)])
        float(metrics["loss_weighted"])
        return (time.perf_counter() - t0) / iters, state, metrics

    out = {}

    # ---- baseline (default entry layouts) ----
    batches = make_batches()
    step_std = tstep.make_mle_train_step(xcfg, optimizer, bc, pad_id=1,
                                         donate=True)
    t_std, _, m_std = timeit(step_std, fresh_state(), batches)
    out["baseline_step_ms"] = round(t_std * 1e3, 2)
    out["baseline_tokens_per_s"] = round(bsz * tgt / t_std, 1)
    compiled_std = step_std.lower(fresh_state(), *batches[0]).compile()
    out["baseline_big_copies"] = count_big_copies(compiled_std)
    print(f"baseline: {out['baseline_step_ms']} ms/step "
          f"({out['baseline_tokens_per_s']} tok/s), "
          f"copies~{out['baseline_big_copies']}", flush=True)

    # ---- AUTO entry layout on the donated mems carry ----
    step_auto = tstep.make_mle_train_step(xcfg, optimizer, bc, pad_id=1,
                                          donate=True,
                                          auto_mems_layout=True)
    state = fresh_state()
    lowered = step_auto.lower(state, *batches[0])
    compiled = lowered.compile()
    out["auto_big_copies"] = count_big_copies(compiled)

    fmts = None
    for attr in ("input_formats", "input_layouts"):
        if hasattr(compiled, attr):
            fmts = getattr(compiled, attr)
            break
    assert fmts is not None, "no input layout API on Compiled"
    # Compiled.input_formats is ((args...), {kwargs}) on current jax;
    # older versions returned the args tuple directly.
    if (isinstance(fmts, tuple) and len(fmts) == 2
            and isinstance(fmts[1], dict)):
        fmts = fmts[0]
    # args: (state_no_opt, opt_state, data, target, reset)
    mems_fmt = fmts[0].mems.hids
    out["chosen_mems_entry_layout"] = str(mems_fmt)
    print(f"auto-chosen mems entry layout: {mems_fmt}", flush=True)

    placed = jax.device_put(np.asarray(state.mems.hids, np.float32)
                            .astype(np.dtype("bfloat16") if
                                    xcfg.cdtype == jnp.bfloat16
                                    else np.float32),
                            mems_fmt)
    state = state._replace(mems=xl.XLMems(hids=placed,
                                          count=state.mems.count))

    # AUTO-layout jits must be invoked through the AOT executable (the
    # traced wrapper rejects concrete non-default arg layouts).
    def auto_call(st, *args):
        return compiled(st._replace(opt_state=None), st.opt_state, *args)

    t_auto, _, m_auto = timeit(auto_call, state, batches)
    out["auto_step_ms"] = round(t_auto * 1e3, 2)
    out["auto_tokens_per_s"] = round(bsz * tgt / t_auto, 1)
    out["speedup_pct"] = round((t_std / t_auto - 1) * 100, 2)
    # losses must agree (layout is representation-only)
    out["loss_baseline"] = float(m_std["loss_weighted"])
    out["loss_auto"] = float(m_auto["loss_weighted"])
    print(f"auto:     {out['auto_step_ms']} ms/step "
          f"({out['auto_tokens_per_s']} tok/s), "
          f"copies~{out['auto_big_copies']}, "
          f"speedup {out['speedup_pct']}%", flush=True)

    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "LAYOUT_EXPERIMENT_TPU.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
