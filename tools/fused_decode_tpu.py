"""On-chip validation + timing of the fused decode kernel at the
spanbert GAN op-point (b 32, mem 128, 6L/10H/d500, bf16).

1. id-match check: fused sampling vs the jnp chunked path from the same
   rng/state (bf16 op-order differences can flip a near-tied argmax and
   diverge the suffix of a lane, so we report per-lane matching-prefix
   stats rather than asserting exactness — CPU fp32 interpret tests
   assert id-for-id equality).
2. dis-phase step time, fused_sampler off vs fused.

NOTE: this harness carries the generator+discriminator params through
the micro-chunk scan carry (unlike bench.py, which passes them as
loop-invariant closure args), which inflates the absolute "off" number;
bench.py's gan_dis_step_ms is the canonical before/after. Measured
2026-08-17 (v5e, spanbert op-point): off 6301 ms -> fused 315.7 ms here;
id-match vs the jnp path 99.8% with 29/32 lanes exactly identical over
64 steps (bf16 near-tie argmax flips account for the rest).

Run ALONE (one TPU process rule):
    python tools/fused_decode_tpu.py [--quick]
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from transformer_gan_tpu.models import bert as bert_mod
from transformer_gan_tpu.models import gan as gan_mod
from transformer_gan_tpu.models import xl


def main():
    quick = "--quick" in sys.argv
    xcfg = xl.XLConfig(compute_dtype="bfloat16", cache_kv=True,
                       use_pallas=True)
    gcfg_off = gan_mod.GanConfig(
        dis_type="bert", loss_type="wgan-gp", tgt_len=128, mem_len=128,
        context_len=5, sample_chunks_mem=2, batch_chunk=4,
        gen_loss_factor=1.0, dis_loss_factor=1.0, fused_sampler="off")
    gcfg_on = gan_mod.GanConfig(
        **{**gcfg_off.__dict__, "fused_sampler": "on"})
    dis_cfg = bert_mod.BertConfig(vocab_size=311, compute_dtype="bfloat16")
    bsz = 128
    bc = gcfg_off.batch_chunk

    gen_params = xl.init_xl_params(xcfg, seed=0)
    dis_params = bert_mod.init_bert_params(dis_cfg, seed=17)

    rng = np.random.RandomState(0)
    data = jnp.asarray(rng.randint(2, 310, (gcfg_off.tgt_len, bsz)))
    data_c = data.reshape(gcfg_off.tgt_len, bc, bsz // bc).transpose(
        1, 0, 2)
    key = jax.random.PRNGKey(7)

    # ---- 1. sampling equivalence (one micro-chunk) ----
    d0 = data_c[0]

    def make_sample(gcfg):
        @jax.jit
        def sample(d, k):
            chunks = gan_mod.sample_fake_chunks(
                gen_params, xcfg, gcfg, d, 1.0, k, forward_only=True)
            return [c[0].argmax(-1) for c in chunks]
        return sample

    print("compiling samplers...", flush=True)
    ids_ref = [np.asarray(x) for x in make_sample(gcfg_off)(d0, key)]
    ids_fused = [np.asarray(x) for x in make_sample(gcfg_on)(d0, key)]
    stats = []
    for a, b in zip(ids_ref, ids_fused):
        n, lanes = a.shape
        eq = a == b
        # matching prefix length per lane
        pref = np.where(eq.all(0), n, eq.argmin(0))
        stats.append({
            "steps": int(n),
            "match_frac": float(eq.mean()),
            "median_prefix": float(np.median(pref)),
            "min_prefix": int(pref.min()),
            "exact_lanes": int(eq.all(0).sum()),
            "lanes": int(lanes),
        })
    print("id-match stats:", json.dumps(stats), flush=True)

    # ---- 2. dis phase timing off vs auto ----
    scale = 1.0 / (bc * gcfg_off.sample_chunks_mem)
    dis_opt = optax.adam(2e-3)
    dis_opt_state = dis_opt.init(dis_params)

    def make_phase(gcfg):
        def dis_loss_fn(dp, gp, d, rng_):
            losses, _ = gan_mod.gan_losses_for_batch(
                jax.lax.stop_gradient(gp), dp, dis_cfg, xcfg, gcfg, d,
                1.0, rng_, train_dis=True)
            return (losses["dis_loss"] + losses["gp_loss"]) * scale, losses

        grad = jax.grad(dis_loss_fn, has_aux=True)

        @jax.jit
        def phase(params, gp, opt_state, dc, rng_):
            rngs = jax.random.split(rng_, bc)

            def body(carry, xs):
                params_g, acc = carry
                d, r = xs
                g, losses = grad(params_g[0], params_g[1], d, r)
                acc = jax.tree.map(jnp.add, acc, g)
                return (params_g, acc), losses["dis_loss"]

            zero = jax.tree.map(jnp.zeros_like, params)
            (_, g), dl = jax.lax.scan(body, ((params, gp), zero),
                                      (dc, rngs))
            updates, opt_state = dis_opt.update(g, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, dl.sum()

        return phase

    for name, gcfg in (("off", gcfg_off), ("fused", gcfg_on)):
        phase = make_phase(gcfg)
        p, s = dis_params, dis_opt_state
        t0 = time.time()
        p, s, dl = phase(p, gen_params, s, data_c, key)
        float(dl)
        print(f"dis_phase[{name}] compile+first: {time.time()-t0:.1f}s",
              flush=True)
        iters = 2 if quick else 5
        t0 = time.time()
        for i in range(iters):
            p, s, dl = phase(p, gen_params, s, data_c,
                             jax.random.fold_in(key, i))
        v = float(dl)
        dt = (time.time() - t0) / iters
        print(f"dis_phase[{name}]: {dt*1000:.1f} ms/step "
              f"(last dis_loss {v:.4f})", flush=True)


if __name__ == "__main__":
    main()
