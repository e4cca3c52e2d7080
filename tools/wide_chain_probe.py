"""A/B the chain-backward kernel: 8 calls at B=32 (production scan over
micro-chunks) vs 2 calls at B=128 (all 4 micro-chunks' independent
reverse recursions batched — the chains only depend on their own saved
K/V lanes, so batching is exact).

Motivation (GEN_PROFILE_TPU.json): the kernel runs at ~27% of peak on
32-row matmuls — the MXU sublane ceiling for BB=32 — and the chain is
44.9 ms of the 185 ms gen phase. B=128 with BB=64 doubles the matmul
rows; this probe measures the real win and asserts Q equality before
the production gen phase is restructured around it.

Run ALONE (one TPU process rule):
    python tools/wide_chain_probe.py [--quick] [--cpu_smoke]
"""
from __future__ import annotations

import jax

jax.devices()   # claim immediately (grant expires on degraded runtimes)

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp
import numpy as np

from transformer_gan_tpu.models import gan as gan_mod
from transformer_gan_tpu.models import xl
from transformer_gan_tpu.ops import pallas_chain_bwd as pchain
from transformer_gan_tpu.ops import pallas_decode as pdec


def main():
    quick = "--quick" in sys.argv
    smoke = "--cpu_smoke" in sys.argv
    if smoke:
        pchain.INTERPRET = True
        pdec.INTERPRET = True
        xcfg = xl.XLConfig(n_layer=2, n_head=2, d_model=16, d_inner=32,
                           cache_kv=True, use_pallas=True)
        gcfg = gan_mod.GanConfig(
            dis_type="bert", loss_type="wgan-gp", tgt_len=16, mem_len=16,
            context_len=3, sample_chunks_mem=2, batch_chunk=2)
        bsz, bc = 16, 2
    else:
        xcfg = xl.XLConfig(compute_dtype="bfloat16", cache_kv=True,
                           use_pallas=True)
        gcfg = gan_mod.GanConfig(
            dis_type="bert", loss_type="wgan-gp", tgt_len=128,
            mem_len=128, context_len=5, sample_chunks_mem=2,
            batch_chunk=4)
        bsz, bc = 128, 4
    b_c = bsz // bc
    M, ctx, V = gcfg.mem_len, gcfg.context_len, gcfg.n_token
    L, H, dh = xcfg.n_layer, xcfg.n_head, xcfg.d_head
    HD = H * dh
    tgt = gcfg.tgt_len

    gen_params = xl.init_xl_params(xcfg, seed=0)
    rng = np.random.RandomState(0)
    data = jnp.asarray(rng.randint(2, 310, (tgt, bsz)))
    data_c = data.reshape(tgt, bc, b_c).transpose(1, 0, 2)
    key = jax.random.key(7, impl="rbg" if not smoke else "threefry2x32")
    iters = 2 if quick or smoke else 5
    out = {}

    def prep_chunk(gp, d, k):
        eps = 1e-20
        hard_chunks = gan_mod.sample_fake_chunks(
            jax.lax.stop_gradient(gp), xcfg, gcfg, d, 1.0, k,
            forward_only=True)
        state = gan_mod.prime_context_state(gp, xcfg, gcfg, d)

        def hmajor(a):
            a = a[:, :M]
            return a.reshape(d.shape[1], M, H, dh).transpose(2, 0, 1, 3)

        k_mem = tuple(jax.lax.stop_gradient(hmajor(kk))
                      for kk, _ in state.kv)
        v_mem = tuple(jax.lax.stop_gradient(hmajor(vv))
                      for _, vv in state.kv)
        count = state.count
        rngs = jax.random.split(k, gcfg.sample_chunks_mem)
        packs = []
        prev_hard = jax.nn.one_hot(d[ctx - 1], V, dtype=jnp.float32)
        for c in range(gcfg.sample_chunks_mem):
            n = (gcfg.sample_len - ctx) if c == 0 else gcfg.sample_len
            hard = (hard_chunks[c][0][ctx:] if c == 0
                    else hard_chunks[c][0])
            hard = jax.lax.stop_gradient(hard)
            inputs = jax.lax.stop_gradient(
                jnp.concatenate([prev_hard[None], hard[:-1]], axis=0))
            step_rngs = jax.random.split(rngs[c], n)
            u = jax.vmap(lambda r: jax.random.uniform(
                r, (1, d.shape[1], V), dtype=jnp.float32)[0])(step_rngs)
            g = -jnp.log(-jnp.log(u + eps) + eps)
            logits, kf, vf, nc, wres = xl.decode_recompute_window(
                gp, xcfg, inputs, k_mem, v_mem, count,
                same_length=False, collect_residuals=True)
            y = jax.nn.softmax(
                (logits.astype(jnp.float32) + g) / 1.0, axis=-1)
            dst = jnp.ones_like(y) / y.size

            def dense(a):
                return a.transpose(1, 2, 0, 3).reshape(
                    d.shape[1], a.shape[2], HD)

            kf_d = jnp.stack([dense(a) for a in kf])
            vf_d = jnp.stack([dense(a) for a in vf])
            packs.append(dict(kf=kf_d, vf=vf_d, dst=dst, y=y,
                              count=count, res=wres))
            k_mem = tuple(a[:, :, -M:] for a in kf)
            v_mem = tuple(a[:, :, -M:] for a in vf)
            count = nc
            prev_hard = hard[-1]
        return packs

    @jax.jit
    def build(gp, k):
        ks = jax.random.split(k, bc)
        r_heads = jax.lax.stop_gradient(
            xl.precompute_r_heads(gp, xcfg, M + 1)).reshape(L, M + 1, HD)
        stacked = pdec.stack_decode_params(jax.lax.stop_gradient(gp),
                                           xcfg)
        per_mc = [prep_chunk(gp, data_c[mc], ks[mc]) for mc in range(bc)]
        # wide: concat micro-chunks on the batch axis, per sample-chunk.
        # res leaves batch on different axes: x/z1/z2/ff_pre are
        # [L, n, B, *] (axis 2), prob is [L, B, H, n, KL0] (axis 1).
        wide = []
        for c in range(gcfg.sample_chunks_mem):
            ps = [per_mc[mc][c] for mc in range(bc)]
            res = {
                kk: jnp.concatenate([p["res"][kk] for p in ps],
                                    axis=(1 if kk == "prob" else 2))
                for kk in ps[0]["res"]}
            wide.append(dict(
                kf=jnp.concatenate([p["kf"] for p in ps], axis=1),
                vf=jnp.concatenate([p["vf"] for p in ps], axis=1),
                dst=jnp.concatenate([p["dst"] for p in ps], axis=1),
                y=jnp.concatenate([p["y"] for p in ps], axis=1),
                count=ps[0]["count"],
                res=res))
        return per_mc, wide, r_heads, stacked

    per_mc, wide, r_heads, stacked = build(gen_params, key)
    float(jnp.sum(wide[0]["dst"]))
    print("built inputs", flush=True)

    def timeit(name, fn, *args):
        t0 = time.time()
        res = fn(*args)
        float(jnp.sum(jax.tree_util.tree_leaves(res)[0]))
        print(f"{name} compile+first: {time.time()-t0:.1f}s", flush=True)
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            for _ in range(iters):
                res = fn(*args)
            float(jnp.sum(jax.tree_util.tree_leaves(res)[0]))
            best = min(best, (time.time() - t0) / iters)
        ms = best * 1000
        print(f"{name}: {ms:.1f} ms", flush=True)
        out[name] = round(ms, 1)
        return res

    @jax.jit
    def narrow(per_mc):
        qs = []
        for mc in range(bc):
            for p in per_mc[mc]:
                qs.append(pchain.chain_bwd_q_res(
                    stacked, xcfg, p["kf"], p["vf"], r_heads, p["dst"],
                    p["y"], p["count"], 1.0, p["res"]))
        return qs

    @jax.jit
    def wide_call(wide):
        return [pchain.chain_bwd_q_res(
            stacked, xcfg, w["kf"], w["vf"], r_heads, w["dst"], w["y"],
            w["count"], 1.0, w["res"]) for w in wide]

    qn = timeit(f"narrow_x{bc * gcfg.sample_chunks_mem}", narrow, per_mc)
    qw = timeit("wide_x2", wide_call, wide)

    # numeric equality: wide row-block mc == narrow (mc, c)
    worst = 0.0
    for c in range(gcfg.sample_chunks_mem):
        for mc in range(bc):
            a = np.asarray(qn[mc * gcfg.sample_chunks_mem + c])
            b = np.asarray(qw[c][:, mc * b_c:(mc + 1) * b_c])
            worst = max(worst, float(np.max(np.abs(a - b))))
    scale = float(np.max(np.abs(np.asarray(qn[0]))))
    out["q_max_abs_diff"] = worst
    out["q_scale"] = scale
    print(f"Q wide-vs-narrow max abs diff {worst:.3e} (scale {scale:.3e})",
          flush=True)

    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "WIDE_CHAIN_PROBE.json")
    if not smoke:
        with open(path, "w") as f:
            json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
