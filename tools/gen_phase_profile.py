"""Attribute the GAN GEN phase (full-chain adjoint) wall-time on chip.

VERDICT r4 #8: PERF.md documents the MLE matmul floor precisely; this
does the same for the gen phase so future rounds know whether ~187 ms
is floor or fat. Times, as separate jitted programs at the spanbert
op-point (b128 in 4 micro-chunks, tgt 128, mem 128, ctx 5, 2 sample
chunks — reference hot loop transformer_gan.py:299-334):

  sample_fwd    forward-only fused sampling, all 4 micro-chunks
  window_fwd    batched window recompute forward (both sample chunks)
  window_res    same + residual collection (the chain kernel's inputs)
  chain_kernel  the reverse-recursion kernel alone (pallas_chain_bwd
                chain_bwd_q_res, resident-K/V variant), 4 micro-chunks
  pullback      window linearization + parameter pullback with fixed Q
  scoring_bwd   BERT scoring of the fakes + input-side backward
  gen_full      the production gen phase (matches bench gan_gen_step_ms)

Each section also prints an analytic matmul-MAC count and the implied
MXU utilization (v5e bf16 peak 197 TFLOP/s) so the table reads as
floor-vs-fat directly.

Run ALONE (one TPU process rule):
    python tools/gen_phase_profile.py [--quick]
"""
from __future__ import annotations

import jax

# Claim the TPU IMMEDIATELY at process start (grant expires in seconds
# on a degraded runtime; see PERF.md "TPU runtime outage").
jax.devices()

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp
import numpy as np
import optax

from transformer_gan_tpu.models import bert as bert_mod
from transformer_gan_tpu.models import gan as gan_mod
from transformer_gan_tpu.models import xl
from transformer_gan_tpu.ops import pallas_chain_bwd as pchain
from transformer_gan_tpu.ops import pallas_decode as pdec
from transformer_gan_tpu.train.losses import get_losses

PEAK = 197e12


def main():
    quick = "--quick" in sys.argv
    smoke = "--cpu_smoke" in sys.argv    # tiny shapes, interpret kernels
    if smoke:
        pchain.INTERPRET = True
        pdec.INTERPRET = True
        xcfg = xl.XLConfig(n_layer=2, n_head=2, d_model=16, d_inner=32,
                           cache_kv=True, use_pallas=True)
        gcfg = gan_mod.GanConfig(
            dis_type="bert", loss_type="wgan-gp", tgt_len=16, mem_len=16,
            context_len=3, sample_chunks_mem=2, batch_chunk=2)
        dis_cfg = bert_mod.BertConfig(vocab_size=311, hidden_size=32,
                                      num_hidden_layers=2,
                                      num_attention_heads=2,
                                      intermediate_size=64)
        bsz, bc = 16, 2
    else:
        xcfg = xl.XLConfig(compute_dtype="bfloat16", cache_kv=True,
                           use_pallas=True)
        gcfg = gan_mod.GanConfig(
            dis_type="bert", loss_type="wgan-gp", tgt_len=128, mem_len=128,
            context_len=5, sample_chunks_mem=2, batch_chunk=4,
            gen_loss_factor=1.0, dis_loss_factor=1.0)
        dis_cfg = bert_mod.BertConfig(vocab_size=311,
                                      compute_dtype="bfloat16")
        bsz, bc = 128, 4
    b_c = bsz // bc
    M, ctx, V = gcfg.mem_len, gcfg.context_len, gcfg.n_token
    L, H, dh, di = xcfg.n_layer, xcfg.n_head, xcfg.d_head, xcfg.d_inner
    HD = H * dh

    gen_params = xl.init_xl_params(xcfg, seed=0)
    dis_params = bert_mod.init_bert_params(dis_cfg, seed=17)
    rng = np.random.RandomState(0)
    tgt = gcfg.tgt_len
    data = jnp.asarray(rng.randint(2, 310, (tgt, bsz)))
    data_c = data.reshape(tgt, bc, b_c).transpose(1, 0, 2)
    key = jax.random.key(7, impl="rbg")
    iters = 2 if quick else 5
    out = {}

    def timeit(name, fn, *args, macs=None):
        t0 = time.time()
        res = fn(*args)
        leaf = jax.tree_util.tree_leaves(res)[0]
        float(jnp.sum(leaf))          # host fetch = the reliable barrier
        print(f"{name} compile+first: {time.time()-t0:.1f}s", flush=True)
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            for _ in range(iters):
                res = fn(*args)
            leaf = jax.tree_util.tree_leaves(res)[0]
            float(jnp.sum(leaf))
            best = min(best, (time.time() - t0) / iters)
        ms = best * 1000
        line = f"{name}: {ms:.1f} ms"
        rec = {"ms": round(ms, 1)}
        if macs is not None:
            mxu = 2 * macs / best / PEAK
            line += f"  ({2*macs/1e9:.0f} GFLOP, MXU {mxu*100:.1f}%)"
            rec["gflop"] = round(2 * macs / 1e9, 1)
            rec["mxu_pct"] = round(mxu * 100, 2)
        print(line, flush=True)
        out[name] = rec
        return ms

    n0, n1 = gcfg.sample_len - ctx, gcfg.sample_len      # 123, 128
    KL = M + n1

    # ---- analytic matmul MACs ----------------------------------------
    # fused decode sampler, per token per layer (dense HD-wide algebra):
    # qkv+o projections 4*HD*HD, ff 2*HD*di, scores/context ~3*H*KL*HD
    # (per-head masked-HD redundancy is counted as executed)
    dec_tok_layer = 4 * HD * HD + 2 * HD * di + 3 * H * KL * HD
    sample_macs = bc * b_c * (n0 + n1) * (L * dec_tok_layer + HD * V)
    # window recompute fwd: same matmuls batched over n positions
    win_macs = bc * b_c * (n0 + n1) * (L * dec_tok_layer + HD * V)
    # chain kernel per (t, l, row): 5 HD^2 (q, dctx, 3 dwin) + 2 HD*di
    # (ff bwd) + 3 H*KL*HD (dp, dqw, dqr); per t: + 2 HD*V (chi + seed)
    chain_tl = 5 * HD * HD + 2 * HD * di + 3 * H * KL * HD
    chain_macs = bc * b_c * (n0 + n1) * (L * chain_tl + 2 * HD * V)
    # param pullback ~= backward of the window pass (2x fwd)
    pull_macs = 2 * win_macs
    # BERT scoring fwd+input-bwd: 3x fwd of 2 chunks x [2b, 128] rows
    bert_tok = (4 * 768 * 768 + 2 * 768 * 3072
                + 2 * 12 * 128 * 64)          # per token per layer
    score_macs = 3 * bc * 2 * (2 * b_c) * 128 * (
        dis_cfg.num_hidden_layers * bert_tok + 768 * (V + 1))

    # ---- sample_fwd ---------------------------------------------------
    @jax.jit
    def sample_fwd(gp, k):
        ks = jax.random.split(k, bc)

        def body(_, xs):
            d, kk = xs
            chunks = gan_mod.sample_fake_chunks(gp, xcfg, gcfg, d, 1.0,
                                                kk, forward_only=True)
            return 0, sum(jnp.sum(c[0]) for c in chunks)

        _, s = jax.lax.scan(body, 0, (data_c, ks))
        return s

    timeit("sample_fwd", sample_fwd, gen_params, key, macs=sample_macs)

    # ---- shared prep: hard samples + gumbels + primed memory ---------
    def prep_chunk(gp, d, k):
        """Mirror _sample_fake_chunks_recompute's wiring for one
        micro-chunk: returns per-sample-chunk (inputs, g, hard, k_mem,
        v_mem, count) with the SAME keys/draws as production."""
        eps = 1e-20
        hard_chunks = gan_mod.sample_fake_chunks(
            jax.lax.stop_gradient(gp), xcfg, gcfg, d, 1.0, k,
            forward_only=True)
        state = gan_mod.prime_context_state(gp, xcfg, gcfg, d)

        def hmajor(a):
            a = a[:, :M]
            return a.reshape(b_c, M, H, dh).transpose(2, 0, 1, 3)

        k_mem = tuple(jax.lax.stop_gradient(hmajor(kk))
                      for kk, _ in state.kv)
        v_mem = tuple(jax.lax.stop_gradient(hmajor(vv))
                      for _, vv in state.kv)
        count = state.count
        rngs = jax.random.split(k, gcfg.sample_chunks_mem)
        chunks = []
        prev_hard = jax.nn.one_hot(d[ctx - 1], V, dtype=jnp.float32)
        for c in range(gcfg.sample_chunks_mem):
            n = n0 if c == 0 else n1
            hard = hard_chunks[c][0][ctx:] if c == 0 else hard_chunks[c][0]
            hard = jax.lax.stop_gradient(hard)
            inputs = jax.lax.stop_gradient(
                jnp.concatenate([prev_hard[None], hard[:-1]], axis=0))
            step_rngs = jax.random.split(rngs[c], n)
            u = jax.vmap(lambda r: jax.random.uniform(
                r, (1, b_c, V), dtype=jnp.float32)[0])(step_rngs)
            g = -jnp.log(-jnp.log(u + eps) + eps)
            chunks.append((inputs, g, hard, k_mem, v_mem, count))
            lg, kf, vf, count = xl.decode_recompute_window(
                gp, xcfg, inputs, k_mem, v_mem, count, same_length=False)
            k_mem = tuple(a[:, :, -M:] for a in kf)
            v_mem = tuple(a[:, :, -M:] for a in vf)
            prev_hard = hard[-1]
        return chunks

    # ---- window_fwd / window_res -------------------------------------
    def win_pass(gp, k, collect):
        ks = jax.random.split(k, bc)
        tot = jnp.zeros(())
        for mc in range(bc):
            for (inputs, g, hard, k_mem, v_mem, count) in prep_chunk(
                    gp, data_c[mc], ks[mc]):
                r = xl.decode_recompute_window(
                    gp, xcfg, inputs, k_mem, v_mem, count,
                    same_length=False, collect_residuals=collect)
                tot = tot + jnp.sum(r[0].astype(jnp.float32))
        return tot

    base_ms = timeit("sample+window_fwd",
                     jax.jit(lambda gp, k: win_pass(gp, k, False)),
                     gen_params, key, macs=sample_macs + win_macs)
    res_ms = timeit("sample+window_res",
                    jax.jit(lambda gp, k: win_pass(gp, k, True)),
                    gen_params, key, macs=sample_macs + win_macs)
    out["window_res_overhead_ms"] = round(res_ms - base_ms, 1)

    # ---- chain kernel alone ------------------------------------------
    # Precompute all kernel inputs ONCE (host-side via one jit), then
    # time a jit that only runs the 4x2 chain kernels.
    @jax.jit
    def build_kernel_inputs(gp, k):
        ks = jax.random.split(k, bc)
        packs = []
        for mc in range(bc):
            for (inputs, g, hard, k_mem, v_mem, count) in prep_chunk(
                    gp, data_c[mc], ks[mc]):
                logits, kf, vf, nc, wres = xl.decode_recompute_window(
                    gp, xcfg, inputs, k_mem, v_mem, count,
                    same_length=False, collect_residuals=True)
                y = jax.nn.softmax(
                    (logits.astype(jnp.float32) + g) / 1.0, axis=-1)
                dst = jnp.ones_like(y) / y.size     # stand-in cotangent

                def dense(a):
                    return a.transpose(1, 2, 0, 3).reshape(
                        b_c, a.shape[2], HD)

                kf_d = jnp.stack([dense(a) for a in kf])
                vf_d = jnp.stack([dense(a) for a in vf])
                r_heads = jax.lax.stop_gradient(
                    xl.precompute_r_heads(gp, xcfg, M + 1)).reshape(
                        L, M + 1, HD)
                stacked = pdec.stack_decode_params(
                    jax.lax.stop_gradient(gp), xcfg)
                packs.append((stacked, kf_d, vf_d, r_heads, dst, y,
                              count))
        return packs

    packs = build_kernel_inputs(gen_params, key)
    float(jnp.sum(packs[0][4]))

    @jax.jit
    def build_res(gp, k):
        ks = jax.random.split(k, bc)
        reses = []
        for mc in range(bc):
            for (inputs, g, hard, k_mem, v_mem, count) in prep_chunk(
                    gp, data_c[mc], ks[mc]):
                _, _, _, _, wres = xl.decode_recompute_window(
                    gp, xcfg, inputs, k_mem, v_mem, count,
                    same_length=False, collect_residuals=True)
                reses.append(wres)
        return reses

    reses = build_res(gen_params, key)
    float(jnp.sum(jax.tree_util.tree_leaves(reses)[0].astype(jnp.float32)))

    @jax.jit
    def chain_kernels(packs, reses):
        tot = jnp.zeros(())
        for (stacked, kf_d, vf_d, r_heads, dst, y, count), wres in zip(
                packs, reses):
            q = pchain.chain_bwd_q_res(stacked, xcfg, kf_d, vf_d,
                                       r_heads, dst, y, count, 1.0, wres)
            tot = tot + jnp.sum(q)
        return tot

    timeit("chain_kernel_x8", chain_kernels, packs, reses,
           macs=chain_macs)

    # ---- pullback (window linearize + param pullback, fixed Q) -------
    @jax.jit
    def lin_pullback(gp, k):
        ks = jax.random.split(k, bc)
        acc = jax.tree.map(jnp.zeros_like, gp)
        for mc in range(bc):
            for (inputs, g, hard, k_mem, v_mem, count) in prep_chunk(
                    gp, data_c[mc], ks[mc]):
                def win_logits(p):
                    lg, _, _, _ = xl.decode_recompute_window(
                        p, xcfg, inputs, k_mem, v_mem, count,
                        same_length=False)
                    return lg
                lg, vjp_fn = jax.vjp(win_logits, gp)
                Q = (jnp.ones_like(lg) / lg.size).astype(lg.dtype)
                acc = jax.tree.map(jnp.add, acc, vjp_fn(Q)[0])
        # sum EVERY leaf: returning a single leaf lets XLA prune most of
        # the pullback (measured 5.6 ms / "MXU 338%" — impossible)
        return sum(jnp.sum(x.astype(jnp.float32))
                   for x in jax.tree_util.tree_leaves(acc))

    pull_full = timeit("sample+lin+pullback", lin_pullback, gen_params,
                       key, macs=sample_macs + win_macs + pull_macs)
    out["pullback_minus_fwd_ms"] = round(pull_full - base_ms, 1)

    # ---- scoring + input backward ------------------------------------
    @jax.jit
    def scoring_bwd(gp, dp, k):
        ks = jax.random.split(k, bc)

        def one(d, kk):
            chunks = gan_mod.sample_fake_chunks(
                jax.lax.stop_gradient(gp), xcfg, gcfg, d, 1.0, kk,
                forward_only=True)
            fakes = [f for f, _ in chunks]
            reals = [r for _, r in chunks]

            def loss_of(fk):
                tot = jnp.zeros(())
                for fake, real_ids in zip(fk, reals):
                    dr, df = gan_mod.score_chunk(dp, dis_cfg, gcfg,
                                                 real_ids, fake)
                    gl, _ = get_losses(dr, df, gcfg.loss_type)
                    tot = tot + gl
                return tot

            return jax.grad(loss_of)(fakes)

        tot = jnp.zeros(())
        for mc in range(bc):
            g = one(data_c[mc], ks[mc])
            tot = tot + sum(jnp.sum(x.astype(jnp.float32)) for x in g)
        return tot

    timeit("sample+scoring_bwd", scoring_bwd, gen_params, dis_params,
           key, macs=sample_macs + score_macs)

    # ---- full gen phase (production) ---------------------------------
    opt = optax.adam(2e-3)
    scale = 1.0 / (bc * gcfg.sample_chunks_mem)

    def gen_loss_fn(gp, dp, d, r):
        losses, _ = gan_mod.gan_losses_for_batch(
            gp, jax.lax.stop_gradient(dp), dis_cfg, xcfg, gcfg, d, 1.0,
            r, train_dis=False)
        return losses["gen_loss"] * scale, losses

    grad = jax.grad(gen_loss_fn, has_aux=True)

    @jax.jit
    def gen_phase(gp, dp, opt_state, dc, r):
        rngs = jax.random.split(r, bc)

        def body(carry, xs):
            acc, ls = carry
            d, rr = xs
            g, losses = grad(gp, dp, d, rr)
            return (jax.tree.map(jnp.add, acc, g),
                    ls + losses["gen_loss"]), None

        zero = jax.tree.map(jnp.zeros_like, gp)
        (g, ls), _ = jax.lax.scan(body, (zero, jnp.zeros(())),
                                  (dc, rngs))
        updates, opt_state = opt.update(g, opt_state, gp)
        return optax.apply_updates(gp, updates), opt_state, ls

    opt_state = opt.init(gen_params)
    timeit("gen_full",
           lambda gp, dp, os_, dc, r: gen_phase(gp, dp, os_, dc, r)[2],
           gen_params, dis_params, opt_state, data_c, key)

    out["op_point"] = ("spanbert b128/chunk4 tgt128 mem128 ctx5 sc2 "
                      "wgan-gp bf16 rbg")
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "GEN_PROFILE_TPU.json"),
            "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
