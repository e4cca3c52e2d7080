"""Attribute the GAN phase wall-time on chip (spanbert op-point).

Times, as separate jitted programs:
  sample_only   the forward-only fused sampling of all 4 micro-chunks
                (the dis/clf phases' sampling work, no scoring)
  dis_nogp      dis phase without the gradient penalty
  dis_full      dis phase (matches bench gan_dis_step_ms)
  gen_chain     gen phase, full-chain adjoint (matches gan_gen_step_ms)

Run ALONE (one TPU process rule):
    python tools/gan_phase_profile.py [--quick]
"""
from __future__ import annotations

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
import optax

from transformer_gan_tpu.models import bert as bert_mod
from transformer_gan_tpu.models import gan as gan_mod
from transformer_gan_tpu.models import xl


def main():
    quick = "--quick" in sys.argv
    xcfg = xl.XLConfig(compute_dtype="bfloat16", cache_kv=True,
                       use_pallas=True)
    gk = dict(dis_type="bert", tgt_len=128, mem_len=128, context_len=5,
              sample_chunks_mem=2, batch_chunk=4, gen_loss_factor=1.0,
              dis_loss_factor=1.0)
    dis_cfg = bert_mod.BertConfig(vocab_size=311, compute_dtype="bfloat16")
    bsz, bc = 128, 4
    gen_params = xl.init_xl_params(xcfg, seed=0)
    dis_params = bert_mod.init_bert_params(dis_cfg, seed=17)
    rng = np.random.RandomState(0)
    data = jnp.asarray(rng.randint(2, 310, (128, bsz)))
    data_c = data.reshape(128, bc, bsz // bc).transpose(1, 0, 2)
    key = jax.random.key(7, impl="rbg")  # production GAN-loop key impl
    scale = 1.0 / (bc * gk["sample_chunks_mem"])
    opt = optax.adam(2e-3)
    iters = 2 if quick else 5

    def timeit(name, fn, *args):
        t0 = time.time()
        out = fn(*args)
        jax.tree.map(lambda x: x.block_until_ready() if hasattr(
            x, "block_until_ready") else x, out)
        # host fetch is the only reliable barrier on the tunnel runtime
        leaf = jax.tree_util.tree_leaves(out)[0]
        float(jnp.sum(leaf))
        print(f"{name} compile+first: {time.time()-t0:.1f}s", flush=True)
        t0 = time.time()
        for i in range(iters):
            out = fn(*args)
        leaf = jax.tree_util.tree_leaves(out)[0]
        float(jnp.sum(leaf))
        dt = (time.time() - t0) / iters * 1000
        print(f"{name}: {dt:.1f} ms", flush=True)
        return dt

    # ---- sample-only (forward-only fused sampling, 4 micro-chunks) ----
    gcfg = gan_mod.GanConfig(loss_type="wgan-gp", **gk)

    @jax.jit
    def sample_only(gp, rng_):
        rngs = jax.random.split(rng_, bc)

        def body(_, xs):
            d, r = xs
            chunks = gan_mod.sample_fake_chunks(
                jax.lax.stop_gradient(gp), xcfg, gcfg, d, 1.0, r,
                forward_only=True)
            return None, sum(jnp.sum(f) for f, _ in chunks)

        _, s = jax.lax.scan(body, None, (data_c, rngs))
        return s

    timeit("sample_only", sample_only, gen_params, key)

    # ---- pure BERT scoring floor (fwd+param-bwd, real+fake batch shape,
    #      no sampling / no GP): what the dis phase would cost if scoring
    #      were the only work ----
    sc = gk["sample_chunks_mem"]
    seg = gk["tgt_len"] // sc  # chunk length actually scored

    def make_bert_floor(train):
        def bert_loss(dp, ids, r):
            emb = dp["word_embeddings"][ids]
            d = bert_mod.bert_discriminator_score(
                dp, dis_cfg, emb, train=train, rng=r if train else None)
            return jnp.sum(d)

        bgrad = jax.grad(bert_loss)

        @jax.jit
        def bert_floor(dp, dc, r):
            rngs = jax.random.split(r, bc * sc)
            # same total rows as the dis phase scores: per micro-chunk,
            # sample_chunks_mem segments of [2*bsz_chunk, seg]
            rows = dc.transpose(0, 2, 1).reshape(bc * sc, -1, seg)
            both = jnp.concatenate([rows, rows], axis=1)

            def body(acc, xs):
                ids, rr = xs
                return jax.tree.map(jnp.add, acc, bgrad(dp, ids, rr)), None

            zero = jax.tree.map(jnp.zeros_like, dp)
            acc, _ = jax.lax.scan(body, zero, (both, rngs))
            return acc

        return bert_floor

    bert_floor = make_bert_floor(True)
    timeit("bert_scoring_floor", bert_floor, dis_params, data_c, key)
    if "--rng-ablation" in sys.argv:
        # the pre-b0861fd baseline: threefry dropout keys (the ladder
        # PERF.md records; the production key above is rbg now)
        timeit("bert_scoring_floor_threefry", bert_floor, dis_params,
               data_c, jax.random.key(7, impl="threefry2x32"))
        # no dropout at all: bounds the total mask+RNG cost
        timeit("bert_scoring_floor_nodrop", make_bert_floor(False),
               dis_params, data_c, key)
        return

    # ---- dis phase with / without GP ----
    def make_dis(loss_type):
        g = gan_mod.GanConfig(loss_type=loss_type, **gk)

        def loss_fn(dp, gp, d, r):
            losses, _ = gan_mod.gan_losses_for_batch(
                jax.lax.stop_gradient(gp), dp, dis_cfg, xcfg, g, d, 1.0,
                r, train_dis=True)
            return (losses["dis_loss"] + losses["gp_loss"]) * scale, losses

        grad = jax.grad(loss_fn, has_aux=True)

        @jax.jit
        def phase(params, gp, opt_state, dc, r):
            rngs = jax.random.split(r, bc)

            def body(carry, xs):
                acc, ls = carry
                d, rr = xs
                gg, losses = grad(params, gp, d, rr)
                return (jax.tree.map(jnp.add, acc, gg),
                        ls + losses["dis_loss"]), None

            zero = jax.tree.map(jnp.zeros_like, params)
            (gg, ls), _ = jax.lax.scan(body, (zero, jnp.zeros(())),
                                       (dc, rngs))
            upd, opt_state = opt.update(gg, opt_state, params)
            return optax.apply_updates(params, upd), opt_state, ls

        return phase

    for name, lt in (("dis_nogp", "wgan"), ("dis_full", "wgan-gp")):
        phase = make_dis(lt)
        p = jax.tree.map(jnp.copy, dis_params)
        timeit(name, phase, p, gen_params, opt.init(p), data_c, key)

    # ---- gen phase (full chain, production default) ----
    g = gan_mod.GanConfig(loss_type="wgan-gp", **gk)

    def gen_loss_fn(gp, dp, d, r):
        losses, _ = gan_mod.gan_losses_for_batch(
            gp, jax.lax.stop_gradient(dp), dis_cfg, xcfg, g, d, 1.0, r,
            train_dis=False)
        return losses["gen_loss"] * scale, losses

    ggrad = jax.grad(gen_loss_fn, has_aux=True)

    @jax.jit
    def gen_phase(params, dp, opt_state, dc, r):
        rngs = jax.random.split(r, bc)

        def body(carry, xs):
            acc, ls = carry
            d, rr = xs
            gg, losses = ggrad(params, dp, d, rr)
            return (jax.tree.map(jnp.add, acc, gg),
                    ls + losses["gen_loss"]), None

        zero = jax.tree.map(jnp.zeros_like, params)
        (gg, ls), _ = jax.lax.scan(body, (zero, jnp.zeros(())),
                                   (dc, rngs))
        upd, opt_state = opt.update(gg, opt_state, params)
        return optax.apply_updates(params, upd), opt_state, ls

    p = jax.tree.map(jnp.copy, gen_params)
    timeit("gen_chain", gen_phase, p, dis_params, opt.init(p), data_c, key)


if __name__ == "__main__":
    main()
