"""On-chip timing of the gen phase formulations at the spanbert GAN
op-point (b 128 in 4 chunks, mem 128, 6L/10H/d500, bf16).

Default (full backprop through the sample chain, truncate_backprop
False — the spanbert config):
    off:    sequential jnp scan + per-token scan backward
    chain:  fused forward sampler + batched recompute + chain-backward
            kernel (ops/pallas_chain_bwd.py)

--trunc (truncate_backprop True — the experiment_baseline config):
    off:        sequential scan (chain cut by detached inputs)
    recompute:  sample-then-batched-recompute (exact, no chain needed)

Run ALONE (one TPU process rule):
    python tools/gen_recompute_tpu.py [--quick] [--trunc]
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
    trunc = "--trunc" in sys.argv
    xcfg = xl.XLConfig(compute_dtype="bfloat16", cache_kv=True,
                       use_pallas=True)
    gk = dict(dis_type="bert", loss_type="wgan-gp", tgt_len=128,
              mem_len=128, context_len=5, sample_chunks_mem=2,
              batch_chunk=4, gen_loss_factor=1.0, dis_loss_factor=1.0,
              truncate_backprop=trunc)
    dis_cfg = bert_mod.BertConfig(vocab_size=311, compute_dtype="bfloat16")
    bsz = 128
    bc = gk["batch_chunk"]

    gen_params = xl.init_xl_params(xcfg, seed=0)
    dis_params = bert_mod.init_bert_params(dis_cfg, seed=17)

    rng = np.random.RandomState(0)
    data = jnp.asarray(rng.randint(2, 310, (gk["tgt_len"], bsz)))
    data_c = data.reshape(gk["tgt_len"], bc, bsz // bc).transpose(1, 0, 2)
    key = jax.random.PRNGKey(7)
    scale = 1.0 / (bc * gk["sample_chunks_mem"])
    gen_opt = optax.adam(2e-3)

    def make_phase(gcfg):
        def gen_loss_fn(gp, dp, d, rng_):
            losses, _ = gan_mod.gan_losses_for_batch(
                gp, jax.lax.stop_gradient(dp), dis_cfg, xcfg, gcfg, d,
                1.0, rng_, train_dis=False)
            return losses["gen_loss"] * scale, losses

        grad = jax.grad(gen_loss_fn, has_aux=True)

        def phase(params, dp, opt_state, dc, rng_):
            rngs = jax.random.split(rng_, bc)

            def body(carry, xs):
                acc, lsum = carry
                d, r = xs
                g, losses = grad(params, dp, d, r)
                return (jax.tree.map(jnp.add, acc, g),
                        lsum + losses["gen_loss"]), None

            zero = jax.tree.map(jnp.zeros_like, params)
            (g, lsum), _ = jax.lax.scan(body, (zero, jnp.zeros(())),
                                        (dc, rngs))
            updates, opt_state = gen_opt.update(g, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, lsum

        return jax.jit(phase, donate_argnums=(0, 2))

    if "--ab" in sys.argv:
        # recompute-in-kernel vs residual-streaming chain kernel only
        variants = (("chain_recompute", "auto", "kernel_recompute"),
                    ("chain_residual", "auto", "kernel"))
    elif trunc:
        variants = (("off", "off", "off"), ("recompute", "auto", "off"))
    else:
        variants = (("off", "off", "off"), ("chain", "auto", "kernel"))
    for name, fs, cb in variants:
        gcfg = gan_mod.GanConfig(fused_sampler=fs, chain_bwd=cb, **gk)
        phase = make_phase(gcfg)
        p = jax.tree.map(jnp.copy, gen_params)  # donated below
        s = gen_opt.init(p)
        t0 = time.time()
        p, s, ls = phase(p, dis_params, s, data_c, key)
        float(ls)
        print(f"gen_phase[{name}] compile+first: {time.time()-t0:.1f}s",
              flush=True)
        iters = 2 if quick else 5
        t0 = time.time()
        for i in range(iters):
            p, s, ls = phase(p, dis_params, s, data_c,
                             jax.random.fold_in(key, i))
        v = float(ls)
        dt = (time.time() - t0) / iters
        print(f"gen_phase[{name}]: {dt*1000:.1f} ms/step "
              f"(last gen_loss {v:.4f})", flush=True)


if __name__ == "__main__":
    main()
