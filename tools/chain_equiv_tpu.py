"""On-chip compiled-Mosaic equivalence record for the chain-backward
kernel (ops/pallas_chain_bwd.py): full-chain gen-phase loss + ALL
generator gradients, chain-kernel vs jnp-chain vs sequential oracle.

The CPU suite proves kernel==oracle in interpret mode only
(tests/test_gan_fullchain.py); this records the real-Mosaic lowering at
a mid-size op-point, fp32 and bf16. Appends a JSON line to
CHAIN_EQUIV_TPU.json.

Run ALONE (one TPU process rule):
    python tools/chain_equiv_tpu.py
"""
from __future__ import annotations

import jax

# Claim the TPU IMMEDIATELY at process start: the pool pre-grants the
# device when sitecustomize registers the backend at interpreter boot,
# and the grant expires within seconds ("grant unclaimed past timeout
# -- client lost") -- initializing after heavy imports hangs/fails.
jax.devices()

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from transformer_gan_tpu.models import discriminator as disc_mod
from transformer_gan_tpu.models import gan as gan_mod
from transformer_gan_tpu.models import xl


def run(dtype: str):
    base = dict(n_layer=3, n_head=4, d_model=128, d_inner=256,
                dropout=0.0, dropatt=0.0, n_token=310,
                compute_dtype=dtype)
    xcfg = xl.XLConfig(cache_kv=True, use_pallas=True, **base)
    xcfg_off = xl.XLConfig(cache_kv=True, use_pallas=False, **base)
    gen_params = xl.init_xl_params(xcfg, seed=0)
    gk = dict(dis_type="cnn", loss_type="rsgan", tgt_len=64, mem_len=64,
              context_len=5, sample_chunks_mem=2, n_token=310,
              decode_cache="chunked", truncate_backprop=False)
    rcfg = disc_mod.RelganConfig(embed_dim=32, num_rep=4, vocab_size=310)
    dis_params = disc_mod.init_relgan_params(rcfg, seed=1)
    rng = np.random.RandomState(3)
    data = jnp.asarray(rng.randint(2, 310, (64, 16)))
    key = jax.random.PRNGKey(11)

    def grads(gcfg, xc):
        def loss(gp):
            losses, _ = gan_mod.gan_losses_for_batch(
                gp, dis_params, rcfg, xc, gcfg, data, 0.9, key,
                train_dis=False)
            return losses["gen_loss"]

        l, g = jax.jit(jax.value_and_grad(loss))(gen_params)
        return float(l), jax.tree.map(np.asarray, g)

    out = {"dtype": dtype}
    l_seq, g_seq = grads(
        gan_mod.GanConfig(fused_sampler="off", chain_bwd="off", **gk),
        xcfg_off)
    l_jnp, g_jnp = grads(
        gan_mod.GanConfig(fused_sampler="off", chain_bwd="jnp", **gk),
        xcfg_off)
    l_ker, g_ker = grads(
        gan_mod.GanConfig(fused_sampler="auto",
                          chain_bwd="kernel_recompute", **gk), xcfg)
    l_res, g_res = grads(
        gan_mod.GanConfig(fused_sampler="auto", chain_bwd="kernel",
                          **gk), xcfg)

    def diff(a, b):
        return max(float(np.max(np.abs(x - y))) for x, y in zip(
            jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)))

    gmax = max(float(np.max(np.abs(x)))
               for x in jax.tree_util.tree_leaves(g_seq))
    out.update(
        loss_seq=l_seq, loss_jnp=l_jnp, loss_kernel=l_ker,
        loss_kernel_residual=l_res,
        grad_scale=gmax,
        jnp_vs_seq=diff(g_jnp, g_seq),
        kernel_vs_seq=diff(g_ker, g_seq),
        kernel_vs_jnp=diff(g_ker, g_jnp),
        kernel_residual_vs_seq=diff(g_res, g_seq),
        kernel_residual_vs_jnp=diff(g_res, g_jnp),
    )
    print(json.dumps(out), flush=True)
    return out


def main():
    results = [run("float32"), run("bfloat16")]
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "CHAIN_EQUIV_TPU.json")
    with open(path, "w") as f:
        json.dump({"op_point": "3L/4H/d128, tgt 64, mem 64, b 16, "
                               "2 chunks, cnn-rsgan full-chain",
                   "results": results}, f, indent=1)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
