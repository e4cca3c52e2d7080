"""Batched-recompute gen phase (truncate_backprop) vs the sequential
jnp oracle: losses and ALL generator gradients must match.

With truncate_backprop every step's input is detached (reference
transformer_gan.py:308-320), so the sample chain carries no gradient and
the batched recompute (models/gan.py _sample_fake_chunks_recompute +
xl.decode_recompute_window + attention.rel_attention_kv
detach_kv_cross) is gradient-EXACT vs running the per-token scan."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from transformer_gan_tpu.models import discriminator as disc_mod
from transformer_gan_tpu.models import gan as gan_mod
from transformer_gan_tpu.models import xl
from transformer_gan_tpu.ops import pallas_decode as pdec


def _setup(tgt_len, chunks, bsz, mem_len, context_len=3, pre_lnorm=False,
           use_pallas=False, truncate=True):
    base = dict(n_layer=2, n_head=2, d_model=16, d_inner=32, dropout=0.0,
                dropatt=0.0, n_token=310, pre_lnorm=pre_lnorm)
    xcfg = xl.XLConfig(cache_kv=True, use_pallas=use_pallas, **base)
    gen_params = xl.init_xl_params(xcfg, seed=0)
    gk = dict(dis_type="cnn", loss_type="rsgan", tgt_len=tgt_len,
              mem_len=mem_len, context_len=context_len,
              sample_chunks_mem=chunks, n_token=310,
              decode_cache="chunked", truncate_backprop=truncate)
    gcfg_off = gan_mod.GanConfig(fused_sampler="off", **gk)
    gcfg_auto = gan_mod.GanConfig(fused_sampler="auto", **gk)
    rcfg = disc_mod.RelganConfig(embed_dim=16, num_rep=4, vocab_size=310)
    dis_params = disc_mod.init_relgan_params(rcfg, seed=1)
    rng = np.random.RandomState(3)
    data = jnp.asarray(rng.randint(2, 310, (tgt_len, bsz)))
    return xcfg, gen_params, gcfg_off, gcfg_auto, rcfg, dis_params, data


def _gen_loss_and_grad(gen_params, dis_params, rcfg, xcfg, gcfg, data, key,
                       temperature=0.9):
    def loss(gp):
        losses, _ = gan_mod.gan_losses_for_batch(
            gp, dis_params, rcfg, xcfg, gcfg, data, temperature, key,
            train_dis=False)
        return losses["gen_loss"]

    return jax.value_and_grad(loss)(gen_params)


@pytest.mark.parametrize("tgt_len,chunks,bsz,mem_len", [
    (32, 2, 8, 16),    # window == sample_len, count growth + wrap
    (16, 1, 8, 32),    # mem > sample_len, single chunk
    (24, 3, 4, 24),    # 3 chunks, fused-rows prime layout (bsz <= 4)
])
def test_recompute_matches_oracle(tgt_len, chunks, bsz, mem_len):
    (xcfg, gen_params, gcfg_off, gcfg_auto, rcfg, dis_params,
     data) = _setup(tgt_len, chunks, bsz, mem_len)
    key = jax.random.PRNGKey(11)
    l_ref, g_ref = _gen_loss_and_grad(gen_params, dis_params, rcfg, xcfg,
                                      gcfg_off, data, key)
    l_got, g_got = _gen_loss_and_grad(gen_params, dis_params, rcfg, xcfg,
                                      gcfg_auto, data, key)
    np.testing.assert_allclose(float(l_got), float(l_ref), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(g_ref),
                    jax.tree_util.tree_leaves(g_got)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-4, atol=1e-8)


def test_recompute_pre_lnorm():
    (xcfg, gen_params, gcfg_off, gcfg_auto, rcfg, dis_params,
     data) = _setup(16, 2, 8, 16, pre_lnorm=True)
    key = jax.random.PRNGKey(5)
    l_ref, g_ref = _gen_loss_and_grad(gen_params, dis_params, rcfg, xcfg,
                                      gcfg_off, data, key)
    l_got, g_got = _gen_loss_and_grad(gen_params, dis_params, rcfg, xcfg,
                                      gcfg_auto, data, key)
    np.testing.assert_allclose(float(l_got), float(l_ref), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(g_ref),
                    jax.tree_util.tree_leaves(g_got)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-4, atol=1e-8)


def test_recompute_with_fused_sampler(monkeypatch):
    """Full production path: the recompute's forward-only sampling runs
    on the fused decode kernel (interpret mode) and the trajectory/loss
    still match the oracle."""
    monkeypatch.setattr(pdec, "INTERPRET", True)
    (xcfg_p, gen_params, gcfg_off, gcfg_auto, rcfg, dis_params,
     data) = _setup(16, 2, 8, 16, use_pallas=True)
    xcfg_off = xl.XLConfig(**{**xcfg_p.__dict__, "use_pallas": False})
    key = jax.random.PRNGKey(2)
    l_ref, g_ref = _gen_loss_and_grad(gen_params, dis_params, rcfg,
                                      xcfg_off, gcfg_off, data, key)
    l_got, g_got = _gen_loss_and_grad(gen_params, dis_params, rcfg,
                                      xcfg_p, gcfg_auto, data, key)
    np.testing.assert_allclose(float(l_got), float(l_ref), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(g_ref),
                    jax.tree_util.tree_leaves(g_got)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-4, atol=1e-8)


def test_chain_bwd_off_keeps_sequential_oracle():
    """With truncate_backprop=False AND chain_bwd='off', the sampler
    stays on the sequential scan — gradients from 'auto' and 'off'
    fused_sampler settings are bit-identical because both run the same
    scan. (With chain_bwd on, the full-chain recompute path applies —
    equivalence for that lives in tests/test_gan_fullchain.py.)"""
    import dataclasses
    (xcfg, gen_params, gcfg_off, gcfg_auto, rcfg, dis_params,
     data) = _setup(16, 1, 8, 16, truncate=False)
    gcfg_off = dataclasses.replace(gcfg_off, chain_bwd="off")
    gcfg_auto = dataclasses.replace(gcfg_auto, chain_bwd="off")
    key = jax.random.PRNGKey(7)
    l_ref, g_ref = _gen_loss_and_grad(gen_params, dis_params, rcfg, xcfg,
                                      gcfg_off, data, key)
    l_got, g_got = _gen_loss_and_grad(gen_params, dis_params, rcfg, xcfg,
                                      gcfg_auto, data, key)
    assert float(l_got) == float(l_ref)
    for a, b in zip(jax.tree_util.tree_leaves(g_ref),
                    jax.tree_util.tree_leaves(g_got)):
        np.testing.assert_array_equal(np.asarray(b), np.asarray(a))
