"""Fused all-layer decode kernel (ops/pallas_decode.py) vs the jnp
chunked-decode oracle, in interpret mode on CPU.

The fused path must be SAMPLE-EXACT: same rng stream, same gumbel draws
(pre-transformed g), hard argmax forward value — so sampled ids match
id-for-id and the one-hot chunks match to fp tolerance (the jnp
straight-through value is (y_hard - y) + y, i.e. 1 +/- ~2^-24 on the hot
entry)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from transformer_gan_tpu.models import gan as gan_mod
from transformer_gan_tpu.models import xl
from transformer_gan_tpu.ops import pallas_decode as pdec


def _setup(tgt_len, chunks, bsz, context_len=3, mem_len=None,
           pre_lnorm=False):
    base = dict(n_layer=2, n_head=2, d_model=16, d_inner=32,
                dropout=0.0, dropatt=0.0, n_token=310,
                pre_lnorm=pre_lnorm)
    xcfg_jnp = xl.XLConfig(cache_kv=True, use_pallas=False, **base)
    xcfg_fused = xl.XLConfig(cache_kv=True, use_pallas=True, **base)
    gen_params = xl.init_xl_params(xcfg_jnp, seed=0)
    gcfg_off = gan_mod.GanConfig(
        dis_type="cnn", loss_type="rsgan", tgt_len=tgt_len,
        mem_len=mem_len or tgt_len, context_len=context_len,
        sample_chunks_mem=chunks, n_token=310, decode_cache="chunked",
        fused_sampler="off")
    gcfg_on = gan_mod.GanConfig(
        **{**gcfg_off.__dict__, "fused_sampler": "on"})
    rng = np.random.RandomState(3)
    data = jnp.asarray(rng.randint(2, 310, (tgt_len, bsz)))
    return xcfg_jnp, xcfg_fused, gen_params, gcfg_off, gcfg_on, data


@pytest.mark.parametrize("tgt_len,chunks,bsz", [
    (16, 2, 8),     # rem-only inner chunks, 2 outer chunks, BB=8/NB=1
    (40, 1, 8),     # full inner chunk (C=32) + rem 5, count growth + wrap
    (16, 2, 24),    # BB=8, NB=3: multi-block grid, embed/sample gating
])
def test_fused_sampling_matches_jnp(monkeypatch, tgt_len, chunks, bsz):
    monkeypatch.setattr(pdec, "INTERPRET", True)
    (xcfg_jnp, xcfg_fused, gen_params, gcfg_off, gcfg_on,
     data) = _setup(tgt_len, chunks, bsz)
    key = jax.random.PRNGKey(11)
    ref = gan_mod.sample_fake_chunks(gen_params, xcfg_jnp, gcfg_off,
                                     data, 1.0, key, forward_only=True)
    got = gan_mod.sample_fake_chunks(gen_params, xcfg_fused, gcfg_on,
                                     data, 1.0, key, forward_only=True)
    assert len(ref) == len(got) == chunks
    for (f_r, r_r), (f_g, r_g) in zip(ref, got):
        np.testing.assert_array_equal(np.asarray(r_r), np.asarray(r_g))
        np.testing.assert_array_equal(
            np.asarray(f_r.argmax(-1)), np.asarray(f_g.argmax(-1)))
        np.testing.assert_allclose(np.asarray(f_r), np.asarray(f_g),
                                   atol=1e-5)


def test_fused_sampling_pre_lnorm(monkeypatch):
    monkeypatch.setattr(pdec, "INTERPRET", True)
    (xcfg_jnp, xcfg_fused, gen_params, gcfg_off, gcfg_on,
     data) = _setup(16, 1, 8, pre_lnorm=True)
    key = jax.random.PRNGKey(2)
    ref = gan_mod.sample_fake_chunks(gen_params, xcfg_jnp, gcfg_off,
                                     data, 1.0, key, forward_only=True)
    got = gan_mod.sample_fake_chunks(gen_params, xcfg_fused, gcfg_on,
                                     data, 1.0, key, forward_only=True)
    for (f_r, _), (f_g, _) in zip(ref, got):
        np.testing.assert_array_equal(
            np.asarray(f_r.argmax(-1)), np.asarray(f_g.argmax(-1)))


def test_fused_routing_and_dis_loss(monkeypatch):
    """The dis phase (train_dis=True) routes onto the fused kernel and
    produces the same loss as the jnp path; the gen phase is untouched
    by the flag (still differentiable)."""
    from transformer_gan_tpu.models import discriminator as disc_mod
    from transformer_gan_tpu.ops import pallas_chain_bwd as pchain
    monkeypatch.setattr(pdec, "INTERPRET", True)
    # the gen-phase grad below routes its backward through the chain
    # kernel under use_pallas (chain_bwd="auto")
    monkeypatch.setattr(pchain, "INTERPRET", True)
    (xcfg_jnp, xcfg_fused, gen_params, gcfg_off, gcfg_on,
     data) = _setup(16, 2, 8)
    rcfg = disc_mod.RelganConfig(embed_dim=16, num_rep=4, vocab_size=310)
    dis_params = disc_mod.init_relgan_params(rcfg, seed=1)
    key = jax.random.PRNGKey(5)

    def dis_loss(gcfg, xcfg):
        losses, _ = gan_mod.gan_losses_for_batch(
            jax.lax.stop_gradient(gen_params), dis_params, rcfg, xcfg,
            gcfg, data, 1.0, key, train_dis=True)
        return float(losses["dis_loss"])

    np.testing.assert_allclose(dis_loss(gcfg_on, xcfg_fused),
                               dis_loss(gcfg_off, xcfg_jnp), rtol=1e-5)

    # gen phase: fused_sampler="on" must NOT break differentiation (the
    # flag only applies to forward-only callers)
    def gen_loss(gp):
        losses, _ = gan_mod.gan_losses_for_batch(
            gp, dis_params, rcfg, xcfg_fused, gcfg_on, data, 1.0, key,
            train_dis=False)
        return losses["gen_loss"]

    g = jax.grad(gen_loss)(gen_params)
    flat = np.concatenate([np.asarray(x).ravel()
                           for x in jax.tree_util.tree_leaves(g)])
    assert np.isfinite(flat).all() and np.abs(flat).sum() > 0


def test_fused_gate_fallback():
    """Unsupported shapes fall back to the jnp path under 'auto' (no
    error), and 'on' raises."""
    (xcfg_jnp, xcfg_fused, gen_params, gcfg_off, gcfg_on,
     data) = _setup(16, 1, 3)     # bsz 3: no valid BB
    gcfg_auto = gan_mod.GanConfig(
        **{**gcfg_off.__dict__, "fused_sampler": "auto"})
    key = jax.random.PRNGKey(0)
    out = gan_mod.sample_fake_chunks(gen_params, xcfg_fused, gcfg_auto,
                                     data, 1.0, key, forward_only=True)
    assert len(out) == 1
    with pytest.raises(ValueError):
        gan_mod.sample_fake_chunks(gen_params, xcfg_fused, gcfg_on,
                                   data, 1.0, key, forward_only=True)


def test_chunk_kernel_matches_per_token_kernel(monkeypatch):
    """The whole-chunk sampler (one launch per chunk, resident
    weights/K/V, in-VMEM argmax feedback) must sample the EXACT same
    ids and one-hots as the per-token kernel scan."""
    monkeypatch.setattr(pdec, "INTERPRET", True)
    (xcfg_jnp, xcfg_fused, gen_params, gcfg_off, gcfg_on,
     data) = _setup(40, 2, 8)     # 2 outer chunks, inner windows 17 + 20
    key = jax.random.PRNGKey(21)
    assert pdec.supports_fused_decode_chunk(xcfg_fused, 8, 40, 20)
    got_chunk = gan_mod.sample_fake_chunks(
        gen_params, xcfg_fused, gcfg_on, data, 1.0, key,
        forward_only=True)
    monkeypatch.setattr(pdec, "supports_fused_decode_chunk",
                        lambda *a, **k: False)
    got_tok = gan_mod.sample_fake_chunks(
        gen_params, xcfg_fused, gcfg_on, data, 1.0, key,
        forward_only=True)
    for (f_c, r_c), (f_t, r_t) in zip(got_chunk, got_tok):
        np.testing.assert_array_equal(np.asarray(r_c), np.asarray(r_t))
        np.testing.assert_array_equal(np.asarray(f_c.argmax(-1)),
                                      np.asarray(f_t.argmax(-1)))
        np.testing.assert_allclose(np.asarray(f_c), np.asarray(f_t),
                                   atol=1e-6)
