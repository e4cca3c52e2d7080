"""Full-backprop-through-the-sample-chain gen phase via the batched
recompute + chain adjoint (models/gan.py _chunk_st_fullchain) vs the
sequential jnp oracle: losses and ALL generator gradients must match.

With truncate_backprop=False the straight-through inputs chain gradients
across steps (reference transformer_gan.py:308-320 with the flag off).
The K/V cache is still detached every step (_update_mems,
mem_transformer.py:461-482), so the chain adjoint decomposes into a
reverse scan carrying only the [b, V] input cotangent plus ONE batched
window pullback for all parameter gradients."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from transformer_gan_tpu.models import discriminator as disc_mod
from transformer_gan_tpu.models import gan as gan_mod
from transformer_gan_tpu.models import xl
from transformer_gan_tpu.ops import pallas_decode as pdec


def _setup(tgt_len, chunks, bsz, mem_len, context_len=3, pre_lnorm=False,
           use_pallas=False):
    base = dict(n_layer=2, n_head=2, d_model=16, d_inner=32, dropout=0.0,
                dropatt=0.0, n_token=310, pre_lnorm=pre_lnorm)
    xcfg = xl.XLConfig(cache_kv=True, use_pallas=use_pallas, **base)
    gen_params = xl.init_xl_params(xcfg, seed=0)
    gk = dict(dis_type="cnn", loss_type="rsgan", tgt_len=tgt_len,
              mem_len=mem_len, context_len=context_len,
              sample_chunks_mem=chunks, n_token=310,
              decode_cache="chunked", truncate_backprop=False)
    gcfg_off = gan_mod.GanConfig(fused_sampler="off", chain_bwd="off",
                                 **gk)
    gcfg_chain = gan_mod.GanConfig(fused_sampler="auto", chain_bwd="jnp",
                                   **gk)
    rcfg = disc_mod.RelganConfig(embed_dim=16, num_rep=4, vocab_size=310)
    dis_params = disc_mod.init_relgan_params(rcfg, seed=1)
    rng = np.random.RandomState(3)
    data = jnp.asarray(rng.randint(2, 310, (tgt_len, bsz)))
    return xcfg, gen_params, gcfg_off, gcfg_chain, rcfg, dis_params, data


def _gen_loss_and_grad(gen_params, dis_params, rcfg, xcfg, gcfg, data, key,
                       temperature=0.9):
    def loss(gp):
        losses, _ = gan_mod.gan_losses_for_batch(
            gp, dis_params, rcfg, xcfg, gcfg, data, temperature, key,
            train_dis=False)
        return losses["gen_loss"]

    return jax.value_and_grad(loss)(gen_params)


def _assert_close(l_ref, g_ref, l_got, g_got, rtol=2e-4):
    np.testing.assert_allclose(float(l_got), float(l_ref), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(g_ref),
                    jax.tree_util.tree_leaves(g_got)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=rtol, atol=1e-7)


@pytest.mark.parametrize("tgt_len,chunks,bsz,mem_len", [
    (32, 2, 8, 16),    # window == sample_len, count growth + wrap
    (16, 1, 8, 32),    # mem > sample_len, single chunk
    (24, 3, 4, 24),    # 3 chunks, fused-rows prime layout (bsz <= 4)
])
def test_fullchain_matches_sequential_oracle(tgt_len, chunks, bsz,
                                             mem_len):
    (xcfg, gen_params, gcfg_off, gcfg_chain, rcfg, dis_params,
     data) = _setup(tgt_len, chunks, bsz, mem_len)
    key = jax.random.PRNGKey(11)
    l_ref, g_ref = _gen_loss_and_grad(gen_params, dis_params, rcfg, xcfg,
                                      gcfg_off, data, key)
    l_got, g_got = _gen_loss_and_grad(gen_params, dis_params, rcfg, xcfg,
                                      gcfg_chain, data, key)
    _assert_close(l_ref, g_ref, l_got, g_got)


def test_fullchain_pre_lnorm():
    (xcfg, gen_params, gcfg_off, gcfg_chain, rcfg, dis_params,
     data) = _setup(16, 2, 8, 16, pre_lnorm=True)
    key = jax.random.PRNGKey(5)
    l_ref, g_ref = _gen_loss_and_grad(gen_params, dis_params, rcfg, xcfg,
                                      gcfg_off, data, key)
    l_got, g_got = _gen_loss_and_grad(gen_params, dis_params, rcfg, xcfg,
                                      gcfg_chain, data, key)
    _assert_close(l_ref, g_ref, l_got, g_got)


def test_chain_terms_match_oracle_not_truncated():
    """Sanity: the chain adjoint reproduces the oracle's CHAIN terms,
    not just the truncated gradients. At T=0.2 (sharper softmax) the
    oracle's full-vs-truncated gradient gap is ~2.6e-6; the recompute
    path must sit on the full-chain side of that gap by orders of
    magnitude (measured 2.7e-11 vs the oracle)."""
    import dataclasses
    (xcfg, gen_params, gcfg_off, gcfg_chain, rcfg, dis_params,
     data) = _setup(16, 1, 8, 16)
    gcfg_seq_tr = dataclasses.replace(gcfg_off, truncate_backprop=True)
    key = jax.random.PRNGKey(3)
    T = 0.2
    _, g_oracle_full = _gen_loss_and_grad(gen_params, dis_params, rcfg,
                                          xcfg, gcfg_off, data, key, T)
    _, g_oracle_tr = _gen_loss_and_grad(gen_params, dis_params, rcfg,
                                        xcfg, gcfg_seq_tr, data, key, T)
    _, g_chain = _gen_loss_and_grad(gen_params, dis_params, rcfg, xcfg,
                                    gcfg_chain, data, key, T)

    def md(a, b):
        return max(float(jnp.max(jnp.abs(x - y))) for x, y in zip(
            jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)))

    chain_gap = md(g_oracle_full, g_oracle_tr)
    assert chain_gap > 1e-7, "probe setup lost the chain signal"
    # the adjoint must land on the full-chain gradients, far inside the
    # full-vs-truncated gap
    assert md(g_chain, g_oracle_full) < 0.01 * chain_gap


def test_fullchain_with_fused_sampler(monkeypatch):
    """Production path: the forward-only trajectory sampling runs on the
    fused decode kernel (interpret mode) and the loss/gradients still
    match the sequential oracle."""
    monkeypatch.setattr(pdec, "INTERPRET", True)
    (xcfg_p, gen_params, gcfg_off, gcfg_chain, rcfg, dis_params,
     data) = _setup(16, 2, 8, 16, use_pallas=True)
    xcfg_off = xl.XLConfig(**{**xcfg_p.__dict__, "use_pallas": False})
    key = jax.random.PRNGKey(2)
    l_ref, g_ref = _gen_loss_and_grad(gen_params, dis_params, rcfg,
                                      xcfg_off, gcfg_off, data, key)
    l_got, g_got = _gen_loss_and_grad(gen_params, dis_params, rcfg,
                                      xcfg_p, gcfg_chain, data, key)
    _assert_close(l_ref, g_ref, l_got, g_got)


def test_chain_kernel_asserts_when_unsupported():
    """chain_bwd='kernel' must fail loud when the kernel cannot apply
    (here: use_pallas=False), not silently fall back."""
    import dataclasses
    (xcfg, gen_params, gcfg_off, gcfg_chain, rcfg, dis_params,
     data) = _setup(16, 1, 8, 16, use_pallas=False)
    gcfg_kernel = dataclasses.replace(gcfg_chain, chain_bwd="kernel")
    key = jax.random.PRNGKey(0)
    with pytest.raises(ValueError, match="chain_bwd='kernel'"):
        _gen_loss_and_grad(gen_params, dis_params, rcfg, xcfg,
                           gcfg_kernel, data, key)


def test_chain_auto_falls_back_to_jnp_without_pallas():
    """chain_bwd='auto' without Pallas support must run the jnp chain —
    gradients equal the forced-jnp path bit-for-bit."""
    (xcfg, gen_params, gcfg_off, gcfg_chain, rcfg, dis_params,
     data) = _setup(16, 1, 8, 16, use_pallas=False)
    import dataclasses
    gcfg_auto = dataclasses.replace(gcfg_chain, chain_bwd="auto")
    key = jax.random.PRNGKey(4)
    l_j, g_j = _gen_loss_and_grad(gen_params, dis_params, rcfg, xcfg,
                                  gcfg_chain, data, key)
    l_a, g_a = _gen_loss_and_grad(gen_params, dis_params, rcfg, xcfg,
                                  gcfg_auto, data, key)
    assert float(l_a) == float(l_j)
    for a, b in zip(jax.tree_util.tree_leaves(g_j),
                    jax.tree_util.tree_leaves(g_a)):
        np.testing.assert_array_equal(np.asarray(b), np.asarray(a))


@pytest.mark.parametrize("chain_impl", ["kernel_recompute", "kernel"])
@pytest.mark.parametrize("tgt_len,chunks,bsz,mem_len,pre", [
    (32, 2, 8, 16, False),   # count growth + wrap, KL not 8-aligned
    (16, 1, 8, 32, False),   # single chunk, mem > sample_len
    (16, 2, 8, 16, True),    # pre-LN
])
def test_chain_kernel_matches_oracle(monkeypatch, tgt_len, chunks, bsz,
                                     mem_len, pre, chain_impl):
    """The fused chain-backward kernel (ops/pallas_chain_bwd.py,
    interpret mode) must reproduce the sequential oracle's loss and ALL
    generator gradients — both the self-recomputing kernel and the
    residual-streaming variant fed by the window pass."""
    from transformer_gan_tpu.ops import pallas_chain_bwd as pchain
    monkeypatch.setattr(pdec, "INTERPRET", True)
    monkeypatch.setattr(pchain, "INTERPRET", True)
    import dataclasses
    (xcfg_p, gen_params, gcfg_off, gcfg_chain, rcfg, dis_params,
     data) = _setup(tgt_len, chunks, bsz, mem_len, pre_lnorm=pre,
                    use_pallas=True)
    gcfg_kernel = dataclasses.replace(gcfg_chain, chain_bwd=chain_impl)
    xcfg_off = xl.XLConfig(**{**xcfg_p.__dict__, "use_pallas": False})
    key = jax.random.PRNGKey(13)
    l_ref, g_ref = _gen_loss_and_grad(gen_params, dis_params, rcfg,
                                      xcfg_off, gcfg_off, data, key)
    l_got, g_got = _gen_loss_and_grad(gen_params, dis_params, rcfg,
                                      xcfg_p, gcfg_kernel, data, key)
    _assert_close(l_ref, g_ref, l_got, g_got)


def test_chain_res_kernel_streamed_kv(monkeypatch):
    """The residual-streaming kernel's streamed-K/V branch (resident-KV
    gate off) must also match the oracle — tiny shapes always pass the
    resident gate, so force it off."""
    from transformer_gan_tpu.ops import pallas_chain_bwd as pchain
    monkeypatch.setattr(pdec, "INTERPRET", True)
    monkeypatch.setattr(pchain, "INTERPRET", True)
    monkeypatch.setattr(pchain, "_RES_KV_BUDGET", 0)
    import dataclasses
    (xcfg_p, gen_params, gcfg_off, gcfg_chain, rcfg, dis_params,
     data) = _setup(16, 2, 8, 16, use_pallas=True)
    gcfg_kernel = dataclasses.replace(gcfg_chain, chain_bwd="kernel")
    xcfg_off = xl.XLConfig(**{**xcfg_p.__dict__, "use_pallas": False})
    key = jax.random.PRNGKey(13)
    l_ref, g_ref = _gen_loss_and_grad(gen_params, dis_params, rcfg,
                                      xcfg_off, gcfg_off, data, key)
    l_got, g_got = _gen_loss_and_grad(gen_params, dis_params, rcfg,
                                      xcfg_p, gcfg_kernel, data, key)
    _assert_close(l_ref, g_ref, l_got, g_got)
