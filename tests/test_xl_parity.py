"""Numerical parity of the JAX Transformer-XL against the PyTorch reference.

Loads the actual reference model (read-only, /root/reference) on CPU, copies
our parameters into it, and compares per-token NLL and decode logits across
memory growth, per-row mem resets, and same_length eval masking. Skipped when
the reference checkout is unavailable.
"""

import os
import sys

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from transformer_gan_tpu.config import get_default_cfg_training  # noqa: E402
from transformer_gan_tpu.models import xl  # noqa: E402

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "model")),
    reason="reference checkout not available")


def _make_cfg(tgt_len=16, mem_len=32):
    cfg = get_default_cfg_training()
    cfg.defrost()
    cfg.MODEL.num_layers = 2
    cfg.MODEL.num_heads = 4
    cfg.MODEL.units = 32
    cfg.MODEL.inner_size = 64
    cfg.MODEL.dropout = 0.0
    cfg.MODEL.attention_dropout = 0.0
    cfg.TRAIN.tgt_length = tgt_len
    cfg.TRAIN.mem_length = mem_len
    cfg.TPU.compute_dtype = "float32"
    # the torch-parity fixtures compare raw hidden-state mems; pin the
    # reference-semantics memory layout (the kv path has its own
    # equivalence test below)
    cfg.TPU.cache_kv = False
    cfg.freeze()
    return cfg


def _build_ref_model(cfg, n_token):
    sys.path.insert(0, os.path.join(REF, "model"))
    import torch  # noqa: F401
    from mem_transformer import MemTransformerLM
    model = MemTransformerLM(cfg, n_token, 0)
    model.eval()
    return model


def _copy_params_to_torch(params, model):
    import torch

    def t(x):
        return torch.from_numpy(np.asarray(x))

    sd = model.state_dict()
    sd["word_emb.emb_layers.0.weight"] = t(params["word_emb"])
    sd["crit.out_layers.0.weight"] = t(params["word_emb"])  # tied
    sd["crit.out_layers.0.bias"] = t(params["crit_bias"])
    sd["r_w_bias"] = t(params["r_w_bias"])
    sd["r_r_bias"] = t(params["r_r_bias"])
    for i, layer in enumerate(params["layers"]):
        p = f"layers.{i}."
        sd[p + "dec_attn.qkv_net.weight"] = t(layer["qkv_w"]).T.contiguous()
        sd[p + "dec_attn.r_net.weight"] = t(layer["r_w"]).T.contiguous()
        sd[p + "dec_attn.o_net.weight"] = t(layer["o_w"]).T.contiguous()
        sd[p + "dec_attn.layer_norm.weight"] = t(layer["attn_ln_scale"])
        sd[p + "dec_attn.layer_norm.bias"] = t(layer["attn_ln_bias"])
        sd[p + "pos_ff.CoreNet.0.weight"] = t(layer["ff_w1"]).T.contiguous()
        sd[p + "pos_ff.CoreNet.0.bias"] = t(layer["ff_b1"])
        sd[p + "pos_ff.CoreNet.3.weight"] = t(layer["ff_w2"]).T.contiguous()
        sd[p + "pos_ff.CoreNet.3.bias"] = t(layer["ff_b2"])
        sd[p + "pos_ff.layer_norm.weight"] = t(layer["ff_ln_scale"])
        sd[p + "pos_ff.layer_norm.bias"] = t(layer["ff_ln_bias"])
    model.load_state_dict(sd)


@pytest.fixture(scope="module")
def setup():
    cfg = _make_cfg()
    n_token = 310
    xcfg = xl.XLConfig.from_cfg(cfg, n_token)
    params = xl.init_xl_params(xcfg, seed=7)
    ref = _build_ref_model(cfg, n_token)
    _copy_params_to_torch(params, ref)

    # jitted heads (eager JAX op dispatch is pathologically slow on CPU)
    import functools

    @functools.partial(jax.jit, static_argnames=("same_length",))
    def nll_fn(p, d, t, r, m, same_length=False):
        return xl.forward_nll(p, xcfg, d, t, r, m, same_length=same_length)

    @functools.partial(jax.jit, static_argnames=("same_length",))
    def gen_fn(p, d, m, same_length=False):
        return xl.forward_generate(p, xcfg, d, m, same_length=same_length)

    fns = {"nll": nll_fn, "gen": gen_fn}
    return cfg, xcfg, params, ref, fns


def test_mle_nll_parity_with_memory_growth_and_resets(setup):
    import torch
    cfg, xcfg, params, ref, fns = setup
    rng = np.random.RandomState(0)
    tgt_len, mem_len, bsz = 16, 32, 3

    mems_j = xl.init_mems(xcfg, mem_len, bsz)
    mems_t = None
    for step in range(5):
        data = rng.randint(0, 310, size=(tgt_len, bsz))
        target = rng.randint(0, 310, size=(tgt_len, bsz))
        reset = np.zeros((bsz,), dtype=bool)
        if step == 3:
            reset[1] = True  # piece boundary on one lane

        nll_j, mems_j = fns["nll"](
            params, jnp.asarray(data), jnp.asarray(target),
            jnp.asarray(reset), mems_j)

        with torch.no_grad():
            loss_t, mems_t = ref(
                torch.from_numpy(data), torch.from_numpy(target),
                torch.from_numpy(reset), mems_t)
        np.testing.assert_allclose(np.asarray(nll_j), loss_t.numpy(),
                                   rtol=2e-3, atol=2e-4)


def test_forward_generate_logits_parity(setup):
    import torch
    cfg, xcfg, params, ref, fns = setup
    rng = np.random.RandomState(1)
    data = rng.randint(0, 310, size=(12, 2))

    mems_j = xl.init_mems(xcfg, 32, 2)
    logits_j, mems_j = fns["gen"](params, jnp.asarray(data), mems_j)
    with torch.no_grad():
        logits_t, mems_t = ref.forward_generate(torch.from_numpy(data), None)
    np.testing.assert_allclose(np.asarray(logits_j), logits_t.numpy(),
                               rtol=1e-3, atol=2e-3)
    # Memory contents: our ring buffer tail must equal the reference mems.
    mlen = min(12, 32)
    ours = np.asarray(mems_j.hids)[:, -mlen:]
    theirs = mems_t.numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-3, atol=3e-4)


def test_same_length_eval_parity(setup):
    import torch
    cfg, xcfg, params, ref, fns = setup
    rng = np.random.RandomState(2)
    tgt_len, mem_len, bsz = 16, 32, 2
    ref.same_length = True
    try:
        mems_j = xl.init_mems(xcfg, mem_len, bsz)
        mems_t = None
        for step in range(4):
            data = rng.randint(0, 310, size=(tgt_len, bsz))
            target = rng.randint(0, 310, size=(tgt_len, bsz))
            nll_j, mems_j = fns["nll"](
                params, jnp.asarray(data), jnp.asarray(target),
                None, mems_j, same_length=True)
            with torch.no_grad():
                loss_t, mems_t = ref(
                    torch.from_numpy(data), torch.from_numpy(target),
                    None, mems_t)
            np.testing.assert_allclose(np.asarray(nll_j), loss_t.numpy(),
                                       rtol=2e-3, atol=2e-4)
    finally:
        ref.same_length = False


def test_incremental_equals_batch_decode(setup):
    """The reference generate.py debug invariant (generate.py:309-327):
    token-by-token decoding with memory carry equals one batch forward."""
    cfg, xcfg, params, ref, fns = setup
    rng = np.random.RandomState(3)
    seq = rng.randint(0, 310, size=(24, 1))

    mem_len = 32
    mems_inc = xl.init_mems(xcfg, mem_len, 1)
    inc_logits = []
    for t in range(seq.shape[0]):
        logits, mems_inc = fns["gen"](
            params, jnp.asarray(seq[t:t + 1]), mems_inc, same_length=True)
        inc_logits.append(np.asarray(logits)[0])

    mems_b = xl.init_mems(xcfg, mem_len, 1)
    batch_logits, mems_b = fns["gen"](
        params, jnp.asarray(seq), mems_b, same_length=True)

    np.testing.assert_allclose(
        np.asarray(mems_inc.hids), np.asarray(mems_b.hids),
        rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(batch_logits)[-1],
                               inc_logits[-1], rtol=1e-3, atol=1e-3)


def test_gumbel_st_properties():
    cfg = _make_cfg()
    xcfg = xl.XLConfig.from_cfg(cfg, 310)
    rng = jax.random.PRNGKey(0)
    logits = jax.random.normal(jax.random.PRNGKey(1), (4, 2, 310))

    onehot = xl.gumbel_softmax_st(logits, 1.0, rng)
    arr = np.asarray(onehot)
    np.testing.assert_allclose(arr.sum(-1), 1.0, rtol=1e-6)
    assert ((arr == arr.max(-1, keepdims=True)) | (np.abs(arr) < 1)).all()
    # hard one-hot in the forward pass
    assert set(np.unique(arr.round(6))).issubset({0.0, 1.0})

    # gradient flows via the soft sample
    def f(lg):
        return xl.gumbel_softmax_st(lg, 1.0, rng).sum()
    g = jax.grad(f)(logits)
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).max() > 0


def test_kv_cache_path_matches_hidden_path():
    """cache_kv=True (projected K/V memory) must be numerically equivalent
    to the reference-semantics hidden-state memory path."""
    import dataclasses
    cfg = _make_cfg()
    xcfg_h = xl.XLConfig.from_cfg(cfg, 310)
    xcfg_kv = dataclasses.replace(xcfg_h, cache_kv=True)
    params = xl.init_xl_params(xcfg_h, seed=11)

    rng = np.random.RandomState(4)
    mems_h = xl.init_mems(xcfg_h, 32, 2)
    mems_kv = xl.init_mems(xcfg_kv, 32, 2)
    assert mems_kv.hids.shape == (2, 2, 4, 2, 32, 8)  # [L, 2, h, b, M, dh]

    import functools

    @functools.partial(jax.jit, static_argnames=("kv",))
    def run(params, d, t, r, m, kv):
        c = xcfg_kv if kv else xcfg_h
        return xl.forward_nll(params, c, d, t, r, m)

    for step in range(4):
        data = jnp.asarray(rng.randint(0, 310, (16, 2)))
        target = jnp.asarray(rng.randint(0, 310, (16, 2)))
        reset = jnp.asarray(
            np.array([step == 2, False]))  # reset one lane mid-stream
        nll_h, mems_h = run(params, data, target, reset, mems_h, False)
        nll_kv, mems_kv = run(params, data, target, reset, mems_kv, True)
        np.testing.assert_allclose(np.asarray(nll_kv), np.asarray(nll_h),
                                   rtol=2e-4, atol=2e-5)


def test_pallas_fused_attention_matches_jnp(monkeypatch):
    """v1 fused kernel (interpret mode on CPU) == jnp kv path, fwd+grads.

    qlen 12 (>= 8, not a multiple of 8) exercises the v1 fallback path
    specifically (v2 handles multiples of 8)."""
    import dataclasses
    from transformer_gan_tpu.ops import pallas_attention as pa
    monkeypatch.setattr(pa, "INTERPRET", True)

    cfg = _make_cfg()
    base = xl.XLConfig.from_cfg(cfg, 310)
    xcfg_kv = dataclasses.replace(base, cache_kv=True, use_pallas=False)
    xcfg_pl = dataclasses.replace(base, cache_kv=True, use_pallas=True)
    params = xl.init_xl_params(xcfg_kv, seed=13)

    rng = np.random.RandomState(6)
    data = jnp.asarray(rng.randint(0, 310, (12, 2)))
    target = jnp.asarray(rng.randint(0, 310, (12, 2)))
    reset = jnp.asarray(np.array([True, False]))

    mems_a = xl.init_mems(xcfg_kv, 32, 2)
    mems_b = xl.init_mems(xcfg_pl, 32, 2)
    # advance one step so count > 0 and memory is non-trivial
    _, mems_a = xl.forward_nll(params, xcfg_kv, data, target, None, mems_a)
    _, mems_b = xl.forward_nll(params, xcfg_pl, data, target, None, mems_b)

    def loss(p, c, m):
        nll, _ = xl.forward_nll(p, c, data, target, reset, m,
                                same_length=True)
        return nll.mean()

    la = loss(params, xcfg_kv, mems_a)
    lb = loss(params, xcfg_pl, mems_b)
    np.testing.assert_allclose(float(lb), float(la), rtol=1e-5, atol=1e-6)

    ga = jax.grad(lambda p: loss(p, xcfg_kv, mems_a))(params)
    gb = jax.grad(lambda p: loss(p, xcfg_pl, mems_b))(params)
    fa = np.concatenate([np.asarray(x).ravel()
                         for x in jax.tree_util.tree_leaves(ga)])
    fb = np.concatenate([np.asarray(x).ravel()
                         for x in jax.tree_util.tree_leaves(gb)])
    np.testing.assert_allclose(fb, fa, rtol=5e-4, atol=1e-6)


def test_pallas_v2_fused_attention_matches_jnp(monkeypatch):
    """v2 kernel (in-kernel position term) == jnp kv path, fwd + grads."""
    import dataclasses
    from transformer_gan_tpu.ops import pallas_attention as pa
    from transformer_gan_tpu.ops import pallas_attention_v2 as pa2
    monkeypatch.setattr(pa, "INTERPRET", True)
    monkeypatch.setattr(pa2, "INTERPRET", True)
    monkeypatch.setattr(pa2, "_FAST_BF16_SHIFT", [False])

    cfg = _make_cfg()
    base = xl.XLConfig.from_cfg(cfg, 310)
    xcfg_kv = dataclasses.replace(base, cache_kv=True, use_pallas=False)
    xcfg_pl = dataclasses.replace(base, cache_kv=True, use_pallas=True)
    params = xl.init_xl_params(xcfg_kv, seed=21)

    rng = np.random.RandomState(8)
    data = jnp.asarray(rng.randint(0, 310, (16, 2)))   # qlen 16 % 8 == 0
    target = jnp.asarray(rng.randint(0, 310, (16, 2)))
    reset = jnp.asarray(np.array([False, True]))

    mems_a = xl.init_mems(xcfg_kv, 32, 2)
    mems_b = xl.init_mems(xcfg_pl, 32, 2)
    _, mems_a = xl.forward_nll(params, xcfg_kv, data, target, None, mems_a)
    _, mems_b = xl.forward_nll(params, xcfg_pl, data, target, None, mems_b)

    def loss(p, c, m):
        nll, _ = xl.forward_nll(p, c, data, target, reset, m,
                                same_length=True)
        return nll.mean()

    la = loss(params, xcfg_kv, mems_a)
    lb = loss(params, xcfg_pl, mems_b)
    np.testing.assert_allclose(float(lb), float(la), rtol=1e-5, atol=1e-6)

    ga = jax.grad(lambda p: loss(p, xcfg_kv, mems_a))(params)
    gb = jax.grad(lambda p: loss(p, xcfg_pl, mems_b))(params)
    fa = np.concatenate([np.asarray(x).ravel()
                         for x in jax.tree_util.tree_leaves(ga)])
    fb = np.concatenate([np.asarray(x).ravel()
                         for x in jax.tree_util.tree_leaves(gb)])
    np.testing.assert_allclose(fb, fa, rtol=5e-4, atol=1e-6)


def test_kernel_dispatch_constraints():
    """supports_v2 gates the v2 kernel's Mosaic shape constraints: 8-row
    q blocks for the shift extraction and (on hardware) a lane-aligned
    mem boundary for the backward's ds[:, mem:] slice; mem 0 has no
    memory block to read."""
    from transformer_gan_tpu.ops.pallas_attention_v2 import supports_v2
    assert supports_v2(128, 1024)           # training op-point
    assert supports_v2(128, 128)            # GAN dis op-point
    assert supports_v2(128, 2048)           # eval op-point
    assert not supports_v2(12, 1024)        # qlen % 8 != 0 -> v1
    assert not supports_v2(128, 96)         # unaligned mem -> v1 (hw)
    assert supports_v2(16, 32, interpret=True)   # CPU tests: any mem
    assert not supports_v2(128, 0)          # no memory block
