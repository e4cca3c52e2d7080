"""Fused whole-chunk generation kernel (ops/pallas_generate.py) vs the
jnp ``sample_scan`` oracle, interpret mode on CPU.

The fused path must be SAMPLE-EXACT: the categorical draw is
argmax(z + G) over the top-k kept set with G = jax.random.gumbel on the
oracle's per-lane keys (exactly what jax.random.categorical draws), and
softmax monotonicity makes the kept set and the argmax equal the
oracle's — so sampled ids match id-for-id."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from transformer_gan_tpu.infer import sample as isample
from transformer_gan_tpu.models import xl
from transformer_gan_tpu.ops import pallas_generate as pgen


def _setup(pre_lnorm=False):
    base = dict(n_layer=2, n_head=2, d_model=16, d_inner=32,
                dropout=0.0, dropatt=0.0, n_token=310,
                pre_lnorm=pre_lnorm)
    xcfg_jnp = xl.XLConfig(cache_kv=True, use_pallas=False, **base)
    xcfg_fused = xl.XLConfig(cache_kv=True, use_pallas=True, **base)
    params = xl.init_xl_params(xcfg_jnp, seed=0)
    return xcfg_jnp, xcfg_fused, params


def _run(params, xcfg, scfg, length, bsz, mem_len, key, prime=None):
    mems = xl.init_mems(xcfg, mem_len, bsz)
    if prime is not None:
        _, mems = xl.forward_generate(params, xcfg, prime, mems,
                                      same_length=True)
    first = jnp.full((bsz,), 2, jnp.int32)
    toks, out_mems = isample.sample_scan(params, xcfg, scfg, first, mems,
                                         length, key)
    return np.asarray(toks), out_mems


@pytest.mark.parametrize("technique,bsz,mem_len,length", [
    ("topk", 1, 40, 40),      # M=40: front-pad path (P=88), chunk+rem
    ("topk", 4, 32, 40),      # batched lanes
    ("random", 1, 30, 24),    # no top-k filtering, single inner chunk
])
def test_fused_generate_matches_oracle_default_temp(
        monkeypatch, technique, bsz, mem_len, length):
    _oracle_match(monkeypatch, technique, bsz, mem_len, length,
                  temperature=0.9)


@pytest.mark.parametrize("technique,temperature", [
    ("topk", 0.02),    # peaked: softmax underflow regime — the oracle's
    ("random", 0.02),  # prob-space threshold + log(max(p,1e-38)) floor
    ("topk", 5.0),     # near-uniform: threshold-boundary ties
])
def test_fused_generate_matches_oracle_extreme_temp(
        monkeypatch, technique, temperature):
    """The kernel computes the oracle's formulas VERBATIM (softmax ->
    prob-space top-k -> 1e-38 floor -> +gumbel argmax), so agreement
    holds in the underflow/tie regimes where a z-space formulation's
    monotonicity argument breaks down."""
    _oracle_match(monkeypatch, technique, 2, 32, 24,
                  temperature=temperature)


def _oracle_match(monkeypatch, technique, bsz, mem_len, length,
                  temperature):
    monkeypatch.setattr(pgen, "INTERPRET", True)
    xcfg_jnp, xcfg_fused, params = _setup()
    scfg = isample.SamplingConfig(technique=technique, topk=5,
                                  temperature=temperature,
                                  exclude_bos=True,
                                  num_empty_to_ignore=0)
    key = jax.random.PRNGKey(7)
    assert pgen.supports_fused_generate(
        xcfg_fused, scfg, bsz, mem_len,
        min(isample.DECODE_CHUNK, length))
    ref, mems_ref = _run(params, xcfg_jnp, scfg, length, bsz, mem_len,
                         key)
    got, mems_got = _run(params, xcfg_fused, scfg, length, bsz, mem_len,
                         key)
    np.testing.assert_array_equal(ref, got)
    np.testing.assert_allclose(
        np.asarray(mems_got.hids), np.asarray(mems_ref.hids), atol=1e-4)
    assert int(mems_got.count) == int(mems_ref.count)


def test_kv_streamed_matches_kv_resident(monkeypatch):
    """The small shapes above auto-pass the resident-K/V budget, so the
    oracle-match tests cover the default rolled kv_resident path; this
    pins the other two fetch/grid variants to the same ids: the
    layer-unrolled (T,) grid (UNROLL_LAYERS on — measured perf
    negative, kept as a variant) and the streamed per-(t, l) fallback
    (budget gate forced off — what wider batches at big mem run)."""
    monkeypatch.setattr(pgen, "INTERPRET", True)
    xcfg_jnp, xcfg_fused, params = _setup()
    scfg = isample.SamplingConfig(technique="topk", topk=5,
                                  temperature=0.9, exclude_bos=True,
                                  num_empty_to_ignore=0)
    key = jax.random.PRNGKey(11)
    assert pgen.generate_vmem_bytes(
        xcfg_fused, 2, 128, 32, kv_resident=True) < pgen._KV_RES_BUDGET
    res, mems_res = _run(params, xcfg_fused, scfg, 40, 2, 40, key)
    # layer-unrolled (T,) grid with resident K/V (UNROLL_LAYERS on)
    monkeypatch.setattr(pgen, "UNROLL_LAYERS", True)
    jax.clear_caches()   # sample_scan_jit's statics are unchanged
    unrl, mems_unrl = _run(params, xcfg_fused, scfg, 40, 2, 40, key)
    # streamed per-(t, l) K/V (budget gate forced off)
    monkeypatch.setattr(pgen, "_KV_RES_BUDGET", 0)
    pgen._make_gen_call.cache_clear()
    jax.clear_caches()
    try:
        got, mems_got = _run(params, xcfg_fused, scfg, 40, 2, 40, key)
    finally:
        pgen._make_gen_call.cache_clear()
        jax.clear_caches()
    np.testing.assert_array_equal(res, unrl)
    np.testing.assert_array_equal(res, got)
    np.testing.assert_allclose(
        np.asarray(mems_unrl.hids), np.asarray(mems_res.hids),
        atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(mems_got.hids), np.asarray(mems_res.hids), atol=1e-6)


def test_fused_generate_argmax_and_suppression(monkeypatch):
    """temperature==0 argmax plus the stateful repeated-TIME_SHIFT_100
    suppression counter must match the oracle."""
    monkeypatch.setattr(pgen, "INTERPRET", True)
    xcfg_jnp, xcfg_fused, params = _setup()
    scfg = isample.SamplingConfig(technique="topk", topk=5,
                                  temperature=0.0, exclude_bos=True,
                                  num_empty_to_ignore=2)
    key = jax.random.PRNGKey(3)
    ref, _ = _run(params, xcfg_jnp, scfg, 20, 1, 30, key)
    got, _ = _run(params, xcfg_fused, scfg, 20, 1, 30, key)
    np.testing.assert_array_equal(ref, got)
    # argmax generation of a fixed model degenerates into repeats: the
    # suppression rule must actually have fired for this to be a test
    assert (ref == scfg.empty_token).sum() <= 3 * (20 // 3) + 3


def test_fused_generate_primed_memory(monkeypatch):
    """Nonzero starting count (primed context) keeps the mask algebra
    right through the front padding."""
    from transformer_gan_tpu.ops import pallas_attention as pa
    from transformer_gan_tpu.ops import pallas_attention_v2 as pa2
    monkeypatch.setattr(pgen, "INTERPRET", True)
    # the priming forward runs the XL attention kernels under use_pallas
    monkeypatch.setattr(pa, "INTERPRET", True)
    monkeypatch.setattr(pa2, "INTERPRET", True)
    xcfg_jnp, xcfg_fused, params = _setup(pre_lnorm=True)
    scfg = isample.SamplingConfig(technique="topk", topk=8,
                                  temperature=0.95)
    rng = np.random.RandomState(0)
    prime = jnp.asarray(rng.randint(2, 310, (9, 2)))
    key = jax.random.PRNGKey(11)
    ref, _ = _run(params, xcfg_jnp, scfg, 30, 2, 30, key, prime=prime)
    got, _ = _run(params, xcfg_fused, scfg, 30, 2, 30, key, prime=prime)
    np.testing.assert_array_equal(ref, got)


def test_vmem_gate_refuses_oversize_shapes():
    """Shapes whose streamed K/V blocks + resident weights exceed the
    Mosaic VMEM budget must be gated to the jnp path instead of failing
    at kernel compile time (bsz=32, mem 2048, d_model 500 streams ~262MB
    of K/V alone against the 100MB limit)."""
    big = xl.XLConfig(n_layer=6, n_head=10, d_model=500, d_inner=1000,
                      n_token=310, cache_kv=True, use_pallas=True,
                      compute_dtype="bfloat16")
    scfg = isample.SamplingConfig(technique="topk", topk=32)
    assert pgen.generate_vmem_bytes(big, 32, 2048, 32) > pgen._VMEM_LIMIT
    assert not pgen.supports_fused_generate(big, scfg, 32, 2048, 32)
    # the validated bench op-point (single lane, mem 4146 front-padded
    # to 4224) must stay inside the gate
    assert pgen.supports_fused_generate(big, scfg, 1, 4224, 32)


def test_kv_resident_gate_op_points():
    """Resident-K/V selection at the flagship inference op-point: a
    single lane at mem 4146 holds the whole 50.7MB K/V pair in VMEM
    (the measured 108 -> 87 us/token win); two lanes exceed the raised
    budget and must fall back to the streamed fused wave."""
    big = xl.XLConfig(n_layer=6, n_head=10, d_model=500, d_inner=1000,
                      n_token=310, cache_kv=True, use_pallas=True,
                      compute_dtype="bfloat16")
    scfg = isample.SamplingConfig(technique="topk", topk=32)
    assert pgen.supports_kv_resident(big, scfg, 1, 4146, 32)
    assert not pgen.supports_kv_resident(big, scfg, 2, 4146, 32)
    # but 2 lanes remain fused-capable on the streamed path
    assert pgen.supports_fused_generate(big, scfg, 2, 4146, 32)


def test_nucleus_stays_on_jnp_path():
    """Nucleus sampling is not kernel-supported — the gate must refuse
    it so sample_scan keeps the jnp path."""
    xcfg_jnp, xcfg_fused, params = _setup()
    scfg = isample.SamplingConfig(technique="nucleus", nucleus_p=0.9)
    assert not pgen.supports_fused_generate(xcfg_fused, scfg, 1, 32, 32)
    key = jax.random.PRNGKey(1)
    toks, _ = _run(params, xcfg_fused, scfg, 8, 1, 32, key)
    assert toks.shape == (8, 1)


def test_gumbel_metrics_generation_matches_oracle(monkeypatch):
    """generate_tokens_gumbel (quality-metrics sampling) on the fused
    kernel must sample the exact ids of the jnp chunked path (same
    pre-transformed gumbel stream, argmax(l + g) with T cancelling)."""
    monkeypatch.setattr(pgen, "INTERPRET", True)
    xcfg_jnp, xcfg_fused, params = _setup()
    first = jnp.full((2,), 2, jnp.int32)
    key = jax.random.PRNGKey(9)
    mems_j = xl.init_mems(xcfg_jnp, 40, 2)
    ref = isample.generate_tokens_gumbel(params, xcfg_jnp, 0.9, 41,
                                         first, mems_j, key)
    got = isample.generate_tokens_gumbel(params, xcfg_fused, 0.9, 41,
                                         first, mems_j, key)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))
