"""Sampling semantics: filters, suppression, scan/host-loop agreement."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from transformer_gan_tpu.infer import sample as sampling  # noqa: E402
from transformer_gan_tpu.models import xl  # noqa: E402


def _sample_dist(scfg, logits, n=4000, empty_run=0, seed=0):
    keys = jax.random.split(jax.random.PRNGKey(seed), n)
    draw = jax.jit(jax.vmap(
        lambda k: sampling._filter_and_sample(
            logits, scfg, jnp.asarray(empty_run), k)))
    return np.bincount(np.asarray(draw(keys)), minlength=logits.shape[0])


def test_topk_filter_restricts_support():
    rng = np.random.RandomState(0)
    logits = jnp.asarray(rng.randn(310) * 2)
    scfg = sampling.SamplingConfig(technique="topk", topk=5,
                                   temperature=1.0, exclude_bos=False)
    counts = _sample_dist(scfg, logits)
    top5 = set(np.argsort(np.asarray(logits))[-5:])
    assert set(np.nonzero(counts)[0]).issubset(top5)


def test_nucleus_keeps_prefix_above_p():
    # peaked distribution: nucleus 0.5 keeps only the top token(s)
    logits = jnp.asarray(np.array([10.0, 1.0, 0.5] + [0.0] * 307))
    scfg = sampling.SamplingConfig(technique="nucleus", nucleus_p=0.5,
                                   temperature=1.0, exclude_bos=False)
    counts = _sample_dist(scfg, logits)
    assert counts[0] == counts.sum()  # p(top) > 0.99 > p -> only it kept

    # flat-ish: nucleus keeps > 1 token
    logits2 = jnp.asarray(np.array([1.0, 1.0, 1.0, 1.0] + [-10.0] * 306))
    counts2 = _sample_dist(scfg, logits2)
    assert (counts2[:4] > 0).sum() >= 2


def test_exclude_bos_and_empty_suppression():
    logits = jnp.asarray(np.zeros(310))
    scfg = sampling.SamplingConfig(technique="random", temperature=1.0,
                                   exclude_bos=True, num_empty_to_ignore=2,
                                   empty_token=101)
    counts = _sample_dist(scfg, logits, empty_run=2)
    assert counts[0] == 0      # BOS excluded
    assert counts[101] == 0    # empty token suppressed after 2 repeats
    counts2 = _sample_dist(scfg, logits, empty_run=1)
    assert counts2[101] > 0    # not yet suppressed


def test_temperature_zero_is_argmax():
    rng = np.random.RandomState(1)
    logits = jnp.asarray(rng.randn(310))
    scfg = sampling.SamplingConfig(technique="topk", topk=32,
                                   temperature=0.0, exclude_bos=False)
    counts = _sample_dist(scfg, logits, n=16)
    assert counts[int(jnp.argmax(logits))] == 16


def test_scan_matches_host_loop():
    """sample_scan must generate the same tokens as the per-token host loop
    for the same PRNG stream."""
    xcfg = xl.XLConfig(n_layer=2, n_head=2, d_model=16, d_inner=32,
                       dropout=0.0, dropatt=0.0, cache_kv=True)
    params = xl.init_xl_params(xcfg, seed=3)
    scfg = sampling.SamplingConfig(technique="topk", topk=8,
                                   temperature=0.9)
    n = 12
    rng = jax.random.PRNGKey(7)
    rngs = jax.random.split(rng, n)

    # host loop (step-by-step), feeding the same per-step keys
    step = sampling.make_decode_step(xcfg, scfg)
    mems = xl.init_mems(xcfg, 32, 1)
    tok = jnp.zeros((1,), jnp.int32)
    er = jnp.zeros((1,), jnp.int32)
    host_tokens = []
    for i in range(n):
        tok, mems, er = step(params, mems, tok, er, rngs[i])
        host_tokens.append(int(tok[0]))

    # scan path: replicate its internal rng handling
    mems2 = xl.init_mems(xcfg, 32, 1)
    toks, _ = sampling.sample_scan(
        params, xcfg, scfg, jnp.zeros((1,), jnp.int32), mems2, n, rng)
    scan_tokens = [int(t) for t in np.asarray(toks)[:, 0]]
    assert scan_tokens == host_tokens


@pytest.mark.parametrize("same_length", [True, False])
def test_chunked_decode_matches_forward_generate(same_length):
    """decode_chunk_step (two-level cache, precomputed r-heads) must produce
    the same logits as the general forward_generate path at every step,
    through the growth phase, inside chunks, and across chunk merges."""
    xcfg = xl.XLConfig(n_layer=2, n_head=2, d_model=16, d_inner=32,
                       dropout=0.0, dropatt=0.0, cache_kv=True)
    params = xl.init_xl_params(xcfg, seed=5)
    mem_len, bsz, C, T = 6, 2, 4, 19  # T spans several merges; rem chunk
    rng = np.random.RandomState(0)
    toks = rng.randint(0, xcfg.n_token, (T, bsz)).astype(np.int32)

    mems = xl.init_mems(xcfg, mem_len, bsz)
    state = xl.init_decode_state(params, xcfg, mem_len, bsz)
    stage = xl.init_decode_stage(xcfg, C, bsz)
    t = 0
    for step_i in range(T):
        inp = jnp.asarray(toks[step_i])
        lg_ref, mems = xl.forward_generate(
            params, xcfg, inp[None], mems, same_length=same_length)
        lg_new, stage = xl.decode_chunk_step(
            params, xcfg, inp, state, stage, jnp.asarray(t, jnp.int32),
            same_length=same_length)
        np.testing.assert_allclose(
            np.asarray(lg_new), np.asarray(lg_ref[0]),
            rtol=1e-4, atol=1e-4, err_msg=f"step {step_i}")
        t += 1
        if t == C:
            state = xl.merge_decode_state(xcfg, state, stage, C)
            stage = xl.init_decode_stage(xcfg, C, bsz)
            t = 0

    # memory extraction parity after a partial chunk
    if t:
        state = xl.merge_decode_state(xcfg, state, stage, t)
    ring_mems = xl.mems_from_decode_state(xcfg, state)
    assert int(ring_mems.count) == int(mems.count)
    np.testing.assert_allclose(np.asarray(ring_mems.hids),
                               np.asarray(mems.hids), rtol=1e-4, atol=1e-4)


def test_chunked_decode_after_priming():
    """Prefix priming (batch forward) -> decode-state conversion ->
    incremental decode must match continuing with forward_generate."""
    xcfg = xl.XLConfig(n_layer=2, n_head=2, d_model=16, d_inner=32,
                       dropout=0.0, dropatt=0.0, cache_kv=True)
    params = xl.init_xl_params(xcfg, seed=9)
    mem_len, bsz, C = 8, 1, 4
    rng = np.random.RandomState(3)
    ctx = jnp.asarray(rng.randint(0, xcfg.n_token, (5, bsz)), jnp.int32)

    mems0 = xl.init_mems(xcfg, mem_len, bsz)
    _, primed = xl.forward_generate(params, xcfg, ctx, mems0,
                                    same_length=True)

    mems = primed
    state = xl.decode_state_from_mems(params, xcfg, primed)
    stage = xl.init_decode_stage(xcfg, C, bsz)
    toks = rng.randint(0, xcfg.n_token, (10, bsz)).astype(np.int32)
    t = 0
    for step_i in range(10):
        inp = jnp.asarray(toks[step_i])
        lg_ref, mems = xl.forward_generate(
            params, xcfg, inp[None], mems, same_length=True)
        lg_new, stage = xl.decode_chunk_step(
            params, xcfg, inp, state, stage, jnp.asarray(t, jnp.int32),
            same_length=True)
        np.testing.assert_allclose(
            np.asarray(lg_new), np.asarray(lg_ref[0]),
            rtol=1e-4, atol=1e-4, err_msg=f"step {step_i}")
        t += 1
        if t == C:
            state = xl.merge_decode_state(xcfg, state, stage, C)
            stage = xl.init_decode_stage(xcfg, C, bsz)
            t = 0


@pytest.mark.parametrize("bsz", [3, 8])  # fused K‖R vs per-head scores
def test_chunked_decode_batched_lanes(bsz):
    """Chunked decode with bsz>1 must equal per-lane forward_generate:
    lanes are independent sequences sharing one compiled program.
    bsz=3 uses the fused K‖R score matmul, bsz=8 the per-head einsums
    (xl.FUSED_SCORE_MAX_BSZ)."""
    xcfg = xl.XLConfig(n_layer=2, n_head=2, d_model=16, d_inner=32,
                       dropout=0.0, dropatt=0.0, cache_kv=True)
    params = xl.init_xl_params(xcfg, seed=11)
    mem_len, C, T = 6, 4, 10
    rng = np.random.RandomState(7)
    toks = rng.randint(0, xcfg.n_token, (T, bsz)).astype(np.int32)

    mems = xl.init_mems(xcfg, mem_len, bsz)
    state = xl.init_decode_state(params, xcfg, mem_len, bsz)
    stage = xl.init_decode_stage(xcfg, C, bsz)
    t = 0
    for step_i in range(T):
        inp = jnp.asarray(toks[step_i])
        lg_ref, mems = xl.forward_generate(
            params, xcfg, inp[None], mems, same_length=True)
        lg_new, stage = xl.decode_chunk_step(
            params, xcfg, inp, state, stage, jnp.asarray(t, jnp.int32),
            same_length=True)
        np.testing.assert_allclose(
            np.asarray(lg_new), np.asarray(lg_ref[0]),
            rtol=1e-4, atol=1e-4, err_msg=f"step {step_i}")
        t += 1
        if t == C:
            state = xl.merge_decode_state(xcfg, state, stage, C)
            stage = xl.init_decode_stage(xcfg, C, bsz)
            t = 0


def test_gumbel_generation_chunked_matches_rolling():
    """generate_tokens_gumbel must produce the same token sequences through
    the chunked decode (cache_kv) as through the rolling forward path,
    for the same PRNG key."""
    import dataclasses
    xcfg_kv = xl.XLConfig(n_layer=2, n_head=2, d_model=16, d_inner=32,
                          dropout=0.0, dropatt=0.0, cache_kv=True)
    xcfg_roll = dataclasses.replace(xcfg_kv, cache_kv=False)
    params = xl.init_xl_params(xcfg_kv, seed=4)
    seq_len, bsz = 11, 8  # not a multiple of the chunk; exercises rem
    # bsz 8 > FUSED_SCORE_MAX_BSZ: exercises the per-head score layout
    rng = jax.random.PRNGKey(42)
    first = jnp.zeros((bsz,), jnp.int32)

    toks_kv = sampling.generate_tokens_gumbel(
        params, xcfg_kv, 1.0, seq_len, first,
        xl.init_mems(xcfg_kv, seq_len, bsz), rng)
    toks_roll = sampling.generate_tokens_gumbel(
        params, xcfg_roll, 1.0, seq_len, first,
        xl.init_mems(xcfg_roll, seq_len, bsz), rng)
    assert np.asarray(toks_kv).shape == (seq_len, bsz)
    np.testing.assert_array_equal(np.asarray(toks_kv),
                                  np.asarray(toks_roll))


def test_chunked_decode_mem_smaller_than_chunk():
    """mem_len < DECODE_CHUNK: the decode chunk must be capped at the
    ring size (regression: the merge grew the buffer — scan carry shape
    mismatch — and the staging BD slice clamped at t > M). Chunked
    sampling must match the rolling path token-for-token."""
    import dataclasses
    assert sampling.DECODE_CHUNK > 16
    xcfg_kv = xl.XLConfig(n_layer=2, n_head=2, d_model=16, d_inner=32,
                          dropout=0.0, dropatt=0.0, cache_kv=True)
    xcfg_roll = dataclasses.replace(xcfg_kv, cache_kv=False)
    params = xl.init_xl_params(xcfg_kv, seed=5)
    mem_len, bsz, length = 16, 2, 40  # several merges of the small ring
    scfg = sampling.SamplingConfig(technique="topk", topk=8,
                                   temperature=0.9)
    rng = jax.random.PRNGKey(11)
    first = jnp.zeros((bsz,), jnp.int32)

    toks_kv, _ = sampling.sample_scan(
        params, xcfg_kv, scfg, first,
        xl.init_mems(xcfg_kv, mem_len, bsz), length, rng)
    toks_roll, _ = sampling.sample_scan(
        params, xcfg_roll, scfg, first,
        xl.init_mems(xcfg_roll, mem_len, bsz), length, rng)
    np.testing.assert_array_equal(np.asarray(toks_kv),
                                  np.asarray(toks_roll))


def test_gumbel_generation_mem_smaller_than_chunk():
    """Same regression for generate_tokens_gumbel when the priming mems
    ring is smaller than DECODE_CHUNK."""
    import dataclasses
    xcfg_kv = xl.XLConfig(n_layer=2, n_head=2, d_model=16, d_inner=32,
                          dropout=0.0, dropatt=0.0, cache_kv=True)
    xcfg_roll = dataclasses.replace(xcfg_kv, cache_kv=False)
    params = xl.init_xl_params(xcfg_kv, seed=6)
    mem_len, bsz, seq_len = 12, 2, 39
    rng = jax.random.PRNGKey(13)
    first = jnp.zeros((bsz,), jnp.int32)

    toks_kv = sampling.generate_tokens_gumbel(
        params, xcfg_kv, 1.0, seq_len, first,
        xl.init_mems(xcfg_kv, mem_len, bsz), rng)
    toks_roll = sampling.generate_tokens_gumbel(
        params, xcfg_roll, 1.0, seq_len, first,
        xl.init_mems(xcfg_roll, mem_len, bsz), rng)
    np.testing.assert_array_equal(np.asarray(toks_kv),
                                  np.asarray(toks_roll))


@pytest.mark.parametrize("cache_kv", [True, False])
def test_chunked_prime_matches_single_shot(cache_kv):
    """make_prime_step drives long contexts as a host loop of
    <=window-token forwards; with window <= mem_len the composed ring
    memory must equal the single-shot batch forward's (the VMEM-safe
    replacement for the one-program debug prime, cli/generate.py)."""
    xcfg = xl.XLConfig(n_layer=2, n_head=2, d_model=16, d_inner=32,
                       dropout=0.0, dropatt=0.0, cache_kv=cache_kv)
    params = xl.init_xl_params(xcfg, seed=13)
    rng = np.random.default_rng(0)
    T, M = 70, 80  # M >= T so the oracle leg is truly one forward
    context = jnp.asarray(rng.integers(0, xcfg.n_token, (T, 1)),
                          jnp.int32)

    single = sampling.make_prime_step(xcfg, window=T)
    logits1, mems1 = single(params, context, xl.init_mems(xcfg, M, 1))

    # 3 uneven chunks (32, 32, 6); window < mem_len so composition is
    # exact, and the last-chunk logits window must agree too
    chunked = sampling.make_prime_step(xcfg, window=32)
    logits2, mems2 = chunked(params, context, xl.init_mems(xcfg, M, 1))

    np.testing.assert_allclose(np.asarray(mems1.hids, np.float32),
                               np.asarray(mems2.hids, np.float32),
                               atol=2e-5, rtol=1e-5)
    assert int(mems1.count) == int(mems2.count)
    np.testing.assert_allclose(
        np.asarray(logits1[-6:], np.float32),
        np.asarray(logits2[-6:], np.float32), atol=2e-5, rtol=1e-5)
