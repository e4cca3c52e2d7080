"""Autoregressive sampling with cached XL memories.

Counterpart of the reference inference hot loop (model/generate.py:177-304):
prefix priming in one batch forward, then token-by-token decoding where the
rolling XL memory is the KV cache. Here the entire per-token computation —
1-token forward, BOS exclusion, repeated-TIME_SHIFT_100 suppression,
temperature, top-k / nucleus / random filtering, categorical draw — is ONE
jitted XLA program; the host loop only appends tokens (and applies the
data-dependent duration-based stop, generate.py:207-214).

``sample_scan`` additionally runs a whole fixed-length generation as a
single ``lax.scan`` on device (no host round-trips), used for benchmarks
and batched unconditional generation.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp

from ..models import xl


@dataclasses.dataclass(frozen=True)
class SamplingConfig:
    """Static sampling parameters (hashable, safe for jit closure)."""

    technique: str = "topk"      # topk | nucleus | random ("gumbel" is
                                 # internal: generate_tokens_gumbel's
                                 # clamp-free argmax(l+g) kernel route)
    topk: int = 32
    nucleus_p: float = 0.95
    temperature: float = 0.95
    exclude_bos: bool = True
    num_empty_to_ignore: int = 0  # suppress TIME_SHIFT_100 after N repeats
    empty_token: int = 101        # TIME_SHIFT_100 id

    @classmethod
    def from_cfg(cls, inference_cfg, empty_token: int) -> "SamplingConfig":
        s = inference_cfg.SAMPLING
        technique = s.technique
        topk = 32
        p = 0.95
        if technique == "topk":
            topk = int(s.threshold) if s.threshold else 32
        elif technique == "nucleus":
            p = float(s.threshold) if s.threshold else 0.95
        elif technique == "random":
            pass
        else:
            raise NotImplementedError(
                "Other sampling strategies are yet to be implemented")
        return cls(technique=technique, topk=topk, nucleus_p=p,
                   temperature=float(s.temperature),
                   exclude_bos=bool(inference_cfg.INPUT.exclude_bos_token),
                   num_empty_to_ignore=int(
                       inference_cfg.INPUT.num_empty_tokens_to_ignore),
                   empty_token=empty_token)


NEG = jnp.float32(-1e30)

# Inner-scan length of the two-level decode: the big K/V cache is copied
# once per DECODE_CHUNK tokens instead of every token.
DECODE_CHUNK = 32


def _filter_and_sample(logits, scfg: SamplingConfig, empty_run, rng):
    """Logit surgery + filtering + draw for one [V] logit row
    (reference generate.py:230-303)."""
    l = logits.astype(jnp.float32)
    if scfg.exclude_bos:
        l = l.at[0].set(NEG)
    if scfg.num_empty_to_ignore > 0:
        suppress = empty_run >= scfg.num_empty_to_ignore
        l = jnp.where(
            suppress & (jnp.arange(l.shape[0]) == scfg.empty_token), NEG, l)

    if scfg.temperature == 0:
        return jnp.argmax(l).astype(jnp.int32)

    l = l / scfg.temperature
    probs = jax.nn.softmax(l)

    if scfg.technique == "topk":
        kth = jax.lax.top_k(probs, scfg.topk)[0][-1]
        probs = jnp.where(probs >= kth, probs, 0.0)
    elif scfg.technique == "nucleus":
        sorted_probs = jnp.sort(probs)[::-1]
        csum = jnp.cumsum(sorted_probs)
        # keep tokens while cumulative prob (exclusive) < p, always >= 1
        rank = jnp.argsort(jnp.argsort(-probs))
        keep_sorted = jnp.concatenate(
            [jnp.array([True]), csum[:-1] < scfg.nucleus_p])
        probs = jnp.where(keep_sorted[rank], probs, 0.0)
    elif scfg.technique == "random":
        pass

    return jax.random.categorical(
        rng, jnp.log(jnp.maximum(probs, 1e-38))).astype(jnp.int32)


def make_decode_step(xcfg: xl.XLConfig, scfg: SamplingConfig):
    """(params, mems, token [bsz], empty_run [bsz], rng) ->
    (next_token [bsz], new_mems, new_empty_run). One jitted program.

    Host-loop single stepping (used for the data-dependent duration stop,
    where each step round-trips to the host anyway); the fixed-length fast
    path is the chunked ``sample_scan``."""

    @jax.jit
    def step(params, mems, token, empty_run, rng):
        logits, new_mems = xl.forward_generate(
            params, xcfg, token[None, :], mems, same_length=True)
        rngs = jax.random.split(rng, token.shape[0])
        next_tok = jax.vmap(
            lambda lg, er, r: _filter_and_sample(lg, scfg, er, r)
        )(logits[-1], empty_run, rngs)
        new_empty = jnp.where(next_tok == scfg.empty_token,
                              empty_run + 1, 0)
        return next_tok, new_mems, new_empty

    return step


PRIME_WINDOW = 128


def make_prime_step(xcfg: xl.XLConfig, window: int = PRIME_WINDOW):
    """Batch prefix forward filling the XL memory
    (reference generate.py:189-200).

    Long contexts run as a host loop of <=``window``-token forwards: with
    ``same_length=True`` and window <= mem_len, every token's attended
    set (the mem_len tokens before it) lies inside ring-memory + its own
    window, so chunking composes to exactly the single-shot forward.
    This keeps the attention kernel at its production qlen (128) instead of
    compiling one qlen==context program — a 4146-token debug prime at
    mem 4146 needs a [heads, q, 2*mem] relative-position operand whose
    per-head VMEM window (66 MB bf16) exceeds the chip's VMEM (measured
    compile failure on v5e; chunked, the same check runs fine).

    Returned logits cover ONLY the final chunk: for a T-token context the
    rows are the last ``T % window`` tokens (or the last ``window`` when
    T divides evenly), NOT the full context — indexing them by absolute
    context position is wrong. The returned mems are complete (all T
    tokens absorbed); callers needing only next-token logits read the
    last row, which is exact."""

    @jax.jit
    def prime(params, context, mems):
        logits, new_mems = xl.forward_generate(
            params, xcfg, context, mems, same_length=True)
        return logits, new_mems

    def prime_chunked(params, context, mems):
        # window <= runtime memory length is the exactness condition
        mem_len = (mems.hids.shape[4] if xcfg.cache_kv
                   else mems.hids.shape[1])
        w = max(1, min(window, mem_len))
        T = context.shape[0]
        logits = None
        for s in range(0, T, w):
            logits, mems = prime(params, context[s:s + w], mems)
        return logits, mems

    return prime_chunked


def sample_scan(params, xcfg: xl.XLConfig, scfg: SamplingConfig,
                first_token, mems: xl.XLMems, length: int, rng):
    """Fully on-device generation of ``length`` tokens via lax.scan.

    first_token: [bsz] int32. Returns (tokens [length, bsz], final mems).
    With cache_kv the scan carries an ``xl.DecodeState`` ring (the fast
    path); the returned memory is converted back to ``XLMems`` so callers
    (incl. the CLI debug incremental==batch check) see one layout.
    """

    rngs = jax.random.split(rng, length)
    empty0 = jnp.zeros_like(first_token)

    if xcfg.cache_kv:
        from ..ops import pallas_generate as pgen
        # A chunk may not exceed the memory length: the positional rows
        # cover distances 0..M only, and the staging BD slice / ring
        # merge both assume every in-chunk predecessor is within M.
        C = min(DECODE_CHUNK, length, mems.hids.shape[4])
        bsz = first_token.shape[0]
        if pgen.supports_fused_generate(xcfg, scfg, bsz,
                                        mems.hids.shape[4], C):
            return _sample_scan_fused(params, xcfg, scfg, first_token,
                                      mems, length, rngs, empty0)
        # Two-level chunked decode (see models/xl.py): the big K/V cache is
        # read-only inside each C-token inner scan (XLA never copies it);
        # staging absorbs the per-token writes and is merged once per chunk.
        state0 = xl.decode_state_from_mems(params, xcfg, mems)

        def run_chunk(state, token, empty_run, chunk_rngs, n):
            stage0 = xl.init_decode_stage(xcfg, C, bsz,
                                          dtype=state.kv[0][0].dtype)

            def body(carry, xs):
                token, stage, empty_run = carry
                t, step_rng = xs
                logits, stage = xl.decode_chunk_step(
                    params, xcfg, token, state, stage, t,
                    same_length=True)
                step_rngs = jax.random.split(step_rng, token.shape[0])
                next_tok = jax.vmap(
                    lambda lg, er, r: _filter_and_sample(lg, scfg, er, r)
                )(logits, empty_run, step_rngs)
                new_empty = jnp.where(next_tok == scfg.empty_token,
                                      empty_run + 1, 0)
                return (next_tok, stage, new_empty), next_tok

            xs = (jnp.arange(n, dtype=jnp.int32), chunk_rngs)
            (token, stage, empty_run), toks = jax.lax.scan(
                body, (token, stage0, empty_run), xs)
            return token, stage, empty_run, toks

        n_full, rem = divmod(length, C)
        token, empty_run, state = first_token, empty0, state0
        pieces = []
        if n_full:
            def outer(carry, chunk_rngs):
                token, state, empty_run = carry
                token, stage, empty_run, toks = run_chunk(
                    state, token, empty_run, chunk_rngs, C)
                state = xl.merge_decode_state(xcfg, state, stage, C)
                return (token, state, empty_run), toks

            (token, state, empty_run), toks = jax.lax.scan(
                outer, (token, state, empty_run),
                rngs[:n_full * C].reshape(n_full, C, *rngs.shape[1:]))
            pieces.append(toks.reshape(n_full * C, bsz))
        if rem:
            token, stage, empty_run, toks = run_chunk(
                state, token, empty_run, rngs[n_full * C:], rem)
            state = xl.merge_decode_state(xcfg, state, stage, rem)
            pieces.append(toks)
        tokens = pieces[0] if len(pieces) == 1 else jnp.concatenate(pieces)
        return tokens, xl.mems_from_decode_state(xcfg, state)

    from ..models.xl import positional_embedding
    pos_emb = positional_embedding(
        xcfg, mems.hids.shape[1] + 1).astype(xcfg.cdtype)

    def body(carry, step_rng):
        token, mems, empty_run = carry
        logits, new_mems = xl.forward_generate(
            params, xcfg, token[None, :], mems, same_length=True,
            pos_emb=pos_emb)
        step_rngs = jax.random.split(step_rng, token.shape[0])
        next_tok = jax.vmap(
            lambda lg, er, r: _filter_and_sample(lg, scfg, er, r)
        )(logits[-1], empty_run, step_rngs)
        new_empty = jnp.where(next_tok == scfg.empty_token,
                              empty_run + 1, 0)
        return (next_tok, new_mems, new_empty), next_tok

    (_, final_mems, _), tokens = jax.lax.scan(
        body, (first_token, mems, empty0), rngs)
    return tokens, final_mems


def _sample_scan_fused(params, xcfg: xl.XLConfig, scfg: SamplingConfig,
                       first_token, mems: xl.XLMems, length: int, rngs,
                       empty0):
    """``sample_scan`` on the fused whole-chunk generation kernel
    (ops/pallas_generate.py): per 32-token chunk, ONE kernel launch runs
    the entire forward + logit surgery + top-k categorical draw, with
    the token / empty-run feedback carried in VMEM.

    Exactness vs the jnp path: same chunk/merge structure, same decode
    masks (same_length), and the categorical draw uses the SAME gumbel
    values (``jax.random.gumbel`` on the oracle's per-lane keys —
    exactly what ``jax.random.categorical`` draws internally) applied
    as argmax(z + G) over the kept set, which equals
    ``categorical(log softmax(z) masked)`` because softmax is monotone
    and logsumexp is constant per row."""
    # per-step gumbel noise of the oracle's exact rng stream
    bsz = first_token.shape[0]
    V = xcfg.n_token

    def g_of(step_rng):
        rs = jax.random.split(step_rng, bsz)
        return jax.vmap(
            lambda r: jax.random.gumbel(r, (V,), jnp.float32))(rs)

    g_all = jax.vmap(g_of)(rngs)                      # [length, bsz, V]
    tokens, K, Vb, count = _fused_sample_loop(
        params, xcfg, scfg, first_token, mems, length, g_all, empty0,
        same_length=True)

    h, dh = xcfg.n_head, xcfg.d_head
    M = mems.hids.shape[4]

    def heads(x):  # [b, M, hd] -> [h, b, M, dh]
        return x.reshape(bsz, M, h, dh).transpose(2, 0, 1, 3)

    hids = jnp.stack([
        jnp.stack([heads(K[i]), heads(Vb[i])], axis=0)
        for i in range(xcfg.n_layer)])
    return tokens, xl.XLMems(hids=hids, count=count)


def _fused_sample_loop(params, xcfg: xl.XLConfig, scfg: SamplingConfig,
                       first_token, mems: xl.XLMems, length: int, g_all,
                       empty0, *, same_length: bool):
    """Chunked loop over the fused generation kernel. Returns
    (tokens [length, bsz], K, Vb dense lane buffers, count)."""
    from ..ops import pallas_decode as pdec
    from ..ops import pallas_generate as pgen

    L = xcfg.n_layer
    h, dh = xcfg.n_head, xcfg.d_head
    hd = h * dh
    bsz = first_token.shape[0]
    V = xcfg.n_token
    M = mems.hids.shape[4]
    C = min(DECODE_CHUNK, length, M)     # chunk must fit the ring (<= M)
    P = (-M) % 128                       # front pad -> aligned lanes

    def dense(x):  # [h, b, M, dh] -> [b, M, hd]
        return x.transpose(1, 2, 0, 3).reshape(bsz, M, hd)

    K = jnp.stack([dense(mems.hids[i, 0]) for i in range(L)])
    Vb = jnp.stack([dense(mems.hids[i, 1]) for i in range(L)])
    R = xl.precompute_r_heads(params, xcfg, M + 1).reshape(L, M + 1, hd)
    if P:
        R = jnp.concatenate(
            [jnp.zeros((L, P, hd), R.dtype), R], axis=1)
    stacked = pdec.stack_decode_params(params, xcfg)
    count = mems.count.astype(jnp.int32)
    ids = first_token.astype(jnp.int32)[:, None]
    er = empty0.astype(jnp.int32)[:, None]

    def run_chunk(K, Vb, count, ids, er, g_c, n):
        if P:
            zpad = jnp.zeros((L, bsz, P, hd), K.dtype)
            K_p = jnp.concatenate([zpad, K], axis=2)
            V_p = jnp.concatenate([zpad, Vb], axis=2)
        else:
            K_p, V_p = K, Vb
        return pgen.fused_generate_chunk(stacked, xcfg, scfg, K_p, V_p,
                                         R, ids, er, g_c, count, n,
                                         same_length=same_length)

    n_full, rem = divmod(length, C)
    pieces = []
    if n_full:
        def outer(carry, g_c):
            ids, er, K, Vb, count = carry
            ids, er, toks, sk, sv = run_chunk(K, Vb, count, ids, er,
                                              g_c, C)
            K = jnp.concatenate([K[:, :, C:], sk], axis=2)
            Vb = jnp.concatenate([Vb[:, :, C:], sv], axis=2)
            return (ids, er, K, Vb,
                    jnp.minimum(count + C, M)), toks

        (ids, er, K, Vb, count), toks = jax.lax.scan(
            outer, (ids, er, K, Vb, count),
            g_all[:n_full * C].reshape(n_full, C, bsz, V))
        pieces.append(toks.reshape(n_full * C, bsz))
    if rem:
        ids, er, toks, sk, sv = run_chunk(K, Vb, count, ids, er,
                                          g_all[n_full * C:], rem)
        K = jnp.concatenate([K[:, :, rem:], sk], axis=2)
        Vb = jnp.concatenate([Vb[:, :, rem:], sv], axis=2)
        count = jnp.minimum(count + rem, M)
        pieces.append(toks)
    tokens = pieces[0] if len(pieces) == 1 else jnp.concatenate(pieces)
    return tokens, K, Vb, count


sample_scan_jit = jax.jit(
    sample_scan,
    static_argnames=("xcfg", "scfg", "length"))


@functools.partial(jax.jit, static_argnames=("xcfg", "temperature",
                                             "seq_len"))
def generate_tokens_gumbel(params, xcfg: xl.XLConfig, temperature: float,
                           seq_len: int, first_token, mems: xl.XLMems, rng):
    """Greedy-argmax gumbel generation used by the quality metrics
    (reference generate_tokens, train.py:694-744): tgt_len=1 incremental
    loop with mem_len=seq_len, argmax of the gumbel one-hots.

    With cache_kv this runs on the two-level chunked decode (no per-token
    memory shift); the gumbel draw uses the same [1, bsz, V] key shapes as
    the general path, so both paths sample identical tokens."""

    length = seq_len - 1
    rngs = jax.random.split(rng, length)
    if length <= 0:
        return first_token[None, :]

    if xcfg.cache_kv:
        from ..ops import pallas_generate as pgen
        # chunk must fit the ring (<= M), see sample_scan
        C = min(DECODE_CHUNK, length, mems.hids.shape[4])
        bsz = first_token.shape[0]
        # gumbel-argmax: argmax(l + g) with NO softmax/clamp, for the
        # pre-transformed gumbel g of THIS path's rng stream
        # (gumbel_softmax_st's (1, bsz, V) uniform draws) — the kernel's
        # dedicated "gumbel" technique (the categorical techniques carry
        # the oracle's log(max(p, 1e-38)) floor, which this oracle —
        # forward_generate_gumbel — does not have); same_length=False
        scfg_g = SamplingConfig(technique="gumbel", temperature=1.0,
                                exclude_bos=False, num_empty_to_ignore=0)
        if pgen.supports_fused_generate(xcfg, scfg_g, bsz,
                                        mems.hids.shape[4], C):
            V = xcfg.n_token
            eps = 1e-20

            def g_of(step_rng):
                u = jax.random.uniform(step_rng, (1, bsz, V),
                                       dtype=jnp.float32)[0]
                return -jnp.log(-jnp.log(u + eps) + eps)

            g_all = jax.vmap(g_of)(rngs)
            tokens, _, _, _ = _fused_sample_loop(
                params, xcfg, scfg_g, first_token, mems, length, g_all,
                jnp.zeros_like(first_token), same_length=False)
            return jnp.concatenate([first_token[None, :], tokens],
                                   axis=0)
        state0 = xl.decode_state_from_mems(params, xcfg, mems)

        def run_chunk(state, token, chunk_rngs, n):
            stage0 = xl.init_decode_stage(xcfg, C, bsz,
                                          dtype=state.kv[0][1].dtype)

            def body(carry, xs):
                token, stage = carry
                t, step_rng = xs
                logits, stage = xl.decode_chunk_step(
                    params, xcfg, token, state, stage, t,
                    same_length=False)
                onehot = xl.gumbel_softmax_st(logits[None], temperature,
                                              step_rng)
                next_tok = jnp.argmax(onehot[0], axis=-1).astype(jnp.int32)
                return (next_tok, stage), next_tok

            xs = (jnp.arange(n, dtype=jnp.int32), chunk_rngs)
            (token, stage), toks = jax.lax.scan(body, (token, stage0), xs)
            return token, stage, toks

        n_full, rem = divmod(length, C)
        token, state = first_token, state0
        pieces = []
        if n_full:
            def outer(carry, chunk_rngs):
                token, state = carry
                token, stage, toks = run_chunk(state, token, chunk_rngs, C)
                state = xl.merge_decode_state(xcfg, state, stage, C)
                return (token, state), toks

            (token, state), toks = jax.lax.scan(
                outer, (token, state),
                rngs[:n_full * C].reshape(n_full, C, *rngs.shape[1:]))
            pieces.append(toks.reshape(n_full * C, bsz))
        if rem:
            token, stage, toks = run_chunk(state, token,
                                           rngs[n_full * C:], rem)
            pieces.append(toks)
        tokens = pieces[0] if len(pieces) == 1 else jnp.concatenate(pieces)
        return jnp.concatenate([first_token[None, :], tokens], axis=0)

    def body(carry, step_rng):
        token, mems = carry
        onehot, new_mems = xl.forward_generate_gumbel(
            params, xcfg, token[None, :], temperature, mems, step_rng)
        next_tok = jnp.argmax(onehot[0], axis=-1).astype(jnp.int32)
        return (next_tok, new_mems), next_tok

    (_, final_mems), tokens = jax.lax.scan(body, (first_token, mems), rngs)
    return jnp.concatenate([first_token[None, :], tokens], axis=0)
