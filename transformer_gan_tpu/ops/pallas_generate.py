"""Fused whole-chunk generation decode: the inference sampling loop
(infer/sample.py sample_scan) inside one ``pallas_call`` per 32-token
chunk.

The reference inference hot loop (model/generate.py:177-304) ran one
python-level model forward per token; our jnp chunked decode already
collapses that to ~80 XLA ops per token, but at the unconditional
op-point (mem 4146, single stream) the measured 169us/token is ~2.7x
the 62us HBM floor of reading the K/V cache once per token — the rest
is per-op issue latency. This kernel removes it: per chunk, ONE launch
runs embed -> all layers -> logits -> logit surgery -> top-k threshold
-> categorical draw -> feedback, with

* weights and the positional projections RESIDENT in VMEM (fetched
  once per launch), and — when the whole [L, B, M, HD] pair fits the
  raised VMEM budget (single stream at the unconditional op-point
  does) — the K/V cache itself resident too: the cache is read-only
  within a chunk, so ONE fetch serves all T tokens instead of
  re-streaming 50.7 MB per (token, layer) grid step (which was the
  measured 108 us/token bandwidth bound); wider batches fall back to
  per-(t, l) streaming,
* the staged-K/V ring in the output refs and the sampled-token /
  empty-run-counter feedback in VMEM scratch (nothing leaves the chip
  between tokens),
* sampling with the ORACLE'S FORMULAS verbatim: after the logit
  surgeries (BOS exclusion, repeated-TIME_SHIFT_100 suppression), the
  kernel computes ``p = softmax(logits/T)``, thresholds top-k in PROB
  space via a tie-aware k-th-largest select loop, floors at
  ``log(max(p, 1e-38))``, and draws by ``argmax(logp + G)`` with the
  PRE-DRAWN gumbel noise G of the oracle's exact rng stream (XLA
  computes ``jax.random.gumbel`` per step key, the same values
  ``jax.random.categorical`` would draw). Prob-space (not z-space)
  thresholding matters: at low temperature probs underflow to 0.0 and
  the oracle's 1e-38 floor lets sub-threshold lanes win gumbel ties.

Techniques: topk / random / temperature-0 argmax. Nucleus keeps the
jnp path (its tie-breaking runs through a full sort).

Oracle: infer/sample.py ``sample_scan`` (id-for-id in interpret mode,
tests/test_generate_kernel.py).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ._pallas_common import VMEM_LIMIT as _VMEM_LIMIT
from ._pallas_common import bdot as _bdot
from ._pallas_common import dot as _dot
from ._pallas_common import ln as _ln
from ._pallas_common import roll_lanes

INTERPRET = False

_MAX_CHUNK = 32

_NEG = -1e30                     # python literal: jnp module-level
                                 # constants get captured as tracers

# True: weights + positional projections as full resident operands read
# with the traced layer index (fetched once per launch); False: per-l
# index-map blocks (proven pattern, refetched per (t, l)). See
# pallas_decode.RESIDENT.
RESIDENT = True

# Resident K/V: when the whole [L, B, M, HD] K/V pair fits the raised
# budget, it sits in VMEM for the launch — the per-token HBM traffic
# drops from the full cache (50.7 MB at the unconditional op-point,
# the measured 108 us/token bandwidth bound) to ~nothing; the cache is
# read-only within a chunk, so one fetch serves all T tokens. The
# raised limit is still under v5e's 128 MiB physical VMEM; the
# streamed path remains the fallback (and the equivalence oracle).
_GEN_RES_VMEM_LIMIT = 120 * 1024 * 1024
_KV_RES_BUDGET = _GEN_RES_VMEM_LIMIT - 10 * 1024 * 1024

# Unroll the layers into ONE grid step per token (requires every
# operand resident). MEASURED NEGATIVE on chip (2026-08-20, mem 4146
# B=1): 91 us/token unrolled vs 87 rolled — the (T, L) grid steps
# pipeline, so their bookkeeping is already hidden; the 58 us/token
# M-independent floor (measured at mem 128) is real per-layer VPU work
# (staging where-writes, LNs, per-row head ops), not grid overhead.
# Kept as an equivalence-tested variant; default off.
UNROLL_LAYERS = False

# Categorical-draw epilogue variant. True: the oracle's formulas
# verbatim (softmax -> prob-space top-k -> log(max(p, 1e-38)) floor) —
# exact in the low-temperature softmax-underflow regime. False: the
# z-space formulation (top-k threshold and gumbel-argmax directly on
# z = logits/T, exclusion at -1e30) — equivalent while softmax is
# injective (it is at practical temperatures; measured 100% id
# agreement on chip), kept as a fallback should the transcendental
# epilogue regress a given toolchain. See PERF.md.
ORACLE_EXACT = True


def _roll_lanes(x, t):
    """Chunk-local lane roll: t < _MAX_CHUNK (see _pallas_common)."""
    return roll_lanes(x, t, max_amount=_MAX_CHUNK)


def _gen_kernel(sc_ref, ids0_ref, er0_ref, g_ref,
                k_ref, v_ref, r_ref,
                qw_ref, kw_ref, vw_ref, ow_ref,
                ff1_ref, fb1_ref, ff2_ref, fb2_ref,
                lnas_ref, lnab_ref, lnfs_ref, lnfb_ref,
                rwb_ref, rrb_ref, mh_ref, embw_ref, embt_ref, cb_ref,
                ids_out, er_out, tok_out, sk_out, sv_out,
                x_ref, tmp_ref, qhw_ref, qhr_ref, ids_s, er_s, *,
                T, L, NB, B, M, C, V, HD, pre_lnorm, cdtype, eps_ln,
                scale, technique, topk, temperature, exclude_bos,
                num_empty, empty_token, same_length, resident,
                kv_resident, unroll, oracle_exact):
    t = pl.program_id(0)
    count = sc_ref[0]

    # ---- embed previous token ----
    def embed():
        lane = jax.lax.broadcasted_iota(jnp.int32, (B, V), 1)
        oh = (lane == ids_s[:]).astype(cdtype)
        x_ref[:] = _dot(oh, embw_ref[:]).astype(cdtype)

    def layer(li, wl, kvl):
        # one decoder layer; wl indexes the (resident) weight refs, kvl
        # the K/V refs. kv_resident: the whole [L, B, M, HD] K/V pair
        # sits in VMEM for the launch (fetched ONCE per chunk instead of
        # per (t, l) grid step — traced-leading-index reads, same
        # pattern as pallas_chain_bwd's resident K/V); otherwise the
        # per-layer block streams from HBM.
        x = x_ref[:]                                           # [B, HD]
        if pre_lnorm:
            w_in = _ln(x, lnas_ref[wl], lnab_ref[wl], eps_ln)
        else:
            w_in = x

        q = _dot(w_in, qw_ref[wl]).astype(cdtype)              # [B, HD]
        k = _dot(w_in, kw_ref[wl]).astype(cdtype)
        v = _dot(w_in, vw_ref[wl]).astype(cdtype)

        srow = jax.lax.broadcasted_iota(jnp.int32, (C, HD), 0)
        tmp_ref[:] = k
        for b in range(B):
            sk_out[li, b] = jnp.where(
                srow == t,
                jnp.broadcast_to(tmp_ref[b:b + 1, :], (C, HD)),
                sk_out[li, b])
        tmp_ref[:] = v
        for b in range(B):
            sv_out[li, b] = jnp.where(
                srow == t,
                jnp.broadcast_to(tmp_ref[b:b + 1, :], (C, HD)),
                sv_out[li, b])
        sk_new = sk_out[li]                                    # [B,C,HD]
        sv_new = sv_out[li]

        mh = mh_ref[:].astype(cdtype)                          # [H, HD]
        tmp_ref[:] = q + rwb_ref[:].astype(cdtype)
        for b in range(B):
            qhw_ref[b] = tmp_ref[b:b + 1, :] * mh
        tmp_ref[:] = q + rrb_ref[:].astype(cdtype)
        for b in range(B):
            qhr_ref[b] = tmp_ref[b:b + 1, :] * mh
        qHw = qhw_ref[:]                                       # [B,H,HD]
        qHr = qhr_ref[:]

        ac_big = _bdot(qHw, k_ref[kvl]).astype(cdtype)         # [B,H,M]
        ac_st = _bdot(qHw, sk_new).astype(cdtype)              # [B,H,C]
        bd_rev = jax.lax.dot_general(
            qHr, r_ref[wl], (((2,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)                # [B,H,M+1]
        H = mh.shape[0]
        bd_pad = (jnp.concatenate(
            [bd_rev, jnp.zeros((B, H, C - 1), jnp.float32)],
            axis=-1) if C > 1 else bd_rev)                     # [B,H,M+C]
        bd_cat = _roll_lanes(bd_pad, t)

        score = (jnp.concatenate([ac_big, ac_st], axis=-1)
                     .astype(jnp.float32)
                 + bd_cat) * scale                             # [B,H,KL]
        lane = jax.lax.broadcasted_iota(jnp.int32, (B, H, M + C), 2)
        # decode mask (decode_chunk_step): big lanes j < max(M - count,
        # t + sl) with sl = 1 under same_length; staged lanes s > t
        sl = 1 if same_length else 0
        masked = (((lane < M) & (lane < jnp.maximum(M - count, t + sl)))
                  | ((lane >= M) & (lane > M + t)))
        neg = jnp.asarray(jnp.finfo(jnp.float32).min, jnp.float32)
        score = jnp.where(masked, neg, score)
        mx = jnp.max(score, axis=-1, keepdims=True)
        e = jnp.exp(score - mx)
        p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(cdtype)

        vcat = jnp.concatenate([v_ref[kvl], sv_new], axis=1)   # [B,KL,HD]
        ctx_h = jax.lax.dot_general(
            p, vcat, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)                # [B,H,HD]
        ctx = jnp.sum(ctx_h * mh[None].astype(jnp.float32),
                      axis=1).astype(cdtype)                   # [B, HD]

        attn = _dot(ctx, ow_ref[wl]).astype(cdtype)
        if pre_lnorm:
            out = x + attn
            ff_in = _ln(out, lnfs_ref[wl], lnfb_ref[wl], eps_ln)
        else:
            out = _ln(x + attn, lnas_ref[wl], lnab_ref[wl], eps_ln)
            ff_in = out
        ff = jax.nn.relu(_dot(ff_in, ff1_ref[wl]).astype(cdtype)
                         + fb1_ref[wl].astype(cdtype))
        ff = (_dot(ff, ff2_ref[wl]).astype(cdtype)
              + fb2_ref[wl].astype(cdtype))
        if pre_lnorm:
            x_new = out + ff
        else:
            x_new = _ln(out + ff, lnfs_ref[wl], lnfb_ref[wl], eps_ln)
        x_ref[:] = x_new.astype(cdtype)

    if unroll:
        # one grid step per token, all layers inline (requires every
        # operand resident). Measured NEGATIVE vs the rolled grid —
        # see UNROLL_LAYERS; kept as an equivalence-tested variant.
        @pl.when(t == 0)
        def _():
            ids_s[:] = ids0_ref[:]
            er_s[:] = er0_ref[:]
            for li in range(L):
                sk_out[li] = jnp.zeros((B, C, HD), cdtype)
                sv_out[li] = jnp.zeros((B, C, HD), cdtype)

        embed()
        for li in range(L):
            layer(li, li, li)
        run_epilogue = lambda fn: fn()
    else:
        li = pl.program_id(1)

        @pl.when(jnp.logical_and(t == 0, li == 0))
        def _():
            ids_s[:] = ids0_ref[:]
            er_s[:] = er0_ref[:]

        @pl.when(t == 0)
        def _():
            sk_out[li] = jnp.zeros((B, C, HD), cdtype)
            sv_out[li] = jnp.zeros((B, C, HD), cdtype)

        pl.when(li == 0)(embed)
        layer(li, li if resident else 0, li if kv_resident else 0)
        run_epilogue = pl.when(li == L - 1)

    # ---- logits + surgery + top-k threshold + categorical ----
    @run_epilogue
    def _():
        xf = x_ref[:].astype(cdtype)                           # [B, HD]
        l = (_dot(xf, embt_ref[:]).astype(cdtype)
             + cb_ref[:].astype(cdtype)).astype(jnp.float32)   # [B, V]
        vlane = jax.lax.broadcasted_iota(jnp.int32, (B, V), 1)
        if exclude_bos:
            l = jnp.where(vlane == 0, _NEG, l)
        if num_empty > 0:
            suppress = er_s[:] >= num_empty                    # [B, 1]
            l = jnp.where(suppress & (vlane == empty_token), _NEG, l)

        if temperature == 0:
            lmax = jnp.max(l, axis=-1, keepdims=True)
            idx = jnp.min(jnp.where(l == lmax, vlane, V), axis=-1,
                          keepdims=True)
        elif technique == "gumbel":
            # gumbel-argmax oracle (forward_generate_gumbel /
            # generate_tokens_gumbel): argmax(z + g) with NO softmax and
            # NO prob floor — distinct from the categorical oracle below,
            # whose log(max(p, 1e-38)) clamp compresses deep tails
            zk = l / temperature + g_ref[0]
            zmax = jnp.max(zk, axis=-1, keepdims=True)
            idx = jnp.min(jnp.where(zk == zmax, vlane, V), axis=-1,
                          keepdims=True)
        elif oracle_exact:
            # The oracle's formulas VERBATIM (infer/sample.py
            # _filter_and_sample): softmax -> top-k threshold in PROB
            # space -> log(max(p, 1e-38)) floor -> +gumbel argmax.
            # Thresholding in z space is equivalent only while softmax
            # is injective: at low temperature probs underflow to 0.0,
            # the oracle's kth collapses to 0.0 (keeping every lane at
            # the -87.5 floor where gumbel noise can still win) — a
            # z-space exclusion at -1e30 diverges there.
            z = l / temperature
            zmx = jnp.max(z, axis=-1, keepdims=True)
            ez = jnp.exp(z - zmx)
            p = ez / jnp.sum(ez, axis=-1, keepdims=True)
            if technique == "topk" and topk < V:
                # k-th largest via a tie-aware select loop: mask ONE
                # occurrence of the current max per iteration (top_k
                # counts duplicates separately)
                cur = p
                for _i in range(topk - 1):
                    m = jnp.max(cur, axis=-1, keepdims=True)
                    first = jnp.min(jnp.where(cur == m, vlane, V),
                                    axis=-1, keepdims=True)
                    cur = jnp.where(vlane == first, -1.0, cur)
                kth = jnp.max(cur, axis=-1, keepdims=True)
                p = jnp.where(p >= kth, p, 0.0)
            zk = jnp.log(jnp.maximum(p, 1e-38)) + g_ref[0]
            zmax = jnp.max(zk, axis=-1, keepdims=True)
            idx = jnp.min(jnp.where(zk == zmax, vlane, V), axis=-1,
                          keepdims=True)
        else:
            # z-space fallback (see ORACLE_EXACT): categorical(log p, G)
            # == argmax(z + G) while softmax is injective, and the
            # prob-space keep-set equals the z-space keep-set there
            z = l / temperature
            if technique == "topk" and topk < V:
                cur = z
                for _i in range(topk - 1):
                    m = jnp.max(cur, axis=-1, keepdims=True)
                    first = jnp.min(jnp.where(cur == m, vlane, V),
                                    axis=-1, keepdims=True)
                    cur = jnp.where(vlane == first, _NEG, cur)
                kth = jnp.max(cur, axis=-1, keepdims=True)
                zk = jnp.where(z >= kth, z + g_ref[0], _NEG)
            else:
                zk = z + g_ref[0]
            zmax = jnp.max(zk, axis=-1, keepdims=True)
            idx = jnp.min(jnp.where(zk == zmax, vlane, V), axis=-1,
                          keepdims=True)

        ids_s[:] = idx
        er_s[:] = jnp.where(idx == empty_token, er_s[:] + 1, 0)
        tok_out[0] = idx
        ids_out[:] = idx
        er_out[:] = er_s[:]


def generate_vmem_bytes(cfg, bsz: int, M: int, C: int,
                        kv_resident: bool = False) -> int:
    """Rough VMEM footprint of the generation kernel: K/V either as
    double-buffered per-(t,l) stream blocks or (``kv_resident``) the
    whole single-buffered [L, B, M, HD] pair, + resident
    weights/R/embedding + the staged rings and per-step gumbel rows
    (mirrors the BlockSpecs in _make_gen_call; companion of
    pallas_decode.decode_chunk_vmem_bytes)."""
    L, HD, DI, V = (cfg.n_layer, cfg.n_head * cfg.d_head, cfg.d_inner,
                    cfg.n_token)
    bpe = 2 if jnp.dtype(cfg.cdtype).itemsize == 2 else 4
    if kv_resident:
        kv = 2 * L * bsz * M * HD * bpe           # whole pair, one fetch
    else:
        kv = 2 * 2 * bsz * M * HD * bpe           # K+V, double-buffered
    weights = L * (4 * HD * HD + 2 * HD * DI) * bpe
    r = L * (M + 1) * HD * bpe
    emb = 2 * V * HD * bpe
    staging = 2 * L * bsz * C * HD * bpe
    g = 2 * bsz * V * 4                            # per-t, double-buffered
    scratch = (2 * bsz * HD + 2 * bsz * cfg.n_head * HD) * bpe
    return kv + weights + r + emb + staging + g + scratch


def supports_fused_generate(cfg, scfg, bsz: int, M: int, C: int) -> bool:
    """Gate: topk/random/argmax sampling, small batch, staged chunk,
    and the kernel's operands must fit VMEM with headroom (otherwise the
    Mosaic compile fails where the jnp chunked decode would have worked).

    M needs no alignment: the caller front-pads the K/V lane buffers to
    a multiple of 128 with always-masked slots (ring validity lives at
    the buffer tail, so front padding only widens the masked region —
    the distance algebra is unchanged). Nucleus keeps the jnp path (its
    tie-breaking runs through a full sort)."""
    return (cfg.cache_kv and cfg.use_pallas
            and scfg.technique in ("topk", "random", "gumbel")
            and 1 <= bsz <= 32
            and C <= _MAX_CHUNK
            and not cfg.append_note_status
            and generate_vmem_bytes(cfg, bsz, M, C)
            < int(_VMEM_LIMIT * 0.85))


def supports_kv_resident(cfg, scfg, bsz: int, M: int, C: int) -> bool:
    """True when the fused path would run with the whole K/V pair
    resident in VMEM (one fetch per chunk) at this op-point. Measured
    strictly faster than any wider streamed/jnp wave (87 vs 205+
    us/step at mem 4146 — PERF.md), so the generate CLI prefers the
    largest kv-resident-capable lane count over a wider streamed one.
    Uses the lane-padded M the kernel will actually see."""
    Mp = M + (-M) % 128
    return (supports_fused_generate(cfg, scfg, bsz, M, C)
            and RESIDENT
            and generate_vmem_bytes(cfg, bsz, Mp, C, kv_resident=True)
            < _KV_RES_BUDGET)


@functools.lru_cache(maxsize=None)
def _make_gen_call(T, L, B, M, C, V, HD, DI, H, pre_lnorm, cdtype,
                   eps_ln, scale, technique, topk, temperature,
                   exclude_bos, num_empty, empty_token, same_length,
                   resident, kv_resident, unroll, oracle_exact,
                   interpret):
    if unroll:
        # one grid step per token needs every operand resident
        assert resident and kv_resident
    cdtype = jnp.dtype(cdtype).type
    kernel = functools.partial(
        _gen_kernel, T=T, L=L, NB=1, B=B, M=M, C=C, V=V, HD=HD,
        pre_lnorm=pre_lnorm, cdtype=cdtype, eps_ln=eps_ln, scale=scale,
        technique=technique, topk=topk, temperature=temperature,
        exclude_bos=exclude_bos, num_empty=num_empty,
        empty_token=empty_token, same_length=same_length,
        resident=resident, kv_resident=kv_resident, unroll=unroll,
        oracle_exact=oracle_exact)

    # index maps take (*grid_indices, scalar_ref): rank-agnostic lambdas
    # serve both the (T, L) grid and the unrolled (T,) grid
    def full(shape):
        return pl.BlockSpec(shape, lambda *_: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    def per_t(shape):
        return pl.BlockSpec((1,) + shape,
                            lambda t, *_: (t,) + (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    def per_l(shape):
        assert not unroll
        return pl.BlockSpec((1,) + shape,
                            lambda t, l, *_: (l,) + (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    def wspec(shape):
        # shape given WITHOUT the leading L; resident mode prepends it
        return (full((L,) + shape) if resident else per_l(shape))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(T,) if unroll else (T, L),
        in_specs=[
            full((B, 1)),            # seed ids
            full((B, 1)),            # seed empty-run counters
            per_t((B, V)),           # gumbel noise per step
            (full((L, B, M, HD)) if kv_resident
             else per_l((B, M, HD))),  # K big (resident or per-(t,l))
            (full((L, B, M, HD)) if kv_resident
             else per_l((B, M, HD))),  # V big
            wspec((M + 1, HD)),      # R positional projections
            wspec((HD, HD)),         # q_w
            wspec((HD, HD)),         # k_w
            wspec((HD, HD)),         # v_w
            wspec((HD, HD)),         # o_w
            wspec((HD, DI)),         # ff_w1
            wspec((1, DI)),          # ff_b1
            wspec((DI, HD)),         # ff_w2
            wspec((1, HD)),          # ff_b2
            wspec((1, HD)),          # attn_ln_scale
            wspec((1, HD)),          # attn_ln_bias
            wspec((1, HD)),          # ff_ln_scale
            wspec((1, HD)),          # ff_ln_bias
            full((1, HD)),           # r_w_bias
            full((1, HD)),           # r_r_bias
            full((H, HD)),           # head mask
            full((V, HD)),           # word_emb * sqrt(d)
            full((HD, V)),           # word_emb^T
            full((1, V)),            # crit_bias
        ],
        out_specs=[
            full((B, 1)),            # final ids
            full((B, 1)),            # final empty-run counters
            per_t((B, 1)),           # sampled token per step
            full((L, B, C, HD)),     # staged K ring
            full((L, B, C, HD)),     # staged V ring
        ],
        scratch_shapes=[pltpu.VMEM((B, HD), cdtype),
                        pltpu.VMEM((B, HD), cdtype),
                        pltpu.VMEM((B, H, HD), cdtype),
                        pltpu.VMEM((B, H, HD), cdtype),
                        pltpu.VMEM((B, 1), jnp.int32),
                        pltpu.VMEM((B, 1), jnp.int32)],
    )
    out_shape = [
        jax.ShapeDtypeStruct((B, 1), jnp.int32),
        jax.ShapeDtypeStruct((B, 1), jnp.int32),
        jax.ShapeDtypeStruct((T, B, 1), jnp.int32),
        jax.ShapeDtypeStruct((L, B, C, HD), cdtype),
        jax.ShapeDtypeStruct((L, B, C, HD), cdtype),
    ]
    return pl.pallas_call(
        kernel, grid_spec=grid_spec, out_shape=out_shape,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=(_GEN_RES_VMEM_LIMIT if kv_resident
                              else _VMEM_LIMIT)),
    )


def fused_generate_chunk(stacked, cfg, scfg, K, Vb, R, ids, er, g,
                         count, n: int, same_length: bool = True):
    """Sample ``n`` tokens in one launch.

    K/Vb [L, B, M, HD]; R [L, M+1, HD]; ids/er [B, 1] int32;
    g [n, B, V] fp32 gumbel noise (jax.random.gumbel per step key —
    exactly what jax.random.categorical would draw). Returns
    (ids', er', tokens [n, B], sk [L, B, n, HD], sv likewise).
    """
    L, B, M, HD = K.shape
    V = g.shape[2]
    kv_resident = (RESIDENT and generate_vmem_bytes(
        cfg, B, M, max(n, 1), kv_resident=True) < _KV_RES_BUDGET)
    unroll = kv_resident and UNROLL_LAYERS
    call = _make_gen_call(
        n, L, B, M, max(n, 1), V, HD, cfg.d_inner, cfg.n_head,
        bool(cfg.pre_lnorm), jnp.dtype(cfg.cdtype).name, 1e-5,
        1.0 / (cfg.d_head ** 0.5),
        scfg.technique, int(scfg.topk), float(scfg.temperature),
        bool(scfg.exclude_bos), int(scfg.num_empty_to_ignore),
        int(scfg.empty_token), bool(same_length), RESIDENT, kv_resident,
        unroll, ORACLE_EXACT, INTERPRET)
    sc = jnp.asarray([count], jnp.int32)
    ids_f, er_f, toks, sk, sv = call(
        sc, ids, er, g,
        K, Vb, R,
        stacked["q_w"], stacked["k_w"], stacked["v_w"],
        stacked["o_w"], stacked["ff1"], stacked["fb1"],
        stacked["ff2"], stacked["fb2"],
        stacked["ln_as"], stacked["ln_ab"],
        stacked["ln_fs"], stacked["ln_fb"],
        stacked["rwb"], stacked["rrb"], stacked["mask_h"],
        stacked["emb_scaled"], stacked["emb_t"],
        stacked["crit_bias"])
    return ids_f, er_f, toks[..., 0], sk, sv
