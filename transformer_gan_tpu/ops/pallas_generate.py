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
  once per launch; the K/V cache streams per (token, layer) — the
  physical floor),
* the staged-K/V ring in the output refs and the sampled-token /
  empty-run-counter feedback in VMEM scratch (nothing leaves the chip
  between tokens),
* sampling WITHOUT softmax/log/exp: ``jax.random.categorical(log p, G)
  == argmax(z + G)`` for ``z = logits/T`` (softmax is monotone and
  logsumexp is a per-row constant), and the top-k keep-set
  ``probs >= kth_largest(probs)`` equals ``z >= kth_largest(z)`` — so
  the kernel applies the surgeries (BOS exclusion, repeated-
  TIME_SHIFT_100 suppression) on the logits, finds the k-th largest
  via a tie-aware select loop, and draws by ``argmax(keep ? z + G :
  -inf)`` with the PRE-DRAWN gumbel noise G of the oracle's exact rng
  stream (XLA computes ``jax.random.gumbel`` per step key, the same
  values ``jax.random.categorical`` would draw).

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

INTERPRET = False

_MAX_CHUNK = 32
_ROLL_BITS = (1, 2, 4, 8, 16)

_VMEM_LIMIT = 100 * 1024 * 1024

_NEG = -1e30                     # python literal: jnp module-level
                                 # constants get captured as tracers

# True: weights + positional projections as full resident operands read
# with the traced layer index (fetched once per launch); False: per-l
# index-map blocks (proven pattern, refetched per (t, l)). See
# pallas_decode.RESIDENT.
RESIDENT = True


def _ln(x, scale_row, bias_row, eps):
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    return (y * scale_row.astype(jnp.float32)
            + bias_row.astype(jnp.float32)).astype(x.dtype)


def _roll_lanes(x, t):
    for bit in _ROLL_BITS:
        rolled = pltpu.roll(x, bit, 2)
        x = jnp.where((t & bit) != 0, rolled, x)
    return x


def _dot(a, b):
    return jnp.dot(a, b, preferred_element_type=jnp.float32)


def _bdot(a, b):
    return jax.lax.dot_general(a, b, (((2,), (2,)), ((0,), (0,))),
                               preferred_element_type=jnp.float32)


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
                num_empty, empty_token, same_length, resident):
    t = pl.program_id(0)
    li = pl.program_id(1)
    count = sc_ref[0]
    wl = li if resident else 0

    @pl.when(jnp.logical_and(t == 0, li == 0))
    def _():
        ids_s[:] = ids0_ref[:]
        er_s[:] = er0_ref[:]

    @pl.when(t == 0)
    def _():
        sk_out[li] = jnp.zeros((B, C, HD), cdtype)
        sv_out[li] = jnp.zeros((B, C, HD), cdtype)

    # ---- embed previous token ----
    @pl.when(li == 0)
    def _():
        lane = jax.lax.broadcasted_iota(jnp.int32, (B, V), 1)
        oh = (lane == ids_s[:]).astype(cdtype)
        x_ref[:] = _dot(oh, embw_ref[:]).astype(cdtype)

    x = x_ref[:]                                               # [B, HD]
    if pre_lnorm:
        w_in = _ln(x, lnas_ref[wl], lnab_ref[wl], eps_ln)
    else:
        w_in = x

    q = _dot(w_in, qw_ref[wl]).astype(cdtype)                  # [B, HD]
    k = _dot(w_in, kw_ref[wl]).astype(cdtype)
    v = _dot(w_in, vw_ref[wl]).astype(cdtype)

    srow = jax.lax.broadcasted_iota(jnp.int32, (C, HD), 0)
    tmp_ref[:] = k
    for b in range(B):
        sk_out[li, b] = jnp.where(
            srow == t, jnp.broadcast_to(tmp_ref[b:b + 1, :], (C, HD)),
            sk_out[li, b])
    tmp_ref[:] = v
    for b in range(B):
        sv_out[li, b] = jnp.where(
            srow == t, jnp.broadcast_to(tmp_ref[b:b + 1, :], (C, HD)),
            sv_out[li, b])
    sk_new = sk_out[li]                                        # [B,C,HD]
    sv_new = sv_out[li]

    mh = mh_ref[:].astype(cdtype)                              # [H, HD]
    tmp_ref[:] = q + rwb_ref[:].astype(cdtype)
    for b in range(B):
        qhw_ref[b] = tmp_ref[b:b + 1, :] * mh
    tmp_ref[:] = q + rrb_ref[:].astype(cdtype)
    for b in range(B):
        qhr_ref[b] = tmp_ref[b:b + 1, :] * mh
    qHw = qhw_ref[:]                                           # [B,H,HD]
    qHr = qhr_ref[:]

    ac_big = _bdot(qHw, k_ref[0]).astype(cdtype)               # [B,H,M]
    ac_st = _bdot(qHw, sk_new).astype(cdtype)                  # [B,H,C]
    bd_rev = jax.lax.dot_general(
        qHr, r_ref[wl], (((2,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)                    # [B,H,M+1]
    H = mh.shape[0]
    bd_pad = (jnp.concatenate(
        [bd_rev, jnp.zeros((B, H, C - 1), jnp.float32)],
        axis=-1) if C > 1 else bd_rev)                         # [B,H,M+C]
    bd_cat = _roll_lanes(bd_pad, t)

    score = (jnp.concatenate([ac_big, ac_st], axis=-1)
                 .astype(jnp.float32)
             + bd_cat) * scale                                 # [B,H,KL]
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

    vcat = jnp.concatenate([v_ref[0], sv_new], axis=1)         # [B,KL,HD]
    ctx_h = jax.lax.dot_general(
        p, vcat, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)                    # [B,H,HD]
    ctx = jnp.sum(ctx_h * mh[None].astype(jnp.float32),
                  axis=1).astype(cdtype)                       # [B, HD]

    attn = _dot(ctx, ow_ref[wl]).astype(cdtype)
    if pre_lnorm:
        out = x + attn
        ff_in = _ln(out, lnfs_ref[wl], lnfb_ref[wl], eps_ln)
    else:
        out = _ln(x + attn, lnas_ref[wl], lnab_ref[wl], eps_ln)
        ff_in = out
    ff = jax.nn.relu(_dot(ff_in, ff1_ref[wl]).astype(cdtype)
                     + fb1_ref[wl].astype(cdtype))
    ff = _dot(ff, ff2_ref[wl]).astype(cdtype) + fb2_ref[wl].astype(cdtype)
    if pre_lnorm:
        x_new = out + ff
    else:
        x_new = _ln(out + ff, lnfs_ref[wl], lnfb_ref[wl], eps_ln)
    x_ref[:] = x_new.astype(cdtype)

    # ---- logits + surgery + top-k threshold + categorical ----
    @pl.when(li == L - 1)
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
        else:
            z = l / temperature
            if technique == "topk" and topk < V:
                # k-th largest via a tie-aware select loop: mask ONE
                # occurrence of the current max per iteration (top_k
                # counts duplicates separately)
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


def supports_fused_generate(cfg, scfg, bsz: int, M: int, C: int) -> bool:
    """Gate: topk/random/argmax sampling, small batch, staged chunk.

    M needs no alignment: the caller front-pads the K/V lane buffers to
    a multiple of 128 with always-masked slots (ring validity lives at
    the buffer tail, so front padding only widens the masked region —
    the distance algebra is unchanged). Nucleus keeps the jnp path (its
    tie-breaking runs through a full sort)."""
    return (cfg.cache_kv and cfg.use_pallas
            and scfg.technique in ("topk", "random")
            and 1 <= bsz <= 32
            and C <= _MAX_CHUNK
            and not cfg.append_note_status)


@functools.lru_cache(maxsize=None)
def _make_gen_call(T, L, B, M, C, V, HD, DI, H, pre_lnorm, cdtype,
                   eps_ln, scale, technique, topk, temperature,
                   exclude_bos, num_empty, empty_token, same_length,
                   resident, interpret):
    cdtype = jnp.dtype(cdtype).type
    kernel = functools.partial(
        _gen_kernel, T=T, L=L, NB=1, B=B, M=M, C=C, V=V, HD=HD,
        pre_lnorm=pre_lnorm, cdtype=cdtype, eps_ln=eps_ln, scale=scale,
        technique=technique, topk=topk, temperature=temperature,
        exclude_bos=exclude_bos, num_empty=num_empty,
        empty_token=empty_token, same_length=same_length,
        resident=resident)

    def full(shape):
        return pl.BlockSpec(shape, lambda t, l, *_: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    def per_t(shape):
        return pl.BlockSpec((1,) + shape,
                            lambda t, l, *_: (t,) + (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    def per_l(shape):
        return pl.BlockSpec((1,) + shape,
                            lambda t, l, *_: (l,) + (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    def wspec(shape):
        # shape given WITHOUT the leading L; resident mode prepends it
        return (full((L,) + shape) if resident else per_l(shape))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(T, L),
        in_specs=[
            full((B, 1)),            # seed ids
            full((B, 1)),            # seed empty-run counters
            per_t((B, V)),           # gumbel noise per step
            per_l((B, M, HD)),       # K big (streamed per (t, l))
            per_l((B, M, HD)),       # V big
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
            vmem_limit_bytes=_VMEM_LIMIT),
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
    call = _make_gen_call(
        n, L, B, M, max(n, 1), V, HD, cfg.d_inner, cfg.n_head,
        bool(cfg.pre_lnorm), jnp.dtype(cfg.cdtype).name, 1e-5,
        1.0 / (cfg.d_head ** 0.5),
        scfg.technique, int(scfg.topk), float(scfg.temperature),
        bool(scfg.exclude_bos), int(scfg.num_empty_to_ignore),
        int(scfg.empty_token), bool(same_length), RESIDENT, INTERPRET)
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
