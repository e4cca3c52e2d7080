"""Fully-fused XL attention kernels: position term computed in-kernel.

v1 (pallas_attention.py) precomputes the relative-position score term BD
in XLA (einsum + pad-reshape rel-shift) — measured at ~48% of the training
step (score-sized HBM tensors). v2 moves it into the kernel using the
identity

    BD[i, j] = W[i, (q-1-i) + j],   W = q_rr @ R^T

where R is the per-head projected positional embedding zero-padded with q
rows (distance of column c is klen-1-c, so the pad-reshape "rel-shift" is
just a per-row window into the SAME matmul the unshifted term uses). The
per-row window is extracted with 8-row blocks x 8 static lane-shifted
slices — pure VMEM traffic. Nothing score-sized ever touches HBM, forward
or backward.

Grid is (head, batch) — batch innermost so the backward's dR accumulator
block stays resident in VMEM across the batch sweep (standard revisited-
output accumulation).

Requires qlen % 8 == 0 (callers fall back to v1/jnp otherwise).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_attention import NEG, _mask_block

INTERPRET = False

# Run shift stages at bf16 width on TPU (halved roll bandwidth); tests on
# CPU keep f32 for exactness vs the f32 jnp oracle.
_FAST_BF16_SHIFT = [True]

_ROWS = 8  # q-block height for the shift extraction (sublane tile)


def _row_shift(x, qlen, left: bool, out_bf16: bool = False):
    """Shift row i of x by t(i) = qlen-1-i lanes (left or right), circular.

    Binary decomposition: stage k rolls by 2^k and keeps the rolled value
    for rows whose shift has bit k set — log2(qlen) uniform ``pltpu.roll``s
    + per-row selects (Mosaic-friendly; no unaligned slicing).

    With ``out_bf16`` the even-bit stages run on the array bitcast to
    int32 lane pairs (rolling the pair array by k == rolling bf16 lanes by
    2k), halving roll bandwidth; only the bit-0 stage runs at full f32
    width. Precision matches the jnp path, whose position-term einsum is
    bf16 on TPU anyway."""
    KP = x.shape[1]
    row_id2 = jax.lax.broadcasted_iota(jnp.int32, (x.shape[0], 1), 0)
    t_row = qlen - 1 - row_id2  # [q, 1]
    sign = -1 if left else 1

    if not (out_bf16 and x.shape[0] % 2 == 0):
        out = x
        bit = 1
        while bit < qlen:
            rolled = pltpu.roll(out, (sign * bit) % KP, 1)
            out = jnp.where((t_row & bit) != 0, rolled, out)
            bit <<= 1
        return out

    # bit-0 stage at f32 width (t of rows 2r and 2r+1 differ only in bit 0
    # since t(2r) = qlen-1-2r is odd)
    rolled = pltpu.roll(x, sign % KP, 1)
    out = jnp.where((t_row & 1) != 0, rolled, x)
    # remaining stages with sublane-paired rows bitcast to int32: lanes are
    # unchanged (pltpu.bitcast packs the second-to-last dim), so shift
    # amounts stay in bf16 lanes and selects are uniform within each pair
    xi = pltpu.bitcast(out.astype(jnp.bfloat16), jnp.int32)  # [q//2, KP]
    pair_id = jax.lax.broadcasted_iota(jnp.int32, (xi.shape[0], 1), 0)
    t_pair = qlen - 1 - 2 * pair_id
    bit = 2
    while bit < qlen:
        rolled = pltpu.roll(xi, (sign * bit) % KP, 1)
        xi = jnp.where((t_pair & bit) != 0, rolled, xi)
        bit <<= 1
    return pltpu.bitcast(xi, jnp.bfloat16)


def _extract_bd(w_mat, qlen, klen):
    """BD[i, j] = w_mat[i, (qlen-1-i)+j] (left row-shift then crop).

    Circular wrap is harmless: wrapped lanes land only on masked
    (j > mem_len + i) positions. Shifts run at bf16 width when the kernel
    computes in bf16 (inputs bf16); f32 otherwise (CPU tests)."""
    fast = w_mat.dtype == jnp.float32 and _FAST_BF16_SHIFT[0]
    out = _row_shift(w_mat, qlen, left=True, out_bf16=fast)
    return out[:, :klen]


def _scatter_bd(ds, qlen, klen):
    """Transpose of _extract_bd: dW[i, (qlen-1-i)+j] = ds[i, j],
    dW [qlen, klen+qlen]. ds is zero on masked positions, so the circular
    wrap deposits only zeros."""
    KP = klen + qlen
    padded = jnp.concatenate(
        [ds, jnp.zeros((qlen, KP - klen), ds.dtype)], axis=1)
    fast = ds.dtype == jnp.float32 and _FAST_BF16_SHIFT[0]
    return _row_shift(padded, qlen, left=False, out_bf16=fast)


def _fwd_kernel(count_ref, reset_ref, seed_ref, qrw_ref, qrr_ref, kmem_ref,
                vmem_ref, kcur_ref, vcur_ref, rk_ref, o_ref, m_ref, l_ref,
                *, scale, mem_len, same_length, dropatt):
    ih = pl.program_id(0)
    ib = pl.program_id(1)
    qlen = qrw_ref.shape[2]
    klen = mem_len + qlen

    # keep matmul inputs in their storage dtype (bf16 x bf16 -> f32 is the
    # native MXU mode; upcasting first would force slow f32 passes)
    qrw = qrw_ref[0, 0]                           # [q, dh]
    qrr = qrr_ref[0, 0]
    # memory and current K/V arrive as SEPARATE refs (memory in its
    # storage layout — no [b,h,klen,dh] concat or transpose in HBM); the
    # sublane-dim concat here is a VMEM-local copy (~115KB)
    k = jnp.concatenate([kmem_ref[0, 0], kcur_ref[0, 0]], axis=0)
    v_blk = jnp.concatenate([vmem_ref[0, 0], vcur_ref[0, 0]], axis=0)
    rk = rk_ref[0].astype(qrr.dtype)              # [KP, dh]

    # qrw/qrr arrive PRE-SCALED by 1/sqrt(dh) (wrapper) — no score-wide
    # scale pass; `scale` is retained only for kernels' API stability
    del scale
    ac = jax.lax.dot_general(qrw, k, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    w_mat = jax.lax.dot_general(qrr, rk, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
    s = ac + _extract_bd(w_mat, qlen, klen)

    count = count_ref[0]
    reset_b = reset_ref[ib] != 0
    mask = _mask_block(qlen, klen, mem_len, count, reset_b, same_length)
    s = jnp.where(mask, NEG, s)

    m = jnp.max(s, axis=1, keepdims=True)
    p = jnp.exp(s - m)                       # UNNORMALIZED probs
    l = jnp.sum(p, axis=1, keepdims=True)

    # normalization (and the dropout keep-scale) deferred past PV: one
    # [q, dh] multiply instead of score-wide divides
    o_scale = 1.0 / l
    if dropatt > 0.0:
        from .pallas_attention import _dropout_keep
        keep = _dropout_keep(seed_ref[0],
                             ih * pl.num_programs(1) + ib, p.shape, dropatt)
        p = jnp.where(keep, p, 0.0)
        o_scale = o_scale / (1.0 - dropatt)

    o = jax.lax.dot_general(p.astype(v_blk.dtype), v_blk,
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32) * o_scale
    o_ref[0, 0] = o.astype(o_ref.dtype)
    m_ref[0, 0, 0] = m[:, 0]
    l_ref[0, 0, 0] = l[:, 0]


def _bwd_kernel(count_ref, reset_ref, seed_ref, qrw_ref, qrr_ref, kmem_ref,
                vmem_ref, kcur_ref, vcur_ref, rk_ref, m_ref, l_ref, do_ref,
                dqrw_ref, dqrr_ref, dkcur_ref, dvcur_ref, drk_ref,
                *, scale, mem_len, same_length, dropatt):
    ih = pl.program_id(0)
    ib = pl.program_id(1)
    qlen = qrw_ref.shape[2]
    klen = mem_len + qlen

    qrw = qrw_ref[0, 0]
    qrr = qrr_ref[0, 0]
    k = jnp.concatenate([kmem_ref[0, 0], kcur_ref[0, 0]], axis=0)
    v = jnp.concatenate([vmem_ref[0, 0], vcur_ref[0, 0]], axis=0)
    rk = rk_ref[0].astype(qrr.dtype)
    do = do_ref[0, 0]

    # qrw/qrr pre-scaled (see _fwd_kernel): s carries no scale factor and
    # all gradients are w.r.t. the scaled queries (the wrapper's scalar
    # multiply back-propagates the 1/sqrt(dh) automatically)
    del scale
    ac = jax.lax.dot_general(qrw, k, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    w_mat = jax.lax.dot_general(qrr, rk, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
    s = ac + _extract_bd(w_mat, qlen, klen)
    count = count_ref[0]
    reset_b = reset_ref[ib] != 0
    mask = _mask_block(qlen, klen, mem_len, count, reset_b, same_length)
    s = jnp.where(mask, NEG, s)
    p = (jnp.exp(s - m_ref[0, 0, 0][:, None])
         / l_ref[0, 0, 0][:, None])

    if dropatt > 0.0:
        from .pallas_attention import _dropout_keep
        keep = _dropout_keep(seed_ref[0],
                             ih * pl.num_programs(1) + ib, p.shape, dropatt)
        p_drop = jnp.where(keep, p / (1.0 - dropatt), 0.0)
    else:
        p_drop = p

    cd = k.dtype
    # Memory K/V gradients are never consumed (training always detaches
    # the XL memory; the callers that need gradients through memory use
    # the jnp/chunked paths), so dv/dk are computed for the CURRENT
    # columns only — 8/9 of those matmuls and two [klen, dh]-sized HBM
    # writes per (b, h) skipped at mem 1024.
    dv_cur = jax.lax.dot_general(
        p_drop[:, mem_len:].astype(cd), do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    if dropatt > 0.0:
        dp = jnp.where(keep, dp / (1.0 - dropatt), 0.0)
    dsum = jnp.sum(dp * p, axis=1, keepdims=True)
    ds_f32 = p * (dp - dsum)                       # [q, klen]
    ds = ds_f32.astype(cd)

    dqrw = jax.lax.dot_general(ds, k, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)
    dk_cur = jax.lax.dot_general(ds[:, mem_len:], qrw,
                                 (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
    # scatter (f32 or bitcast-bf16 stages), then bf16 matmuls
    dw = _scatter_bd(ds_f32, qlen, klen).astype(cd)  # [q, KP]
    dqrr = jax.lax.dot_general(dw, rk, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)
    drk = jax.lax.dot_general(dw, qrr, (((0,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)

    dqrw_ref[0, 0] = dqrw.astype(dqrw_ref.dtype)
    dqrr_ref[0, 0] = dqrr.astype(dqrr_ref.dtype)
    dkcur_ref[0, 0] = dk_cur.astype(dkcur_ref.dtype)
    dvcur_ref[0, 0] = dv_cur.astype(dvcur_ref.dtype)

    # dR accumulates over the batch sweep (grid iterates batch innermost,
    # so this h's block stays resident between steps).
    @pl.when(ib == 0)
    def _():
        drk_ref[0] = drk.astype(drk_ref.dtype)

    @pl.when(ib > 0)
    def _():
        drk_ref[0] = drk_ref[0] + drk.astype(drk_ref.dtype)


def _hb4(shape):
    return pl.BlockSpec((1, 1) + shape, lambda ih, ib, *_: (ih, ib, 0, 0),
                        memory_space=pltpu.VMEM)


def _h3(shape):
    return pl.BlockSpec((1,) + shape, lambda ih, ib, *_: (ih, 0, 0),
                        memory_space=pltpu.VMEM)


def _fwd_raw(qrw, qrr, k_mem, v_mem, k_cur, v_cur, rk, count, reset, seed,
             scale, same_length, dropatt):
    H, B, qlen, dh = qrw.shape
    mem_len = k_mem.shape[2]
    klen = mem_len + qlen
    kernel = functools.partial(_fwd_kernel, scale=scale, mem_len=mem_len,
                               same_length=same_length, dropatt=dropatt)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(H, B),
        in_specs=[_hb4((qlen, dh)), _hb4((qlen, dh)), _hb4((mem_len, dh)),
                  _hb4((mem_len, dh)), _hb4((qlen, dh)), _hb4((qlen, dh)),
                  _h3((klen + qlen, dh))],
        out_specs=[
            _hb4((qlen, dh)),
            pl.BlockSpec((1, 1, 1, qlen),
                         lambda ih, ib, *_: (ih, ib, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, qlen),
                         lambda ih, ib, *_: (ih, ib, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
    )
    return pl.pallas_call(
        kernel, grid_spec=grid_spec, interpret=INTERPRET,
        out_shape=[
            jax.ShapeDtypeStruct((H, B, qlen, dh), jnp.float32),
            jax.ShapeDtypeStruct((H, B, 1, qlen), jnp.float32),
            jax.ShapeDtypeStruct((H, B, 1, qlen), jnp.float32),
        ],
    )(count, reset, seed, qrw, qrr, k_mem, v_mem, k_cur, v_cur, rk)


def _bwd_raw(qrw, qrr, k_mem, v_mem, k_cur, v_cur, rk, m, l, count, reset,
             seed, do, scale, same_length, dropatt):
    H, B, qlen, dh = qrw.shape
    mem_len = k_mem.shape[2]
    klen = mem_len + qlen
    kernel = functools.partial(_bwd_kernel, scale=scale, mem_len=mem_len,
                               same_length=same_length, dropatt=dropatt)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(H, B),
        in_specs=[_hb4((qlen, dh)), _hb4((qlen, dh)), _hb4((mem_len, dh)),
                  _hb4((mem_len, dh)), _hb4((qlen, dh)), _hb4((qlen, dh)),
                  _h3((klen + qlen, dh)),
                  pl.BlockSpec((1, 1, 1, qlen),
                               lambda ih, ib, *_: (ih, ib, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, 1, 1, qlen),
                               lambda ih, ib, *_: (ih, ib, 0, 0),
                               memory_space=pltpu.VMEM),
                  _hb4((qlen, dh))],
        out_specs=[
            _hb4((qlen, dh)), _hb4((qlen, dh)), _hb4((qlen, dh)),
            _hb4((qlen, dh)), _h3((klen + qlen, dh)),
        ],
    )
    return pl.pallas_call(
        kernel, grid_spec=grid_spec, interpret=INTERPRET,
        out_shape=[
            jax.ShapeDtypeStruct((H, B, qlen, dh), qrw.dtype),
            jax.ShapeDtypeStruct((H, B, qlen, dh), qrr.dtype),
            jax.ShapeDtypeStruct((H, B, qlen, dh), k_cur.dtype),
            jax.ShapeDtypeStruct((H, B, qlen, dh), v_cur.dtype),
            jax.ShapeDtypeStruct((H, klen + qlen, dh), jnp.float32),
        ],
    )(count, reset, seed, qrw, qrr, k_mem, v_mem, k_cur, v_cur, rk, m, l,
      do)


@functools.lru_cache(maxsize=None)
def make_fused_attention_v2(scale: float, same_length: bool,
                            dropatt: float = 0.0):
    """fn(qrw, qrr, k_mem, v_mem, k_cur, v_cur, rk, count, reset, seed)
    -> o [H, B, q, dh] fp32.

    qrw/qrr: [H, B, q, dh] (q + r_w_bias / q + r_r_bias); k_mem/v_mem:
    [H, B, mem_len, dh] (the XL memory in its storage layout — the kernel
    concatenates mem and current K/V in VMEM, so no [b,h,klen,dh] HBM
    concat exists); k_cur/v_cur: [H, B, q, dh]; rk: [H, klen+q, dh]
    per-head projected positional embeddings zero-padded with q rows.

    The backward produces NO k_mem/v_mem gradients (zeros, DCE'd by XLA):
    every caller detaches the XL memory on this path.
    """

    @jax.custom_vjp
    def fused(qrw, qrr, k_mem, v_mem, k_cur, v_cur, rk, count, reset,
              seed):
        o, _, _ = _fwd_raw(qrw, qrr, k_mem, v_mem, k_cur, v_cur, rk,
                           count, reset, seed, scale, same_length, dropatt)
        return o

    def fwd(qrw, qrr, k_mem, v_mem, k_cur, v_cur, rk, count, reset, seed):
        o, m, l = _fwd_raw(qrw, qrr, k_mem, v_mem, k_cur, v_cur, rk,
                           count, reset, seed, scale, same_length, dropatt)
        return o, (qrw, qrr, k_mem, v_mem, k_cur, v_cur, rk, m, l, count,
                   reset, seed)

    def bwd(res, do):
        (qrw, qrr, k_mem, v_mem, k_cur, v_cur, rk, m, l, count, reset,
         seed) = res
        dqrw, dqrr, dk_cur, dv_cur, drk = _bwd_raw(
            qrw, qrr, k_mem, v_mem, k_cur, v_cur, rk, m, l, count, reset,
            seed, do, scale, same_length, dropatt)
        return (dqrw, dqrr, jnp.zeros_like(k_mem), jnp.zeros_like(v_mem),
                dk_cur, dv_cur, drk.astype(rk.dtype),
                jnp.zeros_like(count), jnp.zeros_like(reset),
                jnp.zeros_like(seed))

    fused.defvjp(fwd, bwd)
    return fused


def rel_attention_kv_fused_v2(w, k_mem, v_mem, r, qkv_w, r_w, r_w_bias,
                              r_r_bias, attn_count, reset_rows, n_head,
                              d_head, *, same_length: bool,
                              dropatt: float = 0.0, dropatt_rng=None):
    """Drop-in fused variant with the position term computed in-kernel.

    Same contract as attention.rel_attention_kv: k_mem/v_mem arrive in
    the h-major storage layout [h, b, mem_len, dh] and are fed to the
    kernel UNTOUCHED (no transpose, no [b,h,klen,dh] concat — those were
    ~2.6 ms/layer of pure HBM traffic at the training op-point); returns
    (attn_vec [q, b, h*dh], k_cur [h, b, q, dh], v_cur likewise).
    Requires qlen % 8 == 0 and lane-aligned mem_len (callers gate on
    ``supports_v2``).
    """
    qlen, bsz = w.shape[0], w.shape[1]
    mem_len = k_mem.shape[2]
    klen = mem_len + qlen
    scale = 1.0 / (d_head ** 0.5)

    # The custom_vjp returns zero k_mem/v_mem cotangents by design (XL
    # training always detaches memory). Make that contract explicit at the
    # boundary: a future caller differentiating through memory gets a
    # correctly-stopped gradient here instead of silent zeros from the vjp.
    k_mem = jax.lax.stop_gradient(k_mem)
    v_mem = jax.lax.stop_gradient(v_mem)

    w_heads = w @ qkv_w
    q, k_cur, v_cur = jnp.split(w_heads, 3, axis=-1)
    # [q, b, h*dh] -> [h, b, q, dh] (q-sized transposes only)
    q = q.reshape(qlen, bsz, n_head, d_head).transpose(2, 1, 0, 3)
    k_cur = k_cur.reshape(qlen, bsz, n_head, d_head).transpose(2, 1, 0, 3)
    v_cur = v_cur.reshape(qlen, bsz, n_head, d_head).transpose(2, 1, 0, 3)

    # per-head projected positional embeddings, zero-padded with q rows
    r_head_k = (r @ r_w).reshape(klen, n_head, d_head).transpose(1, 0, 2)
    rk = jnp.concatenate(
        [r_head_k, jnp.zeros((n_head, qlen, d_head), r_head_k.dtype)],
        axis=1)  # [h, klen+q, dh]

    # pre-scale the queries: a [h,b,q,dh]-sized multiply here replaces a
    # score-wide [q, klen] scale pass inside the kernel
    sc = jnp.asarray(scale, q.dtype)
    qrw = (q + r_w_bias.astype(q.dtype)[:, None, None, :]) * sc
    qrr = (q + r_r_bias.astype(q.dtype)[:, None, None, :]) * sc

    if reset_rows is None:
        reset = jnp.zeros((bsz,), jnp.int32)
    else:
        reset = reset_rows.astype(jnp.int32)
    count = attn_count.reshape(1).astype(jnp.int32)
    rate = dropatt if dropatt_rng is not None else 0.0
    if dropatt_rng is not None:
        seed = jax.random.randint(dropatt_rng, (1,), 0, 2 ** 31 - 1,
                                  dtype=jnp.int32)
    else:
        seed = jnp.zeros((1,), jnp.int32)

    fused = make_fused_attention_v2(scale, same_length, rate)
    o = fused(qrw, qrr, k_mem, v_mem, k_cur, v_cur, rk, count, reset,
              seed)
    # [h, b, q, dh] -> [q, b, h*dh]
    attn_vec = o.transpose(2, 1, 0, 3).reshape(qlen, bsz, n_head * d_head)
    return attn_vec.astype(w.dtype), k_cur, v_cur


def supports_v2(qlen: int, mem_len: int, interpret: bool = False) -> bool:
    """Shape constraints of the v2 kernels: q-blocks of 8 rows for the
    shift extraction, and a lane-aligned mem boundary for the backward's
    ds[:, mem_len:] slice (Mosaic requires 128-multiple lane offsets).
    Interpret mode (CPU tests) has no alignment constraints."""
    if qlen % 8 != 0 or mem_len == 0:
        return False
    return interpret or mem_len % 128 == 0
