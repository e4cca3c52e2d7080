"""Fused XL attention Pallas kernels (forward + backward).

The XLA path materializes ~5 score-sized [bsz, heads, qlen, klen] tensors
per layer in HBM (AC, BD, masked sum, softmax, probs) — the dominant cost
of the training step at mem_len 1024. These kernels keep everything
score-sized in VMEM:

* forward: S = q_rw @ K^T + BD (BD: position-bias term, precomputed by the
  caller — its relative shift is a pad-reshape XLA handles well), masking
  from scalars (memory valid-count, per-row reset, same_length band),
  fp32 row softmax, O = P @ V. Residuals: per-row max and denominator, so
  the backward recomputes P exactly.
* backward: recompute P, then dV = P^T dO, dP = dO V^T,
  dS = P * (dP - rowsum(dP * P)) * scale, dBD = dS, dq = dS K, dK = dS^T q.

Grid is (batch, head); one program holds K/V/BD/S blocks for a whole
(b, h) pair in VMEM (~1.5 MB at the reference operating point). Exposed
through ``fused_attention`` with a custom VJP; the jnp implementation in
models/attention.py is the oracle (equivalence tested in interpret mode).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -0.7 * float(np.finfo(np.float32).max)

# Tests flip this to run the kernels in interpreter mode on CPU.
INTERPRET = False


def _mask_block(qlen, klen, mem_len, count, reset_b, same_length):
    """True = masked, [qlen, klen]; mirrors models/xl.py build_attn_mask."""
    i = jax.lax.broadcasted_iota(jnp.int32, (qlen, klen), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (qlen, klen), 1)
    mask = (j > (mem_len + i)) | (j < (mem_len - count))
    if same_length:
        j_dyn = j - (mem_len - count)
        mask_len = count + qlen - mem_len
        mask_shift_len = jnp.where(mask_len > 0, qlen - mask_len, qlen)
        mask = mask | (j_dyn <= (i - mask_shift_len))
    mask = mask | (reset_b & (j < mem_len))
    return mask


def _dropout_keep(seed, program_id, shape, rate):
    """Deterministic per-program keep mask; regenerated identically in the
    backward kernel (same seed) so fwd/bwd see the same dropout."""
    pltpu.prng_seed(seed + program_id)
    bits = pltpu.prng_random_bits(shape)
    # uniform in [0, 2^32): keep where bits >= rate * 2^32
    threshold = np.uint32(min(int(rate * (1 << 32)), (1 << 32) - 1))
    return pltpu.bitcast(bits, jnp.uint32) >= threshold


def _fwd_kernel(count_ref, reset_ref, seed_ref, q_ref, k_ref, v_ref,
                bd_ref, o_ref, m_ref, l_ref, *, scale, mem_len,
                same_length, dropatt):
    b = pl.program_id(0)
    qlen = q_ref.shape[1]
    klen = k_ref.shape[1]

    q = q_ref[0]                              # [qlen, dh]
    k = k_ref[0]                              # [klen, dh]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)   # [qlen, klen]
    s = (s + bd_ref[0].astype(jnp.float32)) * scale

    count = count_ref[0]
    reset_b = reset_ref[b] != 0
    mask = _mask_block(qlen, klen, mem_len, count, reset_b, same_length)
    s = jnp.where(mask, NEG, s)

    m = jnp.max(s, axis=1, keepdims=True)     # [qlen, 1]
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=1, keepdims=True)
    p = p / l

    if dropatt > 0.0:
        keep = _dropout_keep(seed_ref[0], b, p.shape, dropatt)
        p = jnp.where(keep, p / (1.0 - dropatt), 0.0)

    o = jax.lax.dot_general(
        p.astype(v_ref.dtype), v_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    o_ref[0] = o.astype(o_ref.dtype)
    m_ref[0, 0] = m[:, 0]
    l_ref[0, 0] = l[:, 0]


def _bwd_kernel(count_ref, reset_ref, seed_ref, q_ref, k_ref, v_ref,
                bd_ref, m_ref, l_ref, do_ref,
                dq_ref, dk_ref, dv_ref, dbd_ref,
                *, scale, mem_len, same_length, dropatt):
    b = pl.program_id(0)
    qlen = q_ref.shape[1]
    klen = k_ref.shape[1]

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0]                            # [qlen, dh]

    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    s = (s + bd_ref[0].astype(jnp.float32)) * scale
    count = count_ref[0]
    reset_b = reset_ref[b] != 0
    mask = _mask_block(qlen, klen, mem_len, count, reset_b, same_length)
    s = jnp.where(mask, NEG, s)
    p = (jnp.exp(s - m_ref[0, 0][:, None])
         / l_ref[0, 0][:, None])  # [qlen, klen]

    if dropatt > 0.0:
        keep = _dropout_keep(seed_ref[0], b, p.shape, dropatt)
        p_drop = jnp.where(keep, p / (1.0 - dropatt), 0.0)
    else:
        p_drop = p

    cd = k.dtype
    dv = jax.lax.dot_general(p_drop.astype(cd), do,
                             (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    if dropatt > 0.0:
        dp = jnp.where(keep, dp / (1.0 - dropatt), 0.0)
    dsum = jnp.sum(dp * p, axis=1, keepdims=True)
    ds = p * (dp - dsum)                       # [qlen, klen] (pre-scale)
    dbd = (ds * scale).astype(cd)
    dq = jax.lax.dot_general(dbd, k, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    dk = jax.lax.dot_general(dbd, q, (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)

    dq_ref[0] = dq.astype(dq_ref.dtype)
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)
    dbd_ref[0] = dbd.astype(dbd_ref.dtype)


def _specs(bh_block_shapes):
    # index maps receive (*grid_idx, *scalar_prefetch_refs); ignore scalars
    return [
        pl.BlockSpec((1,) + shape, (lambda i, *_: (i, 0, 0))
                     if len(shape) == 2 else (lambda i, *_: (i, 0)),
                     memory_space=pltpu.VMEM)
        for shape in bh_block_shapes
    ]


@functools.lru_cache(maxsize=None)
def make_fused_attention(scale: float, same_length: bool,
                         dropatt: float = 0.0):
    """Build the custom-vjp fused op for static (scale, same_length).

    The returned fn(q, k, v, bd, count, reset) computes
    softmax((q @ k^T + bd) * scale, masked) @ v with
    q [BH, qlen, dh] (r_w_bias already added), k/v [BH, klen, dh],
    bd [BH, qlen, klen] (rel-shift already applied), count int32 [1],
    reset int32 [BH]; returns o [BH, qlen, dh] fp32.
    """

    @jax.custom_vjp
    def fused(q, k, v, bd, count, reset, seed):
        o, _, _ = _fused_fwd_raw(q, k, v, bd, count, reset, seed, scale,
                                 same_length, dropatt)
        return o

    def fwd(q, k, v, bd, count, reset, seed):
        o, m, l = _fused_fwd_raw(q, k, v, bd, count, reset, seed, scale,
                                 same_length, dropatt)
        return o, (q, k, v, bd, m, l, count, reset, seed)

    def bwd(res, do):
        q, k, v, bd, m, l, count, reset, seed = res
        dq, dk, dv, dbd = _fused_bwd_raw(q, k, v, bd, m, l, count, reset,
                                         seed, do, scale, same_length,
                                         dropatt)
        return (dq, dk, dv, dbd, jnp.zeros_like(count),
                jnp.zeros_like(reset), jnp.zeros_like(seed))

    fused.defvjp(fwd, bwd)
    return fused


def _fused_fwd_raw(q, k, v, bd, count, reset, seed, scale, same_length,
                   dropatt):
    BH, qlen, dh = q.shape
    klen = k.shape[1]
    mem_len = klen - qlen
    kernel = functools.partial(_fwd_kernel, scale=scale, mem_len=mem_len,
                               same_length=same_length, dropatt=dropatt)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(BH,),
        in_specs=_specs([(qlen, dh), (klen, dh), (klen, dh),
                         (qlen, klen)]),
        out_specs=[
            pl.BlockSpec((1, qlen, dh), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, qlen), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, qlen), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
    )
    o, m, l = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        interpret=INTERPRET,
        out_shape=[
            jax.ShapeDtypeStruct((BH, qlen, dh), jnp.float32),
            jax.ShapeDtypeStruct((BH, 1, qlen), jnp.float32),
            jax.ShapeDtypeStruct((BH, 1, qlen), jnp.float32),
        ],
    )(count, reset, seed, q, k, v, bd)
    return o, m, l


def _fused_bwd_raw(q, k, v, bd, m, l, count, reset, seed, do, scale,
                   same_length, dropatt):
    BH, qlen, dh = q.shape
    klen = k.shape[1]
    mem_len = klen - qlen
    kernel = functools.partial(_bwd_kernel, scale=scale, mem_len=mem_len,
                               same_length=same_length, dropatt=dropatt)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(BH,),
        in_specs=_specs([(qlen, dh), (klen, dh), (klen, dh), (qlen, klen),
                         (1, qlen), (1, qlen), (qlen, dh)]),
        out_specs=[
            pl.BlockSpec((1, qlen, dh), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, klen, dh), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, klen, dh), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, qlen, klen), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
    )
    dq, dk, dv, dbd = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        interpret=INTERPRET,
        out_shape=[
            jax.ShapeDtypeStruct((BH, qlen, dh), q.dtype),
            jax.ShapeDtypeStruct((BH, klen, dh), k.dtype),
            jax.ShapeDtypeStruct((BH, klen, dh), v.dtype),
            jax.ShapeDtypeStruct((BH, qlen, klen), bd.dtype),
        ],
    )(count, reset, seed, q, k, v, bd, m, l, do)
    return dq, dk, dv, dbd


def rel_attention_kv_fused(w, k_mem, v_mem, r, qkv_w, r_w, r_w_bias,
                           r_r_bias, attn_count, reset_rows, n_head,
                           d_head, *, same_length: bool,
                           dropatt: float = 0.0, dropatt_rng=None):
    """Drop-in fused variant of attention.rel_attention_kv (same outputs,
    including attention-prob dropout generated in-kernel from a
    per-program seed). k_mem/v_mem arrive h-major [h, b, mem, dh] (the
    storage layout); this fallback path transposes them to its internal
    [b, h, ...] layout — the v2 kernel avoids that, use it when
    ``supports_v2``. Returns k_cur/v_cur h-major."""
    qlen, bsz = w.shape[0], w.shape[1]
    mem_len = k_mem.shape[2]
    klen = mem_len + qlen
    scale = 1.0 / (d_head ** 0.5)

    w_heads = w @ qkv_w
    q, k_cur, v_cur = jnp.split(w_heads, 3, axis=-1)
    q = q.reshape(qlen, bsz, n_head, d_head).transpose(1, 2, 0, 3)
    k_cur = k_cur.reshape(qlen, bsz, n_head, d_head).transpose(1, 2, 0, 3)
    v_cur = v_cur.reshape(qlen, bsz, n_head, d_head).transpose(1, 2, 0, 3)
    k = jnp.concatenate([k_mem.transpose(1, 0, 2, 3), k_cur], axis=2)
    v = jnp.concatenate([v_mem.transpose(1, 0, 2, 3), v_cur], axis=2)

    r_head_k = (r @ r_w).reshape(klen, n_head, d_head)
    rr_q = q + r_r_bias.astype(q.dtype)[None, :, None, :]
    from ..models.attention import rel_shift
    bd = jnp.einsum("bhid,jhd->bhij", rr_q, r_head_k.astype(q.dtype))
    bd = rel_shift(bd)

    q_rw = q + r_w_bias.astype(q.dtype)[None, :, None, :]

    BH = bsz * n_head
    if reset_rows is None:
        reset = jnp.zeros((BH,), jnp.int32)
    else:
        reset = jnp.repeat(reset_rows.astype(jnp.int32), n_head)
    count = attn_count.reshape(1).astype(jnp.int32)

    rate = dropatt if dropatt_rng is not None else 0.0
    if dropatt_rng is not None:
        seed = jax.random.randint(dropatt_rng, (1,), 0, 2 ** 31 - 1,
                                  dtype=jnp.int32)
    else:
        seed = jnp.zeros((1,), jnp.int32)
    fused = make_fused_attention(scale, same_length, rate)
    o = fused(
        q_rw.reshape(BH, qlen, d_head),
        k.reshape(BH, klen, d_head),
        v.reshape(BH, klen, d_head),
        bd.reshape(BH, qlen, klen),
        count, reset, seed)
    o = o.reshape(bsz, n_head, qlen, d_head)
    attn_vec = o.transpose(2, 0, 1, 3).reshape(qlen, bsz,
                                               n_head * d_head)
    return (attn_vec.astype(w.dtype), k_cur.transpose(1, 0, 2, 3),
            v_cur.transpose(1, 0, 2, 3))
