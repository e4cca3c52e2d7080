"""Relative-position multi-head attention (Transformer-XL style).

jnp reference implementation of the attention math in reference
model/mem_transformer.py:154-257 (RelPartialLearnableMultiHeadAttn):
fused QKV projection, AC/BD score decomposition with the pad-reshape
relative-shift, additive position-bias vectors r_w/r_r, masked fp32 softmax.

The Pallas fused kernel in transformer_gan_tpu.ops.pallas_attention computes
the same function; this module is the oracle/fallback path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

LN_EPS = 1e-5  # torch.nn.LayerNorm default, for parity with the reference


def layer_norm(x: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray,
               eps: float = LN_EPS) -> jnp.ndarray:
    # Accumulate at >= fp32 (fp64 inputs keep fp64 for exactness checks).
    acc = jnp.promote_types(x.dtype, jnp.float32)
    x32 = x.astype(acc)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    return (y * scale + bias).astype(x.dtype)


def rel_shift(x: jnp.ndarray) -> jnp.ndarray:
    """The pad-and-reshape relative shift (reference
    mem_transformer.py:133-147). x: [bsz, n_head, qlen, klen]."""
    b, n, q, k = x.shape
    zero_pad = jnp.zeros((b, n, q, 1), dtype=x.dtype)
    x_padded = jnp.concatenate([zero_pad, x], axis=3)
    x_padded = x_padded.reshape(b, n, k + 1, q)
    return x_padded[:, :, 1:].reshape(b, n, q, k)


def rel_attention(w: jnp.ndarray,
                  cat: jnp.ndarray,
                  r: jnp.ndarray,
                  qkv_w: jnp.ndarray,
                  r_w: jnp.ndarray,
                  o_w: jnp.ndarray,
                  r_w_bias: jnp.ndarray,
                  r_r_bias: jnp.ndarray,
                  attn_mask: jnp.ndarray,
                  n_head: int,
                  d_head: int,
                  *,
                  softmax_dtype=jnp.float32,
                  dropatt_rng=None,
                  dropatt_rate: float = 0.0) -> jnp.ndarray:
    """Core XL attention (post-projection residual/LN handled by caller).

    w:    [qlen, bsz, d_model]  current segment input (already pre-LN'd if
          pre_lnorm)
    cat:  [klen, bsz, d_model]  memory-concatenated input for K/V (and Q tail)
    r:    [klen, d_model]       relative positional embeddings (distance
          klen-1 .. 0)
    attn_mask: [bsz or 1, qlen, klen] bool, True = masked.
    Returns attn output [qlen, bsz, n_head*d_head] (before o_net).
    """
    qlen, bsz = w.shape[0], w.shape[1]
    klen = cat.shape[0]
    scale = 1.0 / (d_head ** 0.5)

    w_heads = cat @ qkv_w  # [klen, bsz, 3*n_head*d_head]
    w_head_q, w_head_k, w_head_v = jnp.split(w_heads, 3, axis=-1)
    w_head_q = w_head_q[-qlen:]
    r_head_k = r @ r_w  # [klen, n_head*d_head]

    w_head_q = w_head_q.reshape(qlen, bsz, n_head, d_head)
    w_head_k = w_head_k.reshape(klen, bsz, n_head, d_head)
    w_head_v = w_head_v.reshape(klen, bsz, n_head, d_head)
    r_head_k = r_head_k.reshape(klen, n_head, d_head)

    rw_head_q = w_head_q + r_w_bias.astype(w_head_q.dtype)
    AC = jnp.einsum("ibnd,jbnd->bnij", rw_head_q, w_head_k)
    rr_head_q = w_head_q + r_r_bias.astype(w_head_q.dtype)
    BD = jnp.einsum("ibnd,jnd->bnij", rr_head_q, r_head_k.astype(w_head_q.dtype))
    BD = rel_shift(BD)

    attn_score = (AC + BD).astype(softmax_dtype) * scale
    neg = jnp.asarray(jnp.finfo(softmax_dtype).min, dtype=softmax_dtype)
    attn_score = jnp.where(attn_mask[:, None, :, :], neg, attn_score)
    attn_prob = jax.nn.softmax(attn_score, axis=3)

    if dropatt_rng is not None and dropatt_rate > 0.0:
        keep = jax.random.bernoulli(dropatt_rng, 1.0 - dropatt_rate,
                                    attn_prob.shape)
        attn_prob = jnp.where(keep, attn_prob / (1.0 - dropatt_rate), 0.0)

    attn_prob = attn_prob.astype(w_head_v.dtype)
    attn_vec = jnp.einsum("bnij,jbnd->ibnd", attn_prob, w_head_v)
    return attn_vec.reshape(qlen, bsz, n_head * d_head)


def rel_attention_kv(w: jnp.ndarray,
                     k_mem: jnp.ndarray,
                     v_mem: jnp.ndarray,
                     r: jnp.ndarray,
                     qkv_w: jnp.ndarray,
                     r_w: jnp.ndarray,
                     r_w_bias: jnp.ndarray,
                     r_r_bias: jnp.ndarray,
                     attn_mask: jnp.ndarray,
                     n_head: int,
                     d_head: int,
                     *,
                     softmax_dtype=jnp.float32,
                     dropatt_rng=None,
                     dropatt_rate: float = 0.0,
                     detach_kv_cross: bool = False,
                     with_prob: bool = False):
    """K/V-cached XL attention: memory holds projected keys/values.

    XL keys/values are position-independent (relative position enters only
    through the r terms at score time), so the reference's recomputation of
    QKV over [mems || current] every step (mem_transformer.py:165-174) can
    be replaced by caching K/V — identical math, ~9x less QKV FLOPs at
    mem_len 1024 / tgt_len 128.

    w:     [qlen, bsz, d_model] current (pre-LN applied by caller if needed)
    k_mem, v_mem: [n_head, bsz, mem_len, d_head] cached memory K/V
    (h-major storage layout, chosen so the Pallas kernels read the memory
    blocks directly with no transpose)
    Returns (attn_vec [qlen, bsz, n_head*d_head],
             k_cur [n_head, bsz, qlen, d_head], v_cur likewise).

    ``detach_kv_cross``: reproduce the incremental-decoding gradient
    contract (decode_chunk_step with detach_kv_writes=True, which mirrors
    the reference's unconditional mems detach in _update_mems,
    mem_transformer.py:461-482) inside this batched pass: every K/V lane
    is stop-gradient'ed EXCEPT query i's own lane (mem_len + i), which
    stays live — gradient reaches the current token's K/V exactly once.
    The positional (BD) term is live on every lane, as in the decode
    scan. Used by the truncate_backprop GAN gen-phase recompute
    (models/gan.py _sample_fake_chunks_recompute).
    """
    qlen, bsz = w.shape[0], w.shape[1]
    mem_len = k_mem.shape[2]
    klen = mem_len + qlen
    scale = 1.0 / (d_head ** 0.5)

    w_heads = w @ qkv_w  # [qlen, bsz, 3*n_head*d_head]
    q, k_cur, v_cur = jnp.split(w_heads, 3, axis=-1)
    # attention-ready [b, h, t, d] layout
    q = q.reshape(qlen, bsz, n_head, d_head).transpose(1, 2, 0, 3)
    k_cur = k_cur.reshape(qlen, bsz, n_head, d_head).transpose(1, 2, 0, 3)
    v_cur = v_cur.reshape(qlen, bsz, n_head, d_head).transpose(1, 2, 0, 3)
    k = jnp.concatenate([k_mem.transpose(1, 0, 2, 3), k_cur], axis=2)
    v = jnp.concatenate([v_mem.transpose(1, 0, 2, 3), v_cur], axis=2)

    if r.ndim == 3:
        # pre-projected positional heads [klen, n_head, d_head] (constant
        # for fixed klen — decode scans hoist the r @ r_w projection)
        r_head_k = r
    else:
        r_head_k = (r @ r_w).reshape(klen, n_head, d_head)

    if detach_kv_cross:
        k_used = jax.lax.stop_gradient(k)
        v_used = jax.lax.stop_gradient(v)
    else:
        k_used, v_used = k, v

    rw_q = q + r_w_bias.astype(q.dtype)[None, :, None, :]
    AC = rw_q @ k_used.transpose(0, 1, 3, 2)      # [b, h, qlen, klen]
    if detach_kv_cross:
        # live self lane: forward-neutral correction adding the live-k
        # gradient path on lane mem_len + i only. sg(rw_q) — the q-side
        # gradient already flows through the main AC product (q is live
        # on every lane); a live q here would double-count it.
        self_ac = jnp.sum(jax.lax.stop_gradient(rw_q) * k_cur,
                          axis=-1)                # [b, h, qlen]
        self_ac = self_ac - jax.lax.stop_gradient(self_ac)
        lane = jax.lax.broadcasted_iota(
            jnp.int32, (1, 1, qlen, klen), 3)
        diag = (lane == (mem_len
                         + jnp.arange(qlen)[None, None, :, None]))
        AC = AC + jnp.where(diag, self_ac[..., None],
                            jnp.zeros((), AC.dtype))
    rr_q = q + r_r_bias.astype(q.dtype)[None, :, None, :]
    BD = jnp.einsum("bhid,jhd->bhij", rr_q, r_head_k.astype(q.dtype))
    BD = rel_shift(BD)

    attn_score = (AC + BD).astype(softmax_dtype) * scale
    neg = jnp.asarray(jnp.finfo(softmax_dtype).min, dtype=softmax_dtype)
    attn_score = jnp.where(attn_mask[:, None, :, :], neg, attn_score)
    attn_prob = jax.nn.softmax(attn_score, axis=3)

    if dropatt_rng is not None and dropatt_rate > 0.0:
        keep = jax.random.bernoulli(dropatt_rng, 1.0 - dropatt_rate,
                                    attn_prob.shape)
        attn_prob = jnp.where(keep, attn_prob / (1.0 - dropatt_rate), 0.0)

    ctx = attn_prob.astype(v.dtype) @ v_used      # [b, h, qlen, d]
    if detach_kv_cross:
        # live self lane for V: ctx_i += p_[i, self] * (v_i - sg(v_i))
        # sg(p): the p-side gradient already flows through the main
        # P @ sg(V) product; v_live's forward value is zero so a live p
        # here would contribute nothing but a dead graph edge anyway
        diag_p = jax.lax.stop_gradient(jnp.sum(
            jnp.where(diag, attn_prob,
                      jnp.zeros((), attn_prob.dtype)),
            axis=3)).astype(v.dtype)              # [b, h, qlen]
        v_live = v_cur - jax.lax.stop_gradient(v_cur)
        ctx = ctx + diag_p[..., None] * v_live
    attn_vec = ctx.transpose(2, 0, 1, 3).reshape(qlen, bsz,
                                                 n_head * d_head)
    out = (attn_vec, k_cur.transpose(1, 0, 2, 3),
           v_cur.transpose(1, 0, 2, 3))
    if with_prob:
        # residual for the streamed chain-backward kernel
        # (ops/pallas_chain_bwd.py): [b, h, qlen, klen] fp32, exactly 0
        # on masked lanes
        out = out + (jax.lax.stop_gradient(
            attn_prob.astype(jnp.float32)),)
    return out
