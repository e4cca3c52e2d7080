"""Fused single-token decode step for GAN sampling (forward-only).

The GAN phases' #1 cost is the sequential gumbel sampling loop
(reference transformer_gan.py:299-334 / mem_transformer.py:602-651): one
token per step through all layers. The jnp chunked-decode path
(models/xl.py decode_chunk_step) is mathematically tight but lowers to
~130 small XLA ops per token; on TPU each serialized op costs ~10-15us
of issue latency, so the loop runs ~1.5ms/token at the spanbert GAN
op-point (b 32, mem 128) — pure overhead, ~25x above the HBM floor of
reading the K/V cache once per token.

This kernel fuses the ENTIRE per-token forward — embedding, all L
decoder layers (QKV, relative-position scores, softmax, context, output
projection, FF, layer norms), logits, and the gumbel argmax — into ONE
``pallas_call``. The sampling scan body becomes a single kernel launch:

* grid ``(n_layer, B/BB)``, layer-major, so each layer's weights are
  fetched once per token and the big K/V cache streams through VMEM
  exactly once per token (the physical floor);
* activations live in a VMEM scratch carried across grid steps;
* scores use the same two-level cache contract as decode_chunk_step:
  big read-only K/V (constant within a 32-token chunk) + tiny staging
  buffers carried through the scan (fresh outputs each step; the merge
  into the big buffer stays in XLA, once per chunk);
* the relative-position term BD comes from one batched matmul against
  the precomputed positional projections and ONE circular lane-roll by
  ``t``: with the staging lanes appended after the M big lanes, the
  distance algebra collapses to ``BD_cat[x] = BD_rev[x - t]`` for every
  valid lane (invalid lanes are exactly the masked ones), so no
  dynamic slicing is needed — a binary-decomposition roll
  (pallas_attention_v2 idiom) aligns big and staged lanes in one go;
* gumbel noise arrives PRE-TRANSFORMED (g = -log(-log(u+eps)+eps)
  computed by XLA, one vectorized op per chunk): Mosaic's log is an
  approximation, and feeding g keeps the sampled ids bit-identical to
  the jnp oracle path (the forward value of the straight-through
  gumbel-softmax is argmax(logits + g) — temperature does not change
  the argmax, so the kernel never needs it).

Forward-only by design: the dis phase differentiates the discriminator
only (generator samples are constants there), so this path carries no
VJP. The differentiable gen phase keeps the jnp chunked path.

Gradient/equivalence oracle: models/xl.py decode_chunk_step (tests
compare sampled ids + one-hots exactly in interpret mode).
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
from ._pallas_common import pick_bb as _pick_bb
from ._pallas_common import roll_lanes

INTERPRET = False

# Staging length ceiling: the BD roll decomposes t binarily, and
# t < C <= 32 for every caller (xl.GEN_DECODE_CHUNK).
_MAX_CHUNK = 32

# Whole-chunk sampler operand mode: True keeps weights/K/V/staging as
# full resident operands read with the traced layer index (fetched once
# per launch); False streams index-map-selected per-(l[,b]) blocks (the
# pattern every proven kernel uses; staging round-trips through HBM
# between layer phases). Flip if the resident lowering misbehaves on a
# given toolchain.
RESIDENT = True


def _roll_lanes(x, t):
    """Chunk-local lane roll: t < _MAX_CHUNK (see _pallas_common)."""
    return roll_lanes(x, t, max_amount=_MAX_CHUNK)


def _decode_kernel(sc_ref, ids_ref, g_ref,
                   k_ref, v_ref, r_ref, sk_ref, sv_ref,
                   qw_ref, kw_ref, vw_ref, ow_ref,
                   ff1_ref, fb1_ref, ff2_ref, fb2_ref,
                   lnas_ref, lnab_ref, lnfs_ref, lnfb_ref,
                   rwb_ref, rrb_ref, mh_ref, embw_ref, embt_ref, cb_ref,
                   ids_out, oh_out, sk_out, sv_out,
                   x_ref, tmp_ref, qhw_ref, qhr_ref, *,
                   L, NB, BB, M, C, V, HD, pre_lnorm, cdtype, eps_ln,
                   scale):
    li = pl.program_id(0)
    bb = pl.program_id(1)
    t = sc_ref[0]
    count = sc_ref[1]
    B = NB * BB
    bs = pl.multiple_of(bb * BB, BB)

    # ---- embed the previous token (once, before layer 0) ----
    @pl.when(jnp.logical_and(li == 0, bb == 0))
    def _():
        lane = jax.lax.broadcasted_iota(jnp.int32, (B, V), 1)
        oh = (lane == ids_ref[:]).astype(cdtype)
        # embw arrives pre-scaled by d_model**0.5 (embed_input,
        # models/xl.py:225-237)
        x_ref[:] = _dot(oh, embw_ref[:]).astype(cdtype)

    x = x_ref[pl.ds(bs, BB), :]                                # [BB, HD]
    if pre_lnorm:
        w_in = _ln(x, lnas_ref[0], lnab_ref[0], eps_ln)
    else:
        w_in = x

    q = _dot(w_in, qw_ref[0]).astype(cdtype)                   # [BB, HD]
    k = _dot(w_in, kw_ref[0]).astype(cdtype)
    v = _dot(w_in, vw_ref[0]).astype(cdtype)

    # Mosaic rejects every op that moves data between the batch dim and
    # the tiled (sublane, lane) dims of a >2D vector — x[:, None, :]
    # reshapes, middle-dim broadcast_in_dim, and stores whose value needs
    # such a reshape all fail with "unsupported shape cast" (probed on
    # chip, tools/probe_mosaic_decode.py). Per-row constructions below
    # stay within the supported set: full-tile 2D ops + static
    # leading-index ref reads/stores (pure address arithmetic).

    # ---- staged K/V ring write at chunk slot t, one lane-batch row at a
    # time: old [C, HD] tile, (1, HD) sublane-broadcast of the new row ----
    srow = jax.lax.broadcasted_iota(jnp.int32, (C, HD), 0)
    tmp_ref[:] = k
    for b in range(BB):
        sk_out[0, b] = jnp.where(
            srow == t, jnp.broadcast_to(tmp_ref[b:b + 1, :], (C, HD)),
            sk_ref[0, b])
    tmp_ref[:] = v
    for b in range(BB):
        sv_out[0, b] = jnp.where(
            srow == t, jnp.broadcast_to(tmp_ref[b:b + 1, :], (C, HD)),
            sv_ref[0, b])
    sk_new = sk_out[0]                                         # [BB,C,HD]
    sv_new = sv_out[0]

    # ---- relative-position attention over big cache + staging ----
    mh = mh_ref[:].astype(cdtype)                              # [H, HD]
    # per-head masked queries [BB, H, HD], built one row at a time:
    # (1, HD) x (H, HD) sublane-broadcast mul, stored at static leading b
    tmp_ref[:] = q + rwb_ref[:].astype(cdtype)
    for b in range(BB):
        qhw_ref[b] = tmp_ref[b:b + 1, :] * mh
    tmp_ref[:] = q + rrb_ref[:].astype(cdtype)
    for b in range(BB):
        qhr_ref[b] = tmp_ref[b:b + 1, :] * mh
    qHw = qhw_ref[:]                                           # [BB,H,HD]
    qHr = qhr_ref[:]

    ac_big = _bdot(qHw, k_ref[0]).astype(cdtype)               # [BB,H,M]
    ac_st = _bdot(qHw, sk_new).astype(cdtype)                  # [BB,H,C]
    # BD stays fp32 through the roll: tpu.dynamic_rotate only supports
    # 32-bit data, and the score math is fp32 anyway
    bd_rev = jax.lax.dot_general(
        qHr, r_ref[0], (((2,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)                    # [BB,H,M+1]
    H = mh.shape[0]
    bd_pad = jnp.concatenate(
        [bd_rev, jnp.zeros((BB, H, C - 1), jnp.float32)],
        axis=-1)                                               # [BB,H,M+C]
    # distance algebra: BD_cat[x] = BD_rev[x - t] on every unmasked lane
    # (big lane m needs distance M-m+t -> row m-t; staged lane M+s needs
    # distance t-s -> row M-t+s = (M+s)-t); wrapped/garbage lanes are
    # exactly the masked ones.
    bd_cat = _roll_lanes(bd_pad, t)

    score = (jnp.concatenate([ac_big, ac_st], axis=-1)
                 .astype(jnp.float32)
             + bd_cat) * scale                                 # [BB,H,KL]
    lane = jax.lax.broadcasted_iota(jnp.int32, (BB, H, M + C), 2)
    # decode_chunk_step masks (same_length=False): big lanes
    # j < max(M - count, t); staged lanes s > t. And/or of comparisons —
    # Mosaic rejects jnp.where over boolean vectors (i8->i1 trunci).
    masked = (((lane < M) & (lane < jnp.maximum(M - count, t)))
              | ((lane >= M) & (lane > M + t)))
    neg = jnp.asarray(jnp.finfo(jnp.float32).min, jnp.float32)
    score = jnp.where(masked, neg, score)
    mx = jnp.max(score, axis=-1, keepdims=True)
    e = jnp.exp(score - mx)
    p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(cdtype)

    vcat = jnp.concatenate([v_ref[0], sv_new], axis=1)         # [BB,KL,HD]
    ctx_h = jax.lax.dot_general(
        p, vcat, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)                    # [BB,H,HD]
    ctx = jnp.sum(ctx_h * mh[None].astype(jnp.float32),
                  axis=1).astype(cdtype)                       # [BB, HD]

    attn = _dot(ctx, ow_ref[0]).astype(cdtype)
    if pre_lnorm:
        out = x + attn
        ff_in = _ln(out, lnfs_ref[0], lnfb_ref[0], eps_ln)
    else:
        out = _ln(x + attn, lnas_ref[0], lnab_ref[0], eps_ln)
        ff_in = out
    ff = jax.nn.relu(_dot(ff_in, ff1_ref[0]).astype(cdtype)
                     + fb1_ref[0].astype(cdtype))
    ff = _dot(ff, ff2_ref[0]).astype(cdtype) + fb2_ref[0].astype(cdtype)
    if pre_lnorm:
        x_new = out + ff
    else:
        x_new = _ln(out + ff, lnfs_ref[0], lnfb_ref[0], eps_ln)
    x_ref[pl.ds(bs, BB), :] = x_new.astype(cdtype)

    # ---- logits + gumbel argmax (once, after the last layer) ----
    @pl.when(jnp.logical_and(li == L - 1, bb == NB - 1))
    def _():
        xf = x_ref[:].astype(cdtype)                           # [B, HD]
        logits = (_dot(xf, embt_ref[:]).astype(cdtype)
                  + cb_ref[:].astype(cdtype)).astype(jnp.float32)
        z = logits + g_ref[:]                                  # [B, V]
        zmax = jnp.max(z, axis=-1, keepdims=True)
        lane = jax.lax.broadcasted_iota(jnp.int32, (B, V), 1)
        idx = jnp.min(jnp.where(z == zmax, lane, V), axis=-1,
                      keepdims=True)                           # [B, 1]
        ids_out[:] = idx
        oh_out[:] = (lane == idx).astype(jnp.float32)


def supports_fused_decode(cfg, bsz: int, M: int, C: int) -> bool:
    """Shape/feature gate; callers fall back to the jnp path otherwise."""
    return (cfg.cache_kv and cfg.use_pallas
            and _pick_bb(bsz) is not None
            and C <= _MAX_CHUNK
            and M % 8 == 0
            and not cfg.append_note_status)


@functools.lru_cache(maxsize=None)
def _make_decode_call(L, NB, BB, M, C, V, HD, DI, H, pre_lnorm, cdtype,
                      eps_ln, scale, interpret):
    cdtype = jnp.dtype(cdtype).type
    kernel = functools.partial(
        _decode_kernel, L=L, NB=NB, BB=BB, M=M, C=C, V=V, HD=HD,
        pre_lnorm=pre_lnorm, cdtype=cdtype, eps_ln=eps_ln, scale=scale)
    B = NB * BB

    def full(shape):
        return pl.BlockSpec(shape, lambda l, b, *_: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    def per_l(shape):
        return pl.BlockSpec((1,) + shape,
                            lambda l, b, *_: (l,) + (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    def per_lb(shape):
        return pl.BlockSpec((1, BB) + shape,
                            lambda l, b, *_: (l, b) + (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(L, NB),
        in_specs=[
            full((B, 1)),            # prev ids
            full((B, V)),            # gumbel g
            per_lb((M, HD)),         # K big
            per_lb((M, HD)),         # V big
            per_l((M + 1, HD)),      # R positional projections
            per_lb((C, HD)),         # SK staging
            per_lb((C, HD)),         # SV staging
            per_l((HD, HD)),         # q_w
            per_l((HD, HD)),         # k_w
            per_l((HD, HD)),         # v_w
            per_l((HD, HD)),         # o_w
            per_l((HD, DI)),         # ff_w1
            per_l((1, DI)),          # ff_b1
            per_l((DI, HD)),         # ff_w2
            per_l((1, HD)),          # ff_b2
            per_l((1, HD)),          # attn_ln_scale
            per_l((1, HD)),          # attn_ln_bias
            per_l((1, HD)),          # ff_ln_scale
            per_l((1, HD)),          # ff_ln_bias
            full((1, HD)),           # r_w_bias (flattened)
            full((1, HD)),           # r_r_bias
            full((H, HD)),           # head mask
            full((V, HD)),           # word_emb * sqrt(d)
            full((HD, V)),           # word_emb^T
            full((1, V)),            # crit_bias
        ],
        out_specs=[
            full((B, 1)),
            full((B, V)),
            per_lb((C, HD)),
            per_lb((C, HD)),
        ],
        scratch_shapes=[pltpu.VMEM((B, HD), cdtype),
                        pltpu.VMEM((BB, HD), cdtype),
                        pltpu.VMEM((BB, H, HD), cdtype),
                        pltpu.VMEM((BB, H, HD), cdtype)],
    )
    out_shape = [
        jax.ShapeDtypeStruct((B, 1), jnp.int32),
        jax.ShapeDtypeStruct((B, V), jnp.float32),
        jax.ShapeDtypeStruct((L, B, C, HD), cdtype),
        jax.ShapeDtypeStruct((L, B, C, HD), cdtype),
    ]
    return pl.pallas_call(
        kernel, grid_spec=grid_spec, out_shape=out_shape,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
    )


def stack_decode_params(params, cfg):
    """Stack per-layer weights into the kernel's [L, ...] operand layout.

    One-time per phase invocation (a handful of small concats). The qkv
    projection is split into q/k/v (lane slicing at d_model boundaries
    is exactly the unaligned-access pattern Mosaic rejects)."""
    cd = cfg.cdtype
    d, h, dh = cfg.d_model, cfg.n_head, cfg.d_head
    hd = h * dh
    layers = params["layers"]

    def st(key, part=None):
        ws = [l[key].astype(cd) for l in layers]
        if part is not None:
            ws = [w[:, part * hd:(part + 1) * hd] for w in ws]
        return jnp.stack(ws)

    emb = params["word_emb"].astype(cd)
    mask_h = (jnp.arange(hd)[None, :] // dh
              == jnp.arange(h)[:, None]).astype(cd)
    return {
        "q_w": st("qkv_w", 0),
        "k_w": st("qkv_w", 1),
        "v_w": st("qkv_w", 2),
        "o_w": st("o_w"),
        "ff1": st("ff_w1"),
        "fb1": jnp.stack([l["ff_b1"].astype(cd)[None] for l in layers]),
        "ff2": st("ff_w2"),
        "fb2": jnp.stack([l["ff_b2"].astype(cd)[None] for l in layers]),
        "ln_as": jnp.stack(
            [l["attn_ln_scale"].astype(cd)[None] for l in layers]),
        "ln_ab": jnp.stack(
            [l["attn_ln_bias"].astype(cd)[None] for l in layers]),
        "ln_fs": jnp.stack(
            [l["ff_ln_scale"].astype(cd)[None] for l in layers]),
        "ln_fb": jnp.stack(
            [l["ff_ln_bias"].astype(cd)[None] for l in layers]),
        "rwb": params["r_w_bias"].astype(cd).reshape(1, hd),
        "rrb": params["r_r_bias"].astype(cd).reshape(1, hd),
        "mask_h": mask_h,
        "emb_scaled": emb * (cfg.d_model ** 0.5),
        # logits weight: the embedding unless untied (crit_w present)
        "emb_t": params.get("crit_w", params["word_emb"]).astype(cd).T,
        "crit_bias": params["crit_bias"].astype(cd)[None],
    }


def _decode_chunk_kernel(sc_ref, ids0_ref, g_ref,
                         k_ref, v_ref, r_ref,
                         qw_ref, kw_ref, vw_ref, ow_ref,
                         ff1_ref, fb1_ref, ff2_ref, fb2_ref,
                         lnas_ref, lnab_ref, lnfs_ref, lnfb_ref,
                         rwb_ref, rrb_ref, mh_ref, embw_ref, embt_ref,
                         cb_ref,
                         ids_out, oh_out, sk_out, sv_out,
                         x_ref, tmp_ref, qhw_ref, qhr_ref, ids_s, *,
                         T, L, NB, BB, M, C, V, HD, pre_lnorm, cdtype,
                         eps_ln, scale, resident):
    """Whole-chunk sampler: grid (T, L, NB) — the T-token sequential
    sampling loop lives INSIDE one pallas_call. Differences from the
    per-token ``_decode_kernel``:

    * weights / K / V / R are FULL resident operands (constant
      index_map -> fetched once per launch, not once per token) read
      with the traced layer index;
    * the staged-K/V ring buffers ARE the ``sk_out``/``sv_out`` output
      refs (zeroed at t==0, read back for scores, written back to HBM
      once at the end);
    * the argmax feedback (next token's input id) is carried in the
      ``ids_s`` VMEM scratch across grid steps — sampling never leaves
      the chip's VMEM between tokens.

    Sample-exact vs the per-token kernel and the jnp oracle (same
    pre-transformed gumbel stream, same math)."""
    t = pl.program_id(0)
    li = pl.program_id(1)
    bb = pl.program_id(2)
    count = sc_ref[0]
    B = NB * BB
    bs = pl.multiple_of(bb * BB, BB)
    # resident mode: weights/K/V/staging are full operands read with the
    # traced layer index (fetched once per launch); streamed mode:
    # index-map-selected per-(l[,b]) blocks (the proven pattern; staging
    # round-trips through HBM between layer phases)
    wl = li if resident else 0

    @pl.when(jnp.logical_and(t == 0,
                             jnp.logical_and(li == 0, bb == 0)))
    def _():
        ids_s[:] = ids0_ref[:]

    # zero the staging ring once per (layer, batch-block): garbage lanes
    # would otherwise reach the ctx dot as 0 * NaN
    @pl.when(t == 0)
    def _():
        if resident:
            sk_out[li, pl.ds(bs, BB)] = jnp.zeros((BB, C, HD), cdtype)
            sv_out[li, pl.ds(bs, BB)] = jnp.zeros((BB, C, HD), cdtype)
        else:
            sk_out[0] = jnp.zeros((BB, C, HD), cdtype)
            sv_out[0] = jnp.zeros((BB, C, HD), cdtype)

    # ---- embed the previous token (once per t, before layer 0) ----
    @pl.when(jnp.logical_and(li == 0, bb == 0))
    def _():
        lane = jax.lax.broadcasted_iota(jnp.int32, (B, V), 1)
        oh = (lane == ids_s[:]).astype(cdtype)
        x_ref[:] = _dot(oh, embw_ref[:]).astype(cdtype)

    x = x_ref[pl.ds(bs, BB), :]                                # [BB, HD]
    if pre_lnorm:
        w_in = _ln(x, lnas_ref[wl], lnab_ref[wl], eps_ln)
    else:
        w_in = x

    q = _dot(w_in, qw_ref[wl]).astype(cdtype)                  # [BB, HD]
    k = _dot(w_in, kw_ref[wl]).astype(cdtype)
    v = _dot(w_in, vw_ref[wl]).astype(cdtype)

    # staged K/V ring write at chunk slot t (per-row, see _decode_kernel)
    def st_idx(b):
        return (li, bs + b) if resident else (0, b)

    srow = jax.lax.broadcasted_iota(jnp.int32, (C, HD), 0)
    tmp_ref[:] = k
    for b in range(BB):
        sk_out[st_idx(b)] = jnp.where(
            srow == t, jnp.broadcast_to(tmp_ref[b:b + 1, :], (C, HD)),
            sk_out[st_idx(b)])
    tmp_ref[:] = v
    for b in range(BB):
        sv_out[st_idx(b)] = jnp.where(
            srow == t, jnp.broadcast_to(tmp_ref[b:b + 1, :], (C, HD)),
            sv_out[st_idx(b)])
    if resident:
        sk_new = sk_out[li, pl.ds(bs, BB)]                     # [BB,C,HD]
        sv_new = sv_out[li, pl.ds(bs, BB)]
    else:
        sk_new = sk_out[0]
        sv_new = sv_out[0]

    # ---- relative-position attention over big cache + staging ----
    mh = mh_ref[:].astype(cdtype)                              # [H, HD]
    tmp_ref[:] = q + rwb_ref[:].astype(cdtype)
    for b in range(BB):
        qhw_ref[b] = tmp_ref[b:b + 1, :] * mh
    tmp_ref[:] = q + rrb_ref[:].astype(cdtype)
    for b in range(BB):
        qhr_ref[b] = tmp_ref[b:b + 1, :] * mh
    qHw = qhw_ref[:]                                           # [BB,H,HD]
    qHr = qhr_ref[:]

    if resident:
        k_big = k_ref[li, pl.ds(bs, BB)]                       # [BB,M,HD]
        v_big = v_ref[li, pl.ds(bs, BB)]
    else:
        k_big = k_ref[0]
        v_big = v_ref[0]
    ac_big = _bdot(qHw, k_big).astype(cdtype)                  # [BB,H,M]
    ac_st = _bdot(qHw, sk_new).astype(cdtype)                  # [BB,H,C]
    bd_rev = jax.lax.dot_general(
        qHr, r_ref[wl], (((2,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)                    # [BB,H,M+1]
    H = mh.shape[0]
    bd_pad = (jnp.concatenate(
        [bd_rev, jnp.zeros((BB, H, C - 1), jnp.float32)],
        axis=-1) if C > 1 else bd_rev)                         # [BB,H,M+C]
    bd_cat = _roll_lanes(bd_pad, t)

    score = (jnp.concatenate([ac_big, ac_st], axis=-1)
                 .astype(jnp.float32)
             + bd_cat) * scale                                 # [BB,H,KL]
    lane = jax.lax.broadcasted_iota(jnp.int32, (BB, H, M + C), 2)
    masked = (((lane < M) & (lane < jnp.maximum(M - count, t)))
              | ((lane >= M) & (lane > M + t)))
    neg = jnp.asarray(jnp.finfo(jnp.float32).min, jnp.float32)
    score = jnp.where(masked, neg, score)
    mx = jnp.max(score, axis=-1, keepdims=True)
    e = jnp.exp(score - mx)
    p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(cdtype)

    vcat = jnp.concatenate([v_big, sv_new], axis=1)            # [BB,KL,HD]
    ctx_h = jax.lax.dot_general(
        p, vcat, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)                    # [BB,H,HD]
    ctx = jnp.sum(ctx_h * mh[None].astype(jnp.float32),
                  axis=1).astype(cdtype)                       # [BB, HD]

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
    x_ref[pl.ds(bs, BB), :] = x_new.astype(cdtype)

    # ---- logits + gumbel argmax (once per t, after the last layer) ----
    @pl.when(jnp.logical_and(li == L - 1, bb == NB - 1))
    def _():
        xf = x_ref[:].astype(cdtype)                           # [B, HD]
        logits = (_dot(xf, embt_ref[:]).astype(cdtype)
                  + cb_ref[:].astype(cdtype)).astype(jnp.float32)
        z = logits + g_ref[0]                                  # [B, V]
        zmax = jnp.max(z, axis=-1, keepdims=True)
        lane = jax.lax.broadcasted_iota(jnp.int32, (B, V), 1)
        idx = jnp.min(jnp.where(z == zmax, lane, V), axis=-1,
                      keepdims=True)                           # [B, 1]
        ids_s[:] = idx
        oh_out[0] = (lane == idx).astype(jnp.float32)

        @pl.when(t == T - 1)
        def _():
            ids_out[:] = idx


@functools.lru_cache(maxsize=None)
def _make_decode_chunk_call(T, L, NB, BB, M, C, V, HD, DI, H, pre_lnorm,
                            cdtype, eps_ln, scale, resident, interpret):
    cdtype = jnp.dtype(cdtype).type
    kernel = functools.partial(
        _decode_chunk_kernel, T=T, L=L, NB=NB, BB=BB, M=M, C=C, V=V,
        HD=HD, pre_lnorm=pre_lnorm, cdtype=cdtype, eps_ln=eps_ln,
        scale=scale, resident=resident)
    B = NB * BB

    def full(shape):
        return pl.BlockSpec(shape, lambda t, l, b, *_: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    def per_t(shape):
        return pl.BlockSpec((1,) + shape,
                            lambda t, l, b, *_: (t,) + (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    def per_l(shape):
        return pl.BlockSpec((1,) + shape,
                            lambda t, l, b, *_: (l,) + (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    def per_lb(shape):
        return pl.BlockSpec((1, BB) + shape,
                            lambda t, l, b, *_: (l, b)
                            + (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    wspec = full if resident else per_l

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(T, L, NB),
        in_specs=[
            full((B, 1)),            # seed ids
            per_t((B, V)),           # gumbel g per step
            (full((L, B, M, HD)) if resident
             else per_lb((M, HD))),  # K big
            (full((L, B, M, HD)) if resident
             else per_lb((M, HD))),  # V big
            (full((L, M + 1, HD)) if resident
             else per_l((M + 1, HD))),   # R positional projections
            wspec((L, HD, HD)) if resident else wspec((HD, HD)),   # q_w
            wspec((L, HD, HD)) if resident else wspec((HD, HD)),   # k_w
            wspec((L, HD, HD)) if resident else wspec((HD, HD)),   # v_w
            wspec((L, HD, HD)) if resident else wspec((HD, HD)),   # o_w
            wspec((L, HD, DI)) if resident else wspec((HD, DI)),   # ff_w1
            wspec((L, 1, DI)) if resident else wspec((1, DI)),     # ff_b1
            wspec((L, DI, HD)) if resident else wspec((DI, HD)),   # ff_w2
            wspec((L, 1, HD)) if resident else wspec((1, HD)),     # ff_b2
            wspec((L, 1, HD)) if resident else wspec((1, HD)),     # ln_as
            wspec((L, 1, HD)) if resident else wspec((1, HD)),     # ln_ab
            wspec((L, 1, HD)) if resident else wspec((1, HD)),     # ln_fs
            wspec((L, 1, HD)) if resident else wspec((1, HD)),     # ln_fb
            full((1, HD)),           # r_w_bias
            full((1, HD)),           # r_r_bias
            full((H, HD)),           # head mask
            full((V, HD)),           # word_emb * sqrt(d)
            full((HD, V)),           # word_emb^T
            full((1, V)),            # crit_bias
        ],
        out_specs=[
            full((B, 1)),            # final ids
            per_t((B, V)),           # one-hots per step
            (full((L, B, C, HD)) if resident
             else per_lb((C, HD))),  # staged K ring
            (full((L, B, C, HD)) if resident
             else per_lb((C, HD))),  # staged V ring
        ],
        scratch_shapes=[pltpu.VMEM((B, HD), cdtype),
                        pltpu.VMEM((BB, HD), cdtype),
                        pltpu.VMEM((BB, H, HD), cdtype),
                        pltpu.VMEM((BB, H, HD), cdtype),
                        pltpu.VMEM((B, 1), jnp.int32)],
    )
    out_shape = [
        jax.ShapeDtypeStruct((B, 1), jnp.int32),
        jax.ShapeDtypeStruct((T, B, V), jnp.float32),
        jax.ShapeDtypeStruct((L, B, C, HD), cdtype),
        jax.ShapeDtypeStruct((L, B, C, HD), cdtype),
    ]
    return pl.pallas_call(
        kernel, grid_spec=grid_spec, out_shape=out_shape,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
    )


def decode_chunk_vmem_bytes(cfg, bsz: int, M: int, C: int) -> int:
    """Rough resident-VMEM footprint of the chunk sampler (operands +
    staging + scratch), for the dispatch gate."""
    L, HD, DI, V = (cfg.n_layer, cfg.n_head * cfg.d_head, cfg.d_inner,
                    cfg.n_token)
    bpe = 2 if jnp.dtype(cfg.cdtype).itemsize == 2 else 4
    kv = 2 * L * bsz * M * HD * bpe
    weights = L * (4 * HD * HD + 2 * HD * DI) * bpe
    r = L * (M + 1) * HD * bpe
    emb = 2 * V * HD * bpe
    staging = 2 * L * bsz * C * HD * bpe
    g_oh = 2 * bsz * V * 4
    scratch = (bsz * HD + 3 * 32 * HD) * bpe + bsz * V * 4
    return kv + weights + r + emb + staging + g_oh + scratch


def supports_fused_decode_chunk(cfg, bsz: int, M: int, C: int) -> bool:
    """Gate for the whole-chunk sampler: per-token constraints plus the
    resident operands must fit VMEM with headroom.

    Chip-validated (PERF.md "Whole-chunk sampler on chip"):
    tools/chunk_sampler_tpu.py recorded 100% sampled-id agreement with
    the per-token fused path and 45.2 ms vs 73.0 ms per 4-micro-chunk
    sampling pass, so the kernel is on by default. Set
    TGTPU_CHUNK_SAMPLER=0 to force the per-token fallback."""
    import os
    if os.environ.get("TGTPU_CHUNK_SAMPLER") == "0":
        return False
    return (supports_fused_decode(cfg, bsz, M, C)
            and decode_chunk_vmem_bytes(cfg, bsz, M, C)
            < int(_VMEM_LIMIT * 0.85))


def fused_decode_chunk(stacked, cfg, K, Vb, R, ids, g, count, n: int):
    """Sample ``n`` tokens in ONE kernel launch.

    K/Vb [L, B, M, HD]; R [L, M+1, HD]; ids [B, 1] int32 seed;
    g [n, B, V] pre-transformed gumbel noise (fp32); count: chunk-start
    valid big-cache slots. Returns (ids' [B,1], onehots [n, B, V],
    sk [L, B, C, HD], sv likewise) with C = _MAX_CHUNK-capped staging
    (first n rows valid).
    """
    L, B, M, HD = K.shape
    V = g.shape[2]
    C = max(n, 1)
    BB = _pick_bb(B)
    call = _make_decode_chunk_call(
        n, L, B // BB, BB, M, C, V, HD, cfg.d_inner, cfg.n_head,
        bool(cfg.pre_lnorm), jnp.dtype(cfg.cdtype).name, 1e-5,
        1.0 / (cfg.d_head ** 0.5), RESIDENT, INTERPRET)
    sc = jnp.asarray([count], jnp.int32)
    ids_f, oh, sk, sv = call(
        sc, ids, g,
        K, Vb, R,
        stacked["q_w"], stacked["k_w"], stacked["v_w"],
        stacked["o_w"], stacked["ff1"], stacked["fb1"],
        stacked["ff2"], stacked["fb2"],
        stacked["ln_as"], stacked["ln_ab"],
        stacked["ln_fs"], stacked["ln_fb"],
        stacked["rwb"], stacked["rrb"], stacked["mask_h"],
        stacked["emb_scaled"], stacked["emb_t"],
        stacked["crit_bias"])
    return ids_f, oh, sk, sv


def fused_decode_step(stacked, cfg, K, Vb, R, sk, sv, ids, g, sc):
    """One fused sampling step.

    K/Vb [L, B, M, HD]; R [L, M+1, HD]; sk/sv [L, B, C, HD];
    ids [B, 1] int32; g [B, V] pre-transformed gumbel noise (fp32);
    sc [2] int32 = (chunk step t, big-buffer valid count).
    Returns (ids' [B,1], onehot [B,V] fp32, sk', sv').
    """
    L, B, M, HD = K.shape
    C = sk.shape[2]
    V = g.shape[1]
    BB = _pick_bb(B)
    call = _make_decode_call(
        L, B // BB, BB, M, C, V, HD, cfg.d_inner, cfg.n_head,
        bool(cfg.pre_lnorm), jnp.dtype(cfg.cdtype).name, 1e-5,
        1.0 / (cfg.d_head ** 0.5), INTERPRET)
    return call(sc, ids, g,
                K, Vb, R, sk, sv,
                stacked["q_w"], stacked["k_w"], stacked["v_w"],
                stacked["o_w"], stacked["ff1"], stacked["fb1"],
                stacked["ff2"], stacked["fb2"],
                stacked["ln_as"], stacked["ln_ab"],
                stacked["ln_fs"], stacked["ln_fb"],
                stacked["rwb"], stacked["rrb"], stacked["mask_h"],
                stacked["emb_scaled"], stacked["emb_t"],
                stacked["crit_bias"])
