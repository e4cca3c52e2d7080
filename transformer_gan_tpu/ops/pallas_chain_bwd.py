"""Fused chain-backward kernel for full-backprop GAN sampling.

With ``truncate_backprop: False`` the straight-through sample chain
carries real gradient: input_{t+1} = hard_t + y_t - sg(y_t), so the
adjoint of the sampled trajectory is a sequential recursion over steps
(reference transformer_gan.py:308-320 with per-chunk backward; here the
exact decomposition in models/gan.py ``_chunk_st_fullchain``). The K/V
cache is detached every step (reference ``_update_mems``,
mem_transformer.py:461-482), so the ONLY quantity that must travel
sequentially is the [bsz, V] input cotangent ``chi`` — all parameter
gradients come from one batched window pullback afterwards.

This kernel runs that entire reverse recursion in ONE ``pallas_call``
per chunk. Grid ``(n, 2L, B/BB)`` — token index major (processed in
reverse trajectory order), then L forward-recompute phases followed by
L backward phases per token, batch blocks minor:

* forward phases recompute the token's activations from its input id
  and the full lane buffers (the window-computed K/V ARE the per-token
  projections, so the fwd recomputes only queries), saving per-layer
  x / z1 / z2 / ff_pre / attention probs / per-head queries in VMEM
  scratch;
* the first backward phase converts ``chi`` + the straight-through
  cotangent into the step's logits cotangent ``q_t`` (softmax-of-
  (logits+g)/T backward) and writes it to the Q output;
* backward phases propagate ONLY dx through each layer (FF, layer
  norms, attention with every cross K/V lane constant and the token's
  own lane live — mirroring ``rel_attention_kv`` detach_kv_cross), with
  no parameter-cotangent work at all;
* the last backward phase pushes dx through the embedding to produce
  the next (earlier) token's ``chi``. ``chi`` lives in VMEM scratch for
  the whole grid — it never touches HBM.

Lane algebra (full-lane frame [mem(M) || window(n)], see
xl.decode_recompute_window): token t attends to lanes
[max(M - count, t), M + t]; lane j sits at relative distance M + t - j,
so the positional term is one roll of the distance-reversed projection
rows by ``t`` (binary-decomposition rolls, pallas_decode idiom).

Gradient oracle: the jnp chain scan in ``_chunk_st_fullchain_bwd``
(itself equivalence-tested against the sequential decode scan);
interpret-mode tests assert Q equality (tests/test_gan_fullchain.py).
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
from ._pallas_common import pick_bb as _pick_bb
from ._pallas_common import roll_lanes as _roll_lanes

INTERPRET = False

# Two kernel variants, selected by GanConfig.chain_bwd: "kernel"/"auto"
# stream the window pass's saved activations per (token, layer)
# (_chain_res_kernel — half the grid steps and K/V restreaming);
# "kernel_recompute" recomputes each token's forward in-kernel
# (_chain_kernel). Oracle equality tests cover both
# (tests/test_gan_fullchain.py).


def _dot_t(a, b):
    """[X, D] x [Y, D] -> [X, Y] (contract last with last: a @ b.T)."""
    return jax.lax.dot_general(a, b, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _bdot_k(a, b):
    """[B, X, K] x [B, K, D] -> [B, X, D] (batch 0, contract a2/b1)."""
    return jax.lax.dot_general(a, b, (((2,), (1,)), ((0,), (0,))),
                               preferred_element_type=jnp.float32)


def _ln_fwd(z, scale_row, bias_row, eps):
    z32 = z.astype(jnp.float32)
    mean = jnp.mean(z32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(z32 - mean), axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    y = (z32 - mean) * rstd
    return (y * scale_row.astype(jnp.float32)
            + bias_row.astype(jnp.float32)), y, rstd


def _ln_bwd(dy, z, scale_row, eps):
    """d/dz of layer_norm(z) given upstream dy (fp32)."""
    z32 = z.astype(jnp.float32)
    mean = jnp.mean(z32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(z32 - mean), axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    zh = (z32 - mean) * rstd
    dyg = dy.astype(jnp.float32) * scale_row.astype(jnp.float32)
    return (dyg - jnp.mean(dyg, axis=-1, keepdims=True)
            - zh * jnp.mean(dyg * zh, axis=-1, keepdims=True)) * rstd


def _chain_kernel(sc_ref, ids_ref, s_ref, y_ref, temp_ref,
                  k_ref, v_ref, r_ref,
                  qw_ref, kw_ref, vw_ref, ow_ref,
                  ff1_ref, fb1_ref, ff2_ref, fb2_ref,
                  lnas_ref, lnab_ref, lnfs_ref, lnfb_ref,
                  rwb_ref, rrb_ref, mh_ref, embw_ref, embt_ref,
                  q_out,
                  x_ref, dx_ref, chi_ref,
                  xs_ref, z1s_ref, z2s_ref, ffps_ref, ps_ref,
                  qhws_ref, qhrs_ref, row_ref, h3_ref, *,
                  n, L, NB, BB, M, KL, V, HD, DI, H, pre_lnorm, cdtype,
                  eps_ln, scale):
    i = pl.program_id(0)
    p = pl.program_id(1)
    bb = pl.program_id(2)
    t = n - 1 - i
    count = sc_ref[0]
    B = NB * BB
    bs = pl.multiple_of(bb * BB, BB)

    mh = mh_ref[:].astype(cdtype)                               # [H, HD]

    is_fwd = p < L

    @pl.when(jnp.logical_and(i == 0,
                             jnp.logical_and(p == 0, bb == 0)))
    def _():
        chi_ref[:] = jnp.zeros((B, V), jnp.float32)

    # ---------------- forward recompute phases ----------------
    @pl.when(is_fwd)
    def _fwd():
        @pl.when(jnp.logical_and(p == 0, bb == 0))
        def _():
            lane = jax.lax.broadcasted_iota(jnp.int32, (B, V), 1)
            oh = (lane == ids_ref[0]).astype(cdtype)
            x_ref[:] = _dot(oh, embw_ref[:]).astype(cdtype)

        x = x_ref[pl.ds(bs, BB), :]                             # [BB, HD]
        xs_ref[p, pl.ds(bs, BB)] = x
        if pre_lnorm:
            w_in, _, _ = _ln_fwd(x, lnas_ref[0], lnab_ref[0], eps_ln)
            w_in = w_in.astype(cdtype)
        else:
            w_in = x
        q = _dot(w_in, qw_ref[0]).astype(cdtype)                # [BB, HD]

        # per-head masked queries, one sublane-broadcast row at a time
        row_ref[:] = q + rwb_ref[:].astype(cdtype)
        for r in range(BB):
            qhws_ref[p, bs + r] = row_ref[r:r + 1, :] * mh
        row_ref[:] = q + rrb_ref[:].astype(cdtype)
        for r in range(BB):
            qhrs_ref[p, bs + r] = row_ref[r:r + 1, :] * mh
        qHw = qhws_ref[p, pl.ds(bs, BB)]                        # [BB,H,HD]
        qHr = qhrs_ref[p, pl.ds(bs, BB)]

        ac = _bdot(qHw, k_ref[0])                               # [BB,H,KL]
        # r_ref holds the distance-reversed rows zero-padded to KL, so
        # the product IS bd_pad directly (padded rows -> zero lanes)
        bd_pad = jax.lax.dot_general(
            qHr, r_ref[0], (((2,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)                 # [BB,H,KL]
        bd = _roll_lanes(bd_pad, t)

        score = (ac + bd) * scale                               # f32
        lane = jax.lax.broadcasted_iota(jnp.int32, (BB, H, KL), 2)
        masked = ((lane < jnp.maximum(M - count, t)) | (lane > M + t))
        neg = jnp.asarray(jnp.finfo(jnp.float32).min, jnp.float32)
        score = jnp.where(masked, neg, score)
        mx = jnp.max(score, axis=-1, keepdims=True)
        e = jnp.exp(score - mx)
        prob = e / jnp.sum(e, axis=-1, keepdims=True)           # f32
        ps_ref[p, pl.ds(bs, BB)] = prob

        ctx_h = _bdot_k(prob.astype(cdtype), v_ref[0])          # [BB,H,HD]
        ctx = jnp.sum(ctx_h * mh[None].astype(jnp.float32),
                      axis=1).astype(cdtype)                    # [BB, HD]
        attn = _dot(ctx, ow_ref[0]).astype(cdtype)
        z1 = x + attn
        z1s_ref[p, pl.ds(bs, BB)] = z1
        if pre_lnorm:
            h1 = z1
            ff_in, _, _ = _ln_fwd(z1, lnfs_ref[0], lnfb_ref[0], eps_ln)
            ff_in = ff_in.astype(cdtype)
        else:
            h1o, _, _ = _ln_fwd(z1, lnas_ref[0], lnab_ref[0], eps_ln)
            h1 = h1o.astype(cdtype)
            ff_in = h1
        ff_pre = (_dot(ff_in, ff1_ref[0]).astype(cdtype)
                  + fb1_ref[0].astype(cdtype))
        ffps_ref[p, pl.ds(bs, BB)] = ff_pre
        ff = _dot(jax.nn.relu(ff_pre), ff2_ref[0]).astype(cdtype) \
            + fb2_ref[0].astype(cdtype)
        z2 = h1 + ff
        z2s_ref[p, pl.ds(bs, BB)] = z2
        if pre_lnorm:
            x_new = z2
        else:
            xo, _, _ = _ln_fwd(z2, lnfs_ref[0], lnfb_ref[0], eps_ln)
            x_new = xo.astype(cdtype)
        x_ref[pl.ds(bs, BB), :] = x_new

    # ---------------- backward phases ----------------
    @pl.when(jnp.logical_not(is_fwd))
    def _bwd():
        l = 2 * L - 1 - p

        # first backward phase: straight-through + softmax backward ->
        # logits cotangent q_t; seed dx with the logits head transpose
        @pl.when(jnp.logical_and(p == L, bb == 0))
        def _():
            T = temp_ref[0, 0]
            m = s_ref[0] + chi_ref[:]                           # [B, V]
            y = y_ref[0]
            qv = (y * (m - jnp.sum(m * y, axis=-1, keepdims=True))) / T
            q_out[0] = qv
            dx_ref[:] = jax.lax.dot_general(
                qv.astype(cdtype), embt_ref[:], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)             # [B, HD]

        dxp = dx_ref[pl.ds(bs, BB), :]                          # f32
        x = xs_ref[l, pl.ds(bs, BB)]
        z1 = z1s_ref[l, pl.ds(bs, BB)]
        z2 = z2s_ref[l, pl.ds(bs, BB)]
        ff_pre = ffps_ref[l, pl.ds(bs, BB)]
        prob = ps_ref[l, pl.ds(bs, BB)]                         # f32
        qHw = qhws_ref[l, pl.ds(bs, BB)]
        qHr = qhrs_ref[l, pl.ds(bs, BB)]

        # FF + norms
        if pre_lnorm:
            dz2 = dxp                                           # x' = z2
        else:
            dz2 = _ln_bwd(dxp, z2, lnfs_ref[0], eps_ln)
        dff1 = _dot_t(dz2.astype(cdtype), ff2_ref[0])           # [BB, DI]
        dffpre = jnp.where(ff_pre.astype(jnp.float32) > 0, dff1, 0.0)
        dffin = _dot_t(dffpre.astype(cdtype), ff1_ref[0])       # [BB, HD]
        if pre_lnorm:
            # z2 = z1 + ff, ff_in = LN_f(z1)
            dz1 = dz2 + _ln_bwd(dffin, z1, lnfs_ref[0], eps_ln)
        else:
            # z2 = h1 + ff, ff_in = h1 = LN_a(z1)
            dh1 = dz2 + dffin
            dz1 = _ln_bwd(dh1, z1, lnas_ref[0], eps_ln)
        dattn = dz1
        dx_acc = dz1                                            # residual

        # attention backward (cross lanes constant, self lane live)
        dctx = _dot_t(dattn.astype(cdtype), ow_ref[0])          # [BB, HD]
        row_ref[:] = dctx.astype(cdtype)
        for r in range(BB):
            h3_ref[r] = row_ref[r:r + 1, :] * mh
        dctx_h = h3_ref[:BB]                                    # [BB,H,HD]
        dp = _bdot(dctx_h.astype(cdtype), v_ref[0])             # [BB,H,KL]
        pdp = prob * dp
        ds = (prob * (dp - jnp.sum(pdp, axis=-1, keepdims=True))
              ) * scale                                         # f32

        lane = jax.lax.broadcasted_iota(jnp.int32, (BB, H, KL), 2)
        is_self = lane == (M + t)
        ds_self = jnp.sum(jnp.where(is_self, ds, 0.0), axis=2)  # [BB,H]
        p_self = jnp.sum(jnp.where(is_self, prob, 0.0), axis=2)

        dk_self = jnp.sum(
            ds_self[:, :, None] * qHw.astype(jnp.float32), axis=1)
        dv_self = jnp.sum(
            p_self[:, :, None] * dctx_h.astype(jnp.float32), axis=1)

        dqw_h = _bdot_k(ds.astype(cdtype), k_ref[0])            # [BB,H,HD]
        # adjoint of bd = roll(bd_pad, t): roll ds back by t. ds is zero
        # on every masked lane (softmax prob there is exactly 0), so the
        # lanes that land on the zero-padded r rows contribute nothing.
        dbd = _roll_lanes(ds, (KL - t) % KL)
        dqr_h = jax.lax.dot_general(
            dbd.astype(cdtype), r_ref[0], (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)                 # [BB,H,HD]
        dq = jnp.sum((dqw_h + dqr_h) * mh[None].astype(jnp.float32),
                     axis=1)                                    # [BB, HD]

        dwin = (_dot_t(dq.astype(cdtype), qw_ref[0])
                + _dot_t(dk_self.astype(cdtype), kw_ref[0])
                + _dot_t(dv_self.astype(cdtype), vw_ref[0]))
        if pre_lnorm:
            dx_total = dx_acc + _ln_bwd(dwin, x, lnas_ref[0], eps_ln)
        else:
            dx_total = dx_acc + dwin
        dx_ref[pl.ds(bs, BB), :] = dx_total

        # last backward phase: embedding transpose -> chi for token t-1
        @pl.when(p == 2 * L - 1)
        def _():
            chi_ref[pl.ds(bs, BB), :] = jax.lax.dot_general(
                dx_total.astype(cdtype), embw_ref[:],
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)             # [BB, V]


def _chain_res_kernel(sc_ref, s_ref, y_ref, temp_ref,
                      k_ref, v_ref, r_ref,
                      qw_ref, kw_ref, vw_ref, ow_ref,
                      ff1_ref, ff2_ref,
                      lnas_ref, lnab_ref, lnfs_ref,
                      rwb_ref, mh_ref, embw_ref, embt_ref,
                      xs_ref, z1_ref, z2_ref, ffp_ref, prob_ref,
                      q_out,
                      dx_ref, chi_ref, row_ref, h3_ref, qh_ref, *,
                      n, L, NB, BB, M, KL, V, HD, DI, H, pre_lnorm,
                      cdtype, eps_ln, scale, resident_kv):
    """Residual-streaming variant of ``_chain_kernel``: the L
    forward-recompute phases are gone — the batched window pass
    (xl.decode_recompute_window collect_residuals=True) already computed
    every token's activations, and this kernel streams them per
    (token, layer) from HBM instead of recomputing them per token.
    Grid ``(n, L, NB)``: token index major (reverse trajectory order),
    one BACKWARD phase per layer (p -> layer L-1-p), batch blocks minor.
    Halves the grid steps and the K/V re-streaming of the recompute
    variant; per-(t,l) it only recomputes the per-head queries (one
    [BB,HD]x[HD,HD] matmul) rather than streaming them.

    Residual blocks arrive in kernel lane frame: xs/z1/z2 [n,L,B,HD],
    ff_pre [n,L,B,DI] (sign only is consumed), prob [n,L,B,H,KL] fp32
    with exact zeros on masked/padded lanes (window softmax of
    finfo.min scores), which keeps ds zero there — the roll/self-lane
    algebra below is unchanged from ``_chain_kernel``."""
    i = pl.program_id(0)
    p = pl.program_id(1)
    bb = pl.program_id(2)
    t = n - 1 - i
    # sc_ref (valid-count scalar) is prefetched for index-map parity with
    # _chain_kernel but not consumed here: masking is inherited from the
    # residual probs' exact zeros on masked/padded lanes.
    B = NB * BB
    bs = pl.multiple_of(bb * BB, BB)

    mh = mh_ref[:].astype(cdtype)                               # [H, HD]

    @pl.when(jnp.logical_and(i == 0,
                             jnp.logical_and(p == 0, bb == 0)))
    def _():
        chi_ref[:] = jnp.zeros((B, V), jnp.float32)

    # first phase of each token: straight-through + softmax backward ->
    # logits cotangent q_t; seed dx with the logits head transpose
    @pl.when(jnp.logical_and(p == 0, bb == 0))
    def _():
        T = temp_ref[0, 0]
        m = s_ref[0] + chi_ref[:]                               # [B, V]
        y = y_ref[0]
        qv = (y * (m - jnp.sum(m * y, axis=-1, keepdims=True))) / T
        q_out[0] = qv
        dx_ref[:] = jax.lax.dot_general(
            qv.astype(cdtype), embt_ref[:], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)                 # [B, HD]

    dxp = dx_ref[pl.ds(bs, BB), :]                              # f32
    x = xs_ref[0, 0, pl.ds(bs, BB)]                             # [BB,HD]
    z1 = z1_ref[0, 0, pl.ds(bs, BB)]
    z2 = z2_ref[0, 0, pl.ds(bs, BB)]
    ff_pre = ffp_ref[0, 0, pl.ds(bs, BB)]
    prob = prob_ref[0, 0, pl.ds(bs, BB)]                        # f32
    if resident_kv:
        # whole [L, B, KL, HD] K/V resident in VMEM (fetched once per
        # launch): traced-leading-index reads, no per-(t, l) restream
        li = L - 1 - p
        kblk = k_ref[li, pl.ds(bs, BB)]                         # [BB,KL,HD]
        vblk = v_ref[li, pl.ds(bs, BB)]
    else:
        kblk = k_ref[0]
        vblk = v_ref[0]

    # recompute the rw-biased per-head queries from the layer input
    if pre_lnorm:
        w_in, _, _ = _ln_fwd(x, lnas_ref[0], lnab_ref[0], eps_ln)
        w_in = w_in.astype(cdtype)
    else:
        w_in = x
    q = _dot(w_in, qw_ref[0]).astype(cdtype)                    # [BB,HD]
    row_ref[:] = q + rwb_ref[:].astype(cdtype)
    for r in range(BB):
        qh_ref[r] = row_ref[r:r + 1, :] * mh
    qHw = qh_ref[:BB]                                           # [BB,H,HD]

    # FF + norms
    if pre_lnorm:
        dz2 = dxp                                               # x' = z2
    else:
        dz2 = _ln_bwd(dxp, z2, lnfs_ref[0], eps_ln)
    dff1 = _dot_t(dz2.astype(cdtype), ff2_ref[0])               # [BB, DI]
    dffpre = jnp.where(ff_pre.astype(jnp.float32) > 0, dff1, 0.0)
    dffin = _dot_t(dffpre.astype(cdtype), ff1_ref[0])           # [BB, HD]
    if pre_lnorm:
        # z2 = z1 + ff, ff_in = LN_f(z1)
        dz1 = dz2 + _ln_bwd(dffin, z1, lnfs_ref[0], eps_ln)
    else:
        # z2 = h1 + ff, ff_in = h1 = LN_a(z1)
        dh1 = dz2 + dffin
        dz1 = _ln_bwd(dh1, z1, lnas_ref[0], eps_ln)
    dattn = dz1
    dx_acc = dz1                                                # residual

    # attention backward (cross lanes constant, self lane live)
    dctx = _dot_t(dattn.astype(cdtype), ow_ref[0])              # [BB, HD]
    row_ref[:] = dctx.astype(cdtype)
    for r in range(BB):
        h3_ref[r] = row_ref[r:r + 1, :] * mh
    dctx_h = h3_ref[:BB]                                        # [BB,H,HD]
    dp = _bdot(dctx_h.astype(cdtype), vblk)                     # [BB,H,KL]
    pdp = prob * dp
    ds = (prob * (dp - jnp.sum(pdp, axis=-1, keepdims=True))
          ) * scale                                             # f32

    lane = jax.lax.broadcasted_iota(jnp.int32, (BB, H, KL), 2)
    is_self = lane == (M + t)
    ds_self = jnp.sum(jnp.where(is_self, ds, 0.0), axis=2)      # [BB,H]
    p_self = jnp.sum(jnp.where(is_self, prob, 0.0), axis=2)

    dk_self = jnp.sum(
        ds_self[:, :, None] * qHw.astype(jnp.float32), axis=1)
    dv_self = jnp.sum(
        p_self[:, :, None] * dctx_h.astype(jnp.float32), axis=1)

    dqw_h = _bdot_k(ds.astype(cdtype), kblk)                    # [BB,H,HD]
    # adjoint of bd = roll(bd_pad, t): roll ds back by t. ds is zero
    # on every masked lane (softmax prob there is exactly 0), so the
    # lanes that land on the zero-padded r rows contribute nothing.
    dbd = _roll_lanes(ds, (KL - t) % KL)
    dqr_h = jax.lax.dot_general(
        dbd.astype(cdtype), r_ref[0], (((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                     # [BB,H,HD]
    dq = jnp.sum((dqw_h + dqr_h) * mh[None].astype(jnp.float32),
                 axis=1)                                        # [BB, HD]

    dwin = (_dot_t(dq.astype(cdtype), qw_ref[0])
            + _dot_t(dk_self.astype(cdtype), kw_ref[0])
            + _dot_t(dv_self.astype(cdtype), vw_ref[0]))
    if pre_lnorm:
        dx_total = dx_acc + _ln_bwd(dwin, x, lnas_ref[0], eps_ln)
    else:
        dx_total = dx_acc + dwin
    dx_ref[pl.ds(bs, BB), :] = dx_total

    # last phase: embedding transpose -> chi for token t-1
    @pl.when(p == L - 1)
    def _():
        chi_ref[pl.ds(bs, BB), :] = jax.lax.dot_general(
            dx_total.astype(cdtype), embw_ref[:],
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)                 # [BB, V]


def supports_chain_bwd(cfg, bsz: int, M: int, n: int) -> bool:
    """Shape/feature gate; callers fall back to the jnp chain scan."""
    return (cfg.cache_kv and cfg.use_pallas
            and _pick_bb(bsz) is not None
            and 1 <= n <= M
            and M + n <= 256          # roll decomposition budget
            and M % 8 == 0
            and not cfg.append_note_status)


def _make_specs(n, BB, layer_of):
    """BlockSpec builders shared by the two chain-kernel variants over a
    (token i, phase p, batch-block b) grid; ``layer_of(p)`` maps the
    phase index to the layer a per-layer operand should stream (the
    self-recomputing kernel folds 2L fwd+bwd phases, the residual kernel
    runs L backward-only phases)."""

    def per_t(shape):
        return pl.BlockSpec((1,) + shape,
                            lambda i, p, b, *_: (n - 1 - i,)
                            + (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    def per_l(shape):
        return pl.BlockSpec((1,) + shape,
                            lambda i, p, b, *_: (layer_of(p),)
                            + (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    def per_lb(shape):
        return pl.BlockSpec((1, BB) + shape,
                            lambda i, p, b, *_: (layer_of(p), b)
                            + (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    def full(shape):
        return pl.BlockSpec(shape, lambda i, p, b, *_: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    return per_t, per_l, per_lb, full


def _pad_lane_buffers(kf, vf, r_heads, KL, KL0, M, HD):
    """Zero-pad the K/V lane buffers and the distance-reversed positional
    rows (M+1 -> KL) to the sublane-aligned lane count. Shared by both
    chain-kernel wrappers — the padding contract must stay identical."""
    rows = KL - KL0
    if rows:
        def pad(a):
            return jnp.concatenate(
                [a, jnp.zeros(a.shape[:2] + (rows, HD), a.dtype)], axis=2)

        kf, vf = pad(kf), pad(vf)
    if KL > M + 1:
        r_heads = jnp.concatenate(
            [r_heads, jnp.zeros((r_heads.shape[0], KL - (M + 1), HD),
                                r_heads.dtype)], axis=1)
    return kf, vf, r_heads


@functools.lru_cache(maxsize=None)
def _make_chain_call(n, L, NB, BB, M, KL, V, HD, DI, H, pre_lnorm, cdtype,
                     eps_ln, scale, interpret):
    """KL >= M + n: lane buffers may be zero-padded for sublane
    alignment — the roll algebra touches only lanes [t, M+t] for valid
    positions (no wrap there), and ds is zero on every masked lane, so
    padding is exact."""
    cdtype = jnp.dtype(cdtype).type
    kernel = functools.partial(
        _chain_kernel, n=n, L=L, NB=NB, BB=BB, M=M, KL=KL, V=V, HD=HD,
        DI=DI, H=H, pre_lnorm=pre_lnorm, cdtype=cdtype, eps_ln=eps_ln,
        scale=scale)
    B = NB * BB

    def lof(pp):
        return jnp.where(pp < L, pp, 2 * L - 1 - pp)

    per_t, per_l, per_lb, full = _make_specs(n, BB, lof)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n, 2 * L, NB),
        in_specs=[
            per_t((B, 1)),           # input ids per step [n, B, 1]
            per_t((B, V)),           # straight-through cotangents S
            per_t((B, V)),           # saved softmax outputs Y
            full((1, 1)),            # temperature
            per_lb((KL, HD)),        # K full lanes
            per_lb((KL, HD)),        # V full lanes
            per_l((KL, HD)),         # positional projections, dist-rev
                                     # rows zero-padded M+1 -> KL
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
            full((1, HD)),           # r_w_bias
            full((1, HD)),           # r_r_bias
            full((H, HD)),           # head mask
            full((V, HD)),           # word_emb * sqrt(d)
            full((HD, V)),           # word_emb^T
        ],
        out_specs=[per_t((B, V))],   # logits cotangents Q [n, B, V]
        scratch_shapes=[
            pltpu.VMEM((B, HD), cdtype),             # x carry (fwd)
            pltpu.VMEM((B, HD), jnp.float32),        # dx carry (bwd)
            pltpu.VMEM((B, V), jnp.float32),         # chi carry
            pltpu.VMEM((L, B, HD), cdtype),          # x per layer
            pltpu.VMEM((L, B, HD), cdtype),          # z1 per layer
            pltpu.VMEM((L, B, HD), cdtype),          # z2 per layer
            pltpu.VMEM((L, B, DI), cdtype),          # ff_pre per layer
            pltpu.VMEM((L, B, H, KL), jnp.float32),  # probs per layer
            pltpu.VMEM((L, B, H, HD), cdtype),       # qHw per layer
            pltpu.VMEM((L, B, H, HD), cdtype),       # qHr per layer
            pltpu.VMEM((BB, HD), cdtype),            # row broadcast tmp
            pltpu.VMEM((BB, H, HD), cdtype),         # per-head tmp
        ],
    )
    return pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((n, B, V), jnp.float32)],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
    )


@functools.lru_cache(maxsize=None)
def _make_chain_res_call(n, L, NB, BB, M, KL, V, HD, DI, H, pre_lnorm,
                         cdtype, eps_ln, scale, resident_kv, interpret):
    """Builder for the residual-streaming kernel (see _chain_res_kernel).
    Same lane-padding contract as _make_chain_call; the prob residual is
    zero on padded lanes by construction. ``resident_kv``: hold the
    whole [L, B, KL, HD] K/V in VMEM for the launch instead of
    restreaming per (token, layer) — gated by chain_res_kv_vmem_bytes."""
    cdtype = jnp.dtype(cdtype).type
    kernel = functools.partial(
        _chain_res_kernel, n=n, L=L, NB=NB, BB=BB, M=M, KL=KL, V=V,
        HD=HD, DI=DI, H=H, pre_lnorm=pre_lnorm, cdtype=cdtype,
        eps_ln=eps_ln, scale=scale, resident_kv=resident_kv)
    B = NB * BB

    per_t, per_l, per_lb, full = _make_specs(n, BB, lambda p: L - 1 - p)

    def per_tl(shape):
        return pl.BlockSpec((1, 1) + shape,
                            lambda i, p, b, *_: (n - 1 - i, L - 1 - p)
                            + (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n, L, NB),
        in_specs=[
            per_t((B, V)),           # straight-through cotangents S
            per_t((B, V)),           # saved softmax outputs Y
            full((1, 1)),            # temperature
            (full((L, B, KL, HD)) if resident_kv
             else per_lb((KL, HD))),  # K full lanes
            (full((L, B, KL, HD)) if resident_kv
             else per_lb((KL, HD))),  # V full lanes
            per_l((KL, HD)),         # positional projections, dist-rev
            per_l((HD, HD)),         # q_w
            per_l((HD, HD)),         # k_w
            per_l((HD, HD)),         # v_w
            per_l((HD, HD)),         # o_w
            per_l((HD, DI)),         # ff_w1
            per_l((DI, HD)),         # ff_w2
            per_l((1, HD)),          # attn_ln_scale
            per_l((1, HD)),          # attn_ln_bias
            per_l((1, HD)),          # ff_ln_scale
            full((1, HD)),           # r_w_bias
            full((H, HD)),           # head mask
            full((V, HD)),           # word_emb * sqrt(d)
            full((HD, V)),           # word_emb^T
            per_tl((B, HD)),         # xs residual
            per_tl((B, HD)),         # z1 residual
            per_tl((B, HD)),         # z2 residual
            per_tl((B, DI)),         # ff_pre residual
            per_tl((B, H, KL)),      # prob residual (fp32)
        ],
        out_specs=[per_t((B, V))],   # logits cotangents Q [n, B, V]
        scratch_shapes=[
            pltpu.VMEM((B, HD), jnp.float32),        # dx carry
            pltpu.VMEM((B, V), jnp.float32),         # chi carry
            pltpu.VMEM((BB, HD), cdtype),            # row broadcast tmp
            pltpu.VMEM((BB, H, HD), cdtype),         # dctx per-head tmp
            pltpu.VMEM((BB, H, HD), cdtype),         # qHw tmp
        ],
    )
    return pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((n, B, V), jnp.float32)],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
    )


def _pick_bb_stream(B: int, KL: int, HD: int, itemsize: int) -> int | None:
    """Batch-block size for the STREAMED-K/V path. The matmuls run at BB
    sublane rows (32 rows cap the MXU at ~25-33% of peak), so prefer the
    widest block whose streamed K+V blocks (double-buffered) leave room
    for the weights/residual streams under VMEM_LIMIT. Resident-K/V
    launches keep the classic pick (VMEM is spent on the resident pair
    instead)."""
    hd_pad = -(-HD // 128) * 128
    for bb in (64, 32, 16, 8):
        if B % bb == 0 and 4 * bb * KL * hd_pad * itemsize \
                <= 72 * 1024 * 1024:
            return min(bb, B)
    return _pick_bb(B)


def chain_res_kv_vmem_bytes(cfg, B: int, KL: int) -> int:
    """VMEM bytes of a resident [L, B, KL, HD] K+V pair (lane-padded)."""
    HD = cfg.n_head * cfg.d_head
    bpe = 2 if jnp.dtype(cfg.cdtype).itemsize == 2 else 4
    return 2 * cfg.n_layer * B * KL * (-(-HD // 128) * 128) * bpe


# Resident-K/V VMEM budget: the double-buffered streamed blocks
# (weights ~8.4 MB, residuals ~1.2 MB, S/Y/Q/r/emb ~1.5 MB) plus
# scratch need ~12 MB; leave 15 MB of the kernel budget for them.
# (The spanbert gen op-point's resident pair is 75.5 MB -> resident.)
_RES_KV_BUDGET = _VMEM_LIMIT - 15 * 1024 * 1024


def chain_bwd_q_res(stacked, cfg, kf, vf, r_heads, S, Y, count,
                    temperature, res):
    """Residual-streaming variant of ``chain_bwd_q``: consumes the
    window pass's saved activations (xl.decode_recompute_window
    collect_residuals=True) instead of recomputing each token's forward
    in-kernel. res: dict with x/z1/z2 [L, n, B, HD], ff_pre
    [L, n, B, DI] (compute dtype), prob [L, B, H, n, KL0] fp32."""
    L, B, KL0, HD = kf.shape
    n = S.shape[0]
    M = KL0 - n
    V = S.shape[2]
    KL = -(-KL0 // 8) * 8            # sublane-align the lane buffers
    resident_kv = (chain_res_kv_vmem_bytes(cfg, B, KL) < _RES_KV_BUDGET)
    BB = (_pick_bb(B) if resident_kv
          else _pick_bb_stream(B, KL, HD, jnp.dtype(cfg.cdtype).itemsize))
    call = _make_chain_res_call(
        n, L, B // BB, BB, M, KL, V, HD, cfg.d_inner, cfg.n_head,
        bool(cfg.pre_lnorm), jnp.dtype(cfg.cdtype).name, 1e-5,
        1.0 / (cfg.d_head ** 0.5), resident_kv, INTERPRET)
    sc = jnp.asarray([count], jnp.int32)
    temp = jnp.asarray(temperature, jnp.float32).reshape(1, 1)
    kf, vf, r_pad = _pad_lane_buffers(kf, vf, r_heads, KL, KL0, M, HD)

    cdt = jnp.dtype(cfg.cdtype)
    xs = res["x"].transpose(1, 0, 2, 3).astype(cdt)       # [n,L,B,HD]
    z1 = res["z1"].transpose(1, 0, 2, 3).astype(cdt)
    z2 = res["z2"].transpose(1, 0, 2, 3).astype(cdt)
    ffp = res["ff_pre"].transpose(1, 0, 2, 3).astype(cdt)
    prob = res["prob"].transpose(3, 0, 1, 2, 4).astype(jnp.float32)
    if KL > KL0:                                          # pad lanes
        prob = jnp.concatenate(
            [prob, jnp.zeros(prob.shape[:-1] + (KL - KL0,),
                             prob.dtype)], axis=-1)

    (q,) = call(sc, S.astype(jnp.float32), Y.astype(jnp.float32), temp,
                kf, vf, r_pad,
                stacked["q_w"], stacked["k_w"], stacked["v_w"],
                stacked["o_w"], stacked["ff1"], stacked["ff2"],
                stacked["ln_as"], stacked["ln_ab"], stacked["ln_fs"],
                stacked["rwb"], stacked["mask_h"],
                stacked["emb_scaled"], stacked["emb_t"],
                xs, z1, z2, ffp, prob)
    return q


def chain_bwd_q(stacked, cfg, kf, vf, r_heads, ids, S, Y, count,
                temperature):
    """Run the reverse chain for one chunk; returns the per-step logits
    cotangents Q [n, B, V] (fp32).

    kf/vf: [L, B, KL, HD] full lane buffers (KL = M + n); r_heads
    [L, M+1, HD] distance-reversed positional projections (zero-padded
    to KL rows here); ids [n, B] int32 inputs each step saw; S [n, B, V]
    fp32 straight-through cotangents; Y [n, B, V] fp32 saved softmax
    outputs.
    """
    L, B, KL0, HD = kf.shape
    n = ids.shape[0]
    M = KL0 - n
    V = S.shape[2]
    BB = _pick_bb(B)
    KL = -(-KL0 // 8) * 8            # sublane-align the lane buffers
    call = _make_chain_call(
        n, L, B // BB, BB, M, KL, V, HD, cfg.d_inner, cfg.n_head,
        bool(cfg.pre_lnorm), jnp.dtype(cfg.cdtype).name, 1e-5,
        1.0 / (cfg.d_head ** 0.5), INTERPRET)
    sc = jnp.asarray([count], jnp.int32)
    temp = jnp.asarray(temperature, jnp.float32).reshape(1, 1)
    kf, vf, r_pad = _pad_lane_buffers(kf, vf, r_heads, KL, KL0, M, HD)
    (q,) = call(sc, ids[..., None].astype(jnp.int32),
                S.astype(jnp.float32), Y.astype(jnp.float32), temp,
                kf, vf, r_pad,
                stacked["q_w"], stacked["k_w"], stacked["v_w"],
                stacked["o_w"], stacked["ff1"], stacked["fb1"],
                stacked["ff2"], stacked["fb2"],
                stacked["ln_as"], stacked["ln_ab"],
                stacked["ln_fs"], stacked["ln_fb"],
                stacked["rwb"], stacked["rrb"], stacked["mask_h"],
                stacked["emb_scaled"], stacked["emb_t"])
    return q
