"""Mosaic feature probes for the fused decode-step kernel design.

Each probe is compiled and run separately on the real chip so a failure
pinpoints the unsupported construct. Run alone (ONE TPU process rule).

Usage: python tools/probe_mosaic_decode.py [probe ...]
"""
from __future__ import annotations

import sys
import traceback

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BB, H, HD, M, C, B, V = 8, 10, 500, 128, 32, 32, 310
KL = M + C


def run(name, fn):
    try:
        out = fn()
        print(f"PROBE {name}: OK {out}")
        return True
    except Exception as e:  # noqa: BLE001
        lines = str(e).split("\n")
        msg = lines[0][:300]
        detail = [l for l in lines if "Mosaic failed" in l or "tpu." in l
                  or "not supported" in l or "unsupported" in l][:3]
        print(f"PROBE {name}: FAIL {type(e).__name__}: {msg}")
        for d in detail:
            print(f"    {d.strip()[:240]}")
        if "-v" in sys.argv:
            traceback.print_exc()
        return False


def probe_batched_dot():
    # AC = dot_general(qH [BB,H,HD], K [BB,M,HD], contract 2/2, batch 0/0)
    def kernel(q_ref, k_ref, o_ref):
        o_ref[:] = jax.lax.dot_general(
            q_ref[:], k_ref[:], (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)

    q = jnp.ones((BB, H, HD), jnp.bfloat16)
    k = jnp.ones((BB, M, HD), jnp.bfloat16)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((BB, H, M), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(q, k)
    return float(out[0, 0, 0])  # expect HD


def probe_free_dot():
    # BD = dot_general(qH [BB,H,HD], R [M+1,HD], contract 2/1, no batch)
    def kernel(q_ref, r_ref, o_ref):
        o_ref[:] = jax.lax.dot_general(
            q_ref[:], r_ref[:], (((2,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)

    q = jnp.ones((BB, H, HD), jnp.bfloat16)
    r = jnp.ones((M + 1, HD), jnp.bfloat16)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((BB, H, M + 1), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(q, r)
    return float(out[0, 0, 0])


def probe_dim0_dot():
    # embed: dot_general(embW [V,HD], onehotT [V,B], contract 0/0)
    def kernel(w_ref, o_ref, out_ref):
        out_ref[:] = jax.lax.dot_general(
            w_ref[:], o_ref[:], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    w = jnp.ones((V, HD), jnp.bfloat16)
    o = jnp.ones((V, B), jnp.bfloat16)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((HD, B), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(w, o)
    return float(out[0, 0])


def probe_roll3d():
    # lane roll of [BB,H,KL] with traced shift via binary decomposition
    def kernel(t_ref, x_ref, o_ref):
        x = x_ref[:]
        t = t_ref[0]
        for bit in (1, 2, 4, 8, 16):
            rolled = pltpu.roll(x, bit, 2)
            x = jnp.where((t & bit) != 0, rolled, x)
        o_ref[:] = x

    x = jnp.arange(BB * H * KL, dtype=jnp.float32).reshape(BB, H, KL)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(1,),
        in_specs=[pl.BlockSpec((BB, H, KL), lambda i, s: (0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((BB, H, KL), lambda i, s: (0, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((BB, H, KL), jnp.float32),
    )(jnp.array([5], jnp.int32), x)
    ref = np.roll(np.asarray(x), 5, axis=2)
    ok = np.allclose(np.asarray(out), ref)
    return f"match={ok}"


def probe_argmax():
    # manual argmax over lanes + one-hot build, [B, V]
    def kernel(z_ref, ids_ref, oh_ref):
        z = z_ref[:]
        mx = jnp.max(z, axis=-1, keepdims=True)
        lane = jax.lax.broadcasted_iota(jnp.int32, (B, V), 1)
        idx = jnp.min(jnp.where(z == mx, lane, V), axis=-1, keepdims=True)
        ids_ref[:] = idx
        oh_ref[:] = (lane == idx).astype(jnp.float32)

    z = jax.random.normal(jax.random.key(0), (B, V), jnp.float32)
    ids, oh = pl.pallas_call(
        kernel,
        out_shape=[jax.ShapeDtypeStruct((B, 1), jnp.int32),
                   jax.ShapeDtypeStruct((B, V), jnp.float32)],
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
    )(z)
    ref = np.argmax(np.asarray(z), axis=-1)
    ok = np.array_equal(np.asarray(ids)[:, 0], ref)
    return f"match={ok}"


def probe_where_write():
    # staged-row update at traced t: [BB, C, HD]
    def kernel(t_ref, sk_ref, k_ref, o_ref):
        t = t_ref[0]
        row = jax.lax.broadcasted_iota(jnp.int32, (BB, C, HD), 1)
        o_ref[:] = jnp.where(row == t, k_ref[:][:, None, :], sk_ref[:])

    sk = jnp.zeros((BB, C, HD), jnp.bfloat16)
    k = jnp.ones((BB, HD), jnp.bfloat16)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(1,),
        in_specs=[pl.BlockSpec((BB, C, HD), lambda i, s: (0, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((BB, HD), lambda i, s: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((BB, C, HD), lambda i, s: (0, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((BB, C, HD), jnp.bfloat16),
    )(jnp.array([7], jnp.int32), sk, k)
    a = np.asarray(out)
    ok = a[:, 7].mean() == 1.0 and a[:, 6].mean() == 0.0
    return f"match={ok}"


def probe_concat_pad():
    def kernel(a_ref, b_ref, o_ref):
        cat = jnp.concatenate([a_ref[:], b_ref[:]], axis=-1)
        pad = jnp.concatenate(
            [cat, jnp.zeros((BB, H, 8), cat.dtype)], axis=-1)
        o_ref[:] = pad

    a = jnp.ones((BB, H, M), jnp.float32)
    b = jnp.ones((BB, H, C), jnp.float32) * 2
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((BB, H, KL + 8), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(a, b)
    o = np.asarray(out)
    return f"match={o[0,0,M]==2.0 and o[0,0,-1]==0.0}"


def probe_transcendental():
    def kernel(u_ref, o_ref):
        eps = 1e-20
        o_ref[:] = -jnp.log(-jnp.log(u_ref[:] + eps) + eps)

    u = jnp.full((B, V), 0.5, jnp.float32)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, V), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(u)
    ref = -np.log(-np.log(0.5))
    return f"match={abs(float(out[0,0]) - ref) < 1e-5}"


def probe_vmem_14mb():
    # grid over 2 steps with ~7MB of blocked inputs per step (x2 buffering)
    L = 2

    def kernel(k_ref, v_ref, o_ref):
        o_ref[:] = (k_ref[0].astype(jnp.float32).sum(axis=1)
                    + v_ref[0].astype(jnp.float32).sum(axis=1))

    k = jnp.ones((L, B, M, HD), jnp.bfloat16)
    v = jnp.ones((L, B, M, HD), jnp.bfloat16)
    out = pl.pallas_call(
        kernel,
        grid=(L,),
        in_specs=[pl.BlockSpec((1, B, M, HD), lambda l: (l, 0, 0, 0),
                               memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec((B, HD), lambda l: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, HD), jnp.float32),
    )(k, v)
    return f"sum={float(out[0,0])}"


def probe_vmem_30mb():
    # would exceed 16MB with double buffering: does a raised limit help?
    L = 2

    def kernel(k_ref, v_ref, o_ref):
        o_ref[:] = (k_ref[0].astype(jnp.float32).sum(axis=1)
                    + v_ref[0].astype(jnp.float32).sum(axis=1))

    k = jnp.ones((L, B, M * 4, HD), jnp.bfloat16)   # ~16.8MB per block pair
    v = jnp.ones((L, B, M * 4, HD), jnp.bfloat16)
    out = pl.pallas_call(
        kernel,
        grid=(L,),
        in_specs=[pl.BlockSpec((1, B, M * 4, HD), lambda l: (l, 0, 0, 0),
                               memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec((B, HD), lambda l: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, HD), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(k, v)
    return f"sum={float(out[0,0])}"


def probe_where_write32():
    # the exact _stage_write pattern at BB=32 (the op-point block):
    # failed on-chip as reshape (32,500)->(32,1,500) "unsupported shape
    # cast" inside broadcast_in_dim
    BB32 = 32

    def kernel(t_ref, sk_ref, k_ref, o_ref):
        t = t_ref[0]
        row = jax.lax.broadcasted_iota(jnp.int32, (BB32, C, HD), 1)
        o_ref[:] = jnp.where(row == t, k_ref[:][:, None, :], sk_ref[:])

    sk = jnp.zeros((BB32, C, HD), jnp.bfloat16)
    k = jnp.ones((BB32, HD), jnp.bfloat16)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(1,),
        in_specs=[pl.BlockSpec((BB32, C, HD), lambda i, s: (0, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((BB32, HD), lambda i, s: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((BB32, C, HD), lambda i, s: (0, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((BB32, C, HD), jnp.bfloat16),
    )(jnp.array([7], jnp.int32), sk, k)
    a = np.asarray(out)
    ok = a[:, 7].mean() == 1.0 and a[:, 6].mean() == 0.0
    return f"match={ok}"


def probe_bcast_in_dim():
    # explicit broadcast_in_dim (BB,HD)->(BB,C,HD) dims (0,2), no reshape
    BB32 = 32

    def kernel(k_ref, o_ref):
        o_ref[:] = jax.lax.broadcast_in_dim(
            k_ref[:], (BB32, C, HD), (0, 2))

    k = jnp.ones((BB32, HD), jnp.bfloat16) * 3
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((BB32, C, HD), jnp.bfloat16),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(k)
    return f"match={float(np.asarray(out).mean()) == 3.0}"


def probe_lead_bcast_write():
    # staging flipped to [C, BB, HD]: leading-dim broadcast k[None,:,:]
    BB32 = 32

    def kernel(t_ref, sk_ref, k_ref, o_ref):
        t = t_ref[0]
        row = jax.lax.broadcasted_iota(jnp.int32, (C, BB32, HD), 0)
        kb = jnp.broadcast_to(k_ref[:][None, :, :], (C, BB32, HD))
        o_ref[:] = jnp.where(row == t, kb, sk_ref[:])

    sk = jnp.zeros((C, BB32, HD), jnp.bfloat16)
    k = jnp.ones((BB32, HD), jnp.bfloat16)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(1,),
        in_specs=[pl.BlockSpec((C, BB32, HD), lambda i, s: (0, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((BB32, HD), lambda i, s: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((C, BB32, HD), lambda i, s: (0, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((C, BB32, HD), jnp.bfloat16),
    )(jnp.array([7], jnp.int32), sk, k)
    a = np.asarray(out)
    ok = a[7].mean() == 1.0 and a[6].mean() == 0.0
    return f"match={ok}"


def probe_qh_mul32():
    # qH = (q + bias)[:, None, :] * mask_h[None, :, :] at BB=32
    BB32 = 32

    def kernel(q_ref, m_ref, o_ref):
        o_ref[:] = q_ref[:][:, None, :] * m_ref[:][None, :, :]

    q = jnp.full((BB32, HD), 2.0, jnp.bfloat16)
    m = jnp.full((H, HD), 3.0, jnp.bfloat16)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((BB32, H, HD), jnp.bfloat16),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(q, m)
    return f"match={float(np.asarray(out)[0, 0, 0]) == 6.0}"


def probe_stage_dot_b1():
    # ac_st with staging [C, BB, HD]: batch dim at rhs position 1
    BB32 = 32

    def kernel(q_ref, s_ref, o_ref):
        o_ref[:] = jax.lax.dot_general(
            q_ref[:], s_ref[:], (((2,), (2,)), ((0,), (1,))),
            preferred_element_type=jnp.float32)

    q = jnp.ones((BB32, H, HD), jnp.bfloat16)
    s = jnp.ones((C, BB32, HD), jnp.bfloat16)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((BB32, H, C), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(q, s)
    return f"val={float(out[0, 0, 0])} (expect {HD})"


def probe_ctx_dot_b1():
    # p_st [BB,H,C] x sv [C,BB,HD] contract C (2/0), batch BB (0/1)
    BB32 = 32

    def kernel(p_ref, v_ref, o_ref):
        o_ref[:] = jax.lax.dot_general(
            p_ref[:], v_ref[:], (((2,), (0,)), ((0,), (1,))),
            preferred_element_type=jnp.float32)

    p = jnp.ones((BB32, H, C), jnp.bfloat16)
    v = jnp.ones((C, BB32, HD), jnp.bfloat16)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((BB32, H, HD), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(p, v)
    return f"val={float(out[0, 0, 0])} (expect {C})"


def probe_scratch_mid_store():
    # build qH [BB32, H, HD] in a VMEM scratch via H static middle-index
    # ref stores (replaces the unsupported middle-dim broadcast-mul)
    BB32 = 32

    def kernel(q_ref, m_ref, o_ref, scr):
        for h in range(H):
            scr[:, h, :] = q_ref[:] * m_ref[h, :][None, :]
        o_ref[:] = scr[:]

    q = jnp.full((BB32, HD), 2.0, jnp.bfloat16)
    m = jnp.asarray(np.arange(H)[:, None] * np.ones((1, HD)), jnp.bfloat16)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((BB32, H, HD), jnp.bfloat16),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((BB32, H, HD), jnp.bfloat16)],
    )(q, m)
    a = np.asarray(out)
    ok = a[0, 3, 0] == 6.0 and a[0, 0, 0] == 0.0 and a[0, 9, 0] == 18.0
    return f"match={ok}"


def probe_dyn_mid_store():
    # staged-row ring write via dynamic middle-index ref store:
    # sk_out[:, pl.ds(t, 1), :] = scr ([BB, 1, HD] scratch)
    BB32 = 32

    def kernel(t_ref, sk_ref, k_ref, o_ref, scr):
        t = t_ref[0]
        o_ref[:] = sk_ref[:]
        scr[:, 0, :] = k_ref[:]
        o_ref[:, pl.ds(t, 1), :] = scr[:]

    sk = jnp.zeros((BB32, C, HD), jnp.bfloat16)
    k = jnp.ones((BB32, HD), jnp.bfloat16)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(1,),
        in_specs=[pl.BlockSpec((BB32, C, HD), lambda i, s: (0, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((BB32, HD), lambda i, s: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((BB32, C, HD), lambda i, s: (0, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((BB32, C, HD), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((BB32, 1, HD), jnp.bfloat16)],
    )(jnp.array([7], jnp.int32), sk, k)
    a = np.asarray(out)
    ok = a[:, 7].mean() == 1.0 and a[:, 6].mean() == 0.0
    return f"match={ok}"


def probe_dyn_mid_store_scalar():
    # same but storing a 2D value at a collapsed dynamic index:
    # sk_out[:, t, :] = k
    BB32 = 32

    def kernel(t_ref, sk_ref, k_ref, o_ref):
        t = t_ref[0]
        o_ref[:] = sk_ref[:]
        o_ref[:, t, :] = k_ref[:]

    sk = jnp.zeros((BB32, C, HD), jnp.bfloat16)
    k = jnp.ones((BB32, HD), jnp.bfloat16)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(1,),
        in_specs=[pl.BlockSpec((BB32, C, HD), lambda i, s: (0, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((BB32, HD), lambda i, s: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((BB32, C, HD), lambda i, s: (0, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((BB32, C, HD), jnp.bfloat16),
    )(jnp.array([7], jnp.int32), sk, k)
    a = np.asarray(out)
    ok = a[:, 7].mean() == 1.0 and a[:, 6].mean() == 0.0
    return f"match={ok}"


def probe_batched_dot32():
    # the kernel's AC dot at the op-point block size BB=32
    BB32 = 32

    def kernel(q_ref, k_ref, o_ref):
        o_ref[:] = jax.lax.dot_general(
            q_ref[:], k_ref[:], (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)

    q = jnp.ones((BB32, H, HD), jnp.bfloat16)
    k = jnp.ones((BB32, M, HD), jnp.bfloat16)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((BB32, H, M), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(q, k)
    return float(out[0, 0, 0])  # expect HD


def probe_ctx3_dot32():
    # the kernel's PV dot at BB=32: p [BB,H,KL] x vcat [BB,KL,HD]
    BB32 = 32

    def kernel(p_ref, v_ref, o_ref):
        o_ref[:] = jax.lax.dot_general(
            p_ref[:], v_ref[:], (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)

    p = jnp.ones((BB32, H, KL), jnp.bfloat16)
    v = jnp.ones((BB32, KL, HD), jnp.bfloat16)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((BB32, H, HD), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(p, v)
    return float(out[0, 0, 0])  # expect KL


PROBES = {
    "batched_dot": probe_batched_dot,
    "free_dot": probe_free_dot,
    "dim0_dot": probe_dim0_dot,
    "roll3d": probe_roll3d,
    "argmax": probe_argmax,
    "where_write": probe_where_write,
    "concat_pad": probe_concat_pad,
    "transcendental": probe_transcendental,
    "vmem_14mb": probe_vmem_14mb,
    "vmem_30mb": probe_vmem_30mb,
    "where_write32": probe_where_write32,
    "bcast_in_dim": probe_bcast_in_dim,
    "lead_bcast_write": probe_lead_bcast_write,
    "qh_mul32": probe_qh_mul32,
    "stage_dot_b1": probe_stage_dot_b1,
    "ctx_dot_b1": probe_ctx_dot_b1,
    "scratch_mid_store": probe_scratch_mid_store,
    "dyn_mid_store": probe_dyn_mid_store,
    "dyn_mid_store_scalar": probe_dyn_mid_store_scalar,
    "batched_dot32": probe_batched_dot32,
    "ctx3_dot32": probe_ctx3_dot32,
}


def main():
    names = [a for a in sys.argv[1:] if not a.startswith("-")] or PROBES
    print("devices:", jax.devices())
    results = {n: run(n, PROBES[n]) for n in names}
    print("SUMMARY:", {n: ("ok" if v else "FAIL")
                       for n, v in results.items()})


if __name__ == "__main__":
    main()
