"""Shared Mosaic kernel helpers for the decode-family kernels
(pallas_decode / pallas_generate / pallas_chain_bwd).

Kept in one place so a fix to the roll idiom, the lane-batch picker, or
the VMEM budget applies to every kernel at once. Each kernel module
keeps its OWN ``INTERPRET`` flag (tests monkeypatch them independently).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

# Mosaic per-kernel VMEM budget. v5e VMEM is far larger than this, but
# the limit keeps compiles predictable; dispatch gates check estimated
# footprints against it with headroom.
VMEM_LIMIT = 100 * 1024 * 1024


def ln(x, scale_row, bias_row, eps):
    """LayerNorm over the last axis, fp32 statistics."""
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    return (y * scale_row.astype(jnp.float32)
            + bias_row.astype(jnp.float32)).astype(x.dtype)


def dot(a, b):
    return jnp.dot(a, b, preferred_element_type=jnp.float32)


def bdot(a, b):
    """[B, X, D] x [B, Y, D] -> [B, X, Y] (batch 0, contract last)."""
    return jax.lax.dot_general(
        a, b, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)


def roll_lanes(x, amount, max_amount: int = 256):
    """Circular roll of the LAST (lane) axis by traced ``amount`` via
    binary decomposition (one conditional pltpu.roll per bit).

    Rolls the array directly at its native rank: Mosaic supports lane
    rolls at any rank, while a (BB*H, KL)-style reshape is a
    layout-changing shape cast it rejects (mid-dim collapses move data
    between the batch and sublane dims). ``max_amount`` bounds the
    static bit ladder — pass the tightest bound the caller knows
    (e.g. the 32-token chunk length) so no dead roll stages are emitted.
    """
    for bit in (1, 2, 4, 8, 16, 32, 64, 128):
        if bit >= max_amount or bit >= x.shape[-1]:
            break
        rolled = pltpu.roll(x, bit, x.ndim - 1)
        x = jnp.where((amount & bit) != 0, rolled, x)
    return x


def pick_bb(B: int) -> int | None:
    """Lane-batch block size for grid axis NB (largest of 32/16/8 that
    divides B); None when B doesn't tile."""
    for bb in (32, 16, 8):
        if B % bb == 0:
            return min(bb, B)
    return None
