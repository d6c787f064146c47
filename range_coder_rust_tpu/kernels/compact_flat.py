"""Flat-order vreg compaction and rolls — building blocks for the rans16
encode kernel.

``compact_flat_tile`` moves the active elements of an (R, 128) buffer to
the front in flat (sublane-major) order — the classic stream-compaction
primitive, as LSB-first binary-decomposed routing (move-by-2^i) built on
lane/sublane rolls, because TPU has no cross-vreg scatter.  Distances
``flat - rank`` are nondecreasing over active elements, which makes the
routing collision-free (property-tested in tests/test_compact_flat.py
against NumPy compress).  Round 4 replaced the round-3 per-STEP (8, 128)
variants (compact_flat / compact_flat_packed / dynamic flat rolls) with
this single whole-tile amortized pass; the superseded primitives were
deleted with their tests.

All helpers are pure (R, 128) jnp and run under Pallas (compiled or
interpreted) as well as plain XLA.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_U32 = jnp.uint32
_I32 = jnp.int32


def _roll2d(x: jax.Array, shift: int, axis: int) -> jax.Array:
    """Static circular roll of an (8, 128) array (jnp.roll works in both
    Pallas and XLA; kept as a seam for pltpu.roll if needed)."""
    return jnp.roll(x, shift, axis=axis)


def flat_roll_pow2(x: jax.Array, delta: int) -> jax.Array:
    """Circular roll of an (R, 128) array by ``delta`` (+right/-left)
    positions in FLAT sublane-major order, for |delta| a power of two
    (or any static int)."""
    R, C = x.shape
    d = delta % (R * C)
    if d == 0:
        return x
    rows, lanes = divmod(d, C)
    y = x
    if lanes:
        y = _roll2d(y, lanes, 1)
        # lanes that wrapped within their row must come from the previous row
        lane_idx = jax.lax.broadcasted_iota(_I32, (R, C), 1)
        y_prev = _roll2d(y, 1, 0)
        y = jnp.where(lane_idx < lanes, y_prev, y)
    if rows:
        y = _roll2d(y, rows, 0)
    return y


def compact_flat_tile(
    v: jax.Array, active: jax.Array, rank: jax.Array
) -> jax.Array:
    """Whole-buffer stream compaction of an (R, 128) array of halfword
    values (low 16 bits of ``v``) with PRECOMPUTED exclusive active-ranks,
    in flat sublane-major order.  This is the amortized form the encode
    kernel uses: ONE ``ceil(log2(R*128))``-round routing pass per tile
    instead of a 10-round pass per step (the round-3 encode ablation
    attributed 36.7 of 66 ms of kernel time to per-step routing).

    Requires ``R * 128 <= 65536`` (distance and value share one u32:
    bits 0-15 value, 16-31 remaining distance).  Instead of an activity
    bit, departing elements leave an inert copy with distance zero — a
    "zombie" can never claim an arrival (its distance bits are all 0) and
    any front slot it occupies is overwritten by the element routed there,
    so the result's first ``total`` values equal NumPy ``v[active]``;
    positions >= total are garbage.  Property-tested against compress in
    tests/test_compact_flat.py.
    """
    R, C = v.shape
    n = R * C
    if n > 65536:
        raise ValueError(f"compact_flat_tile buffer {n} exceeds 65536")
    rounds = (n - 1).bit_length()
    flat = (
        jax.lax.broadcasted_iota(_I32, (R, C), 0) * C
        + jax.lax.broadcasted_iota(_I32, (R, C), 1)
    )
    dist = jnp.where(active, flat - rank, 0).astype(_U32)
    w = (v & _U32(0xFFFF)) | (dist << _U32(16))
    for i in range(rounds):
        bit16 = _U32(1 << (16 + i))
        src = flat_roll_pow2(w, -(1 << i))
        arriving = (src & bit16) != 0
        departing = (w & bit16) != 0
        # depart: leave a zombie (value kept, distance zeroed) unless an
        # arrival overwrites this slot in the same round
        w = jnp.where(arriving, src - bit16,
                      jnp.where(departing, w & _U32(0xFFFF), w))
    return w & _U32(0xFFFF)
