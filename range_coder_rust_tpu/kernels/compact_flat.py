"""Flat-order vreg compaction and rolls — building blocks for the rans16
encode kernel.

``compact_flat`` moves the active lanes of an (8, 128) vreg to the front in
flat (sublane-major) lane order — the classic stream-compaction primitive,
implemented as 10 rounds of binary-decomposed routing (move-by-2^i) built
on lane/sublane rolls, because TPU has no cross-vreg scatter.  Distances
``l - rank(l)`` are nondecreasing over active lanes, which makes LSB-first
binary routing collision-free (property-tested exhaustively in
tests/test_compact_flat.py against NumPy compress).

All helpers are pure (8, 128) jnp and run under Pallas (compiled or
interpreted) as well as plain XLA.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from .vreg import _lane_prefix_flat

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


def compact_flat(
    v: jax.Array, active: jax.Array
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Move active lanes' values to the front in flat lane order.

    Arguments: ``v`` (8, 128) uint32 values, ``active`` (8, 128) bool.
    Returns ``(compacted, rank, total)``: compacted values (positions >=
    total are garbage), each lane's exclusive active-rank (int32), and the
    scalar active count.
    """
    act0 = active.astype(_I32)  # int32 flags: Mosaic can't roll/trunc i1
    rank, total = _lane_prefix_flat(act0)
    flat = (
        jax.lax.broadcasted_iota(_I32, (8, 128), 0) * 128
        + jax.lax.broadcasted_iota(_I32, (8, 128), 1)
    )
    dist = jnp.where(act0 == 1, flat - rank, 0)
    val = v
    act = act0
    for i in range(10):
        bit = 1 << i
        src_val = flat_roll_pow2(val, -bit)
        src_dist = flat_roll_pow2(dist, -bit)
        src_act = flat_roll_pow2(act, -bit)
        arriving = jnp.logical_and(src_act == 1, (src_dist & bit) != 0)
        staying = jnp.logical_and(act == 1, (dist & bit) == 0)
        val = jnp.where(arriving, src_val, val)
        dist = jnp.where(arriving, src_dist - bit, dist)
        act = jnp.where(jnp.logical_or(arriving, staying), 1, 0)
    return val, rank, total


def flat_roll_dyn(x: jax.Array, shift: jax.Array) -> jax.Array:
    """Circular roll by a dynamic (traced) shift in [0, 1024), flat order:
    binary decomposition into 10 conditional pow2 rolls."""
    y = x
    for i in range(10):
        bit = 1 << i
        rolled = flat_roll_pow2(y, bit)
        y = jnp.where((shift & bit) != 0, rolled, y)
    return y


def flat_roll_dyn_mosaic(x: jax.Array, shift: jax.Array) -> jax.Array:
    """Like :func:`flat_roll_dyn` but with hardware dynamic rotates
    (``pltpu.roll`` takes traced shifts) — 3 rolls + a row fixup instead
    of 10 conditional pow2 rounds.  Pallas-only (compiled or interpret)."""
    from jax.experimental.pallas import tpu as pltpu

    lanes = shift & 127
    rows = jax.lax.shift_right_logical(shift, 7)
    y = pltpu.roll(x, lanes, axis=1)
    # lanes that wrapped within their row must come from the previous row
    lane_idx = jax.lax.broadcasted_iota(_I32, (8, 128), 1)
    y_prev = pltpu.roll(y, 1, axis=0)
    y = jnp.where(lane_idx < lanes, y_prev, y)
    return pltpu.roll(y, rows, axis=0)


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


def compact_flat_packed(
    v: jax.Array, active: jax.Array
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """:func:`compact_flat` with (value, distance, active) packed into ONE
    u32 per lane — one roll per routing round instead of three.

    ``v`` must be u32 with only the low 16 bits set (halfword payloads).
    Layout: bits 0-15 value, 16-25 remaining distance, 26 active flag.
    Returns ``(compacted, rank, total)`` exactly like :func:`compact_flat`
    (compacted values are masked back to 16 bits).
    """
    act0 = active.astype(_I32)
    rank, total = _lane_prefix_flat(act0)
    flat = (
        jax.lax.broadcasted_iota(_I32, (8, 128), 0) * 128
        + jax.lax.broadcasted_iota(_I32, (8, 128), 1)
    )
    dist = jnp.where(act0 == 1, flat - rank, 0).astype(_U32)
    act_bit = _U32(1 << 26)
    w = v | (dist << _U32(16)) | jnp.where(active, act_bit, _U32(0))
    for i in range(10):
        bit = 1 << i
        bit16 = _U32(bit << 16)
        src = flat_roll_pow2(w, -bit)
        arriving = (src & act_bit != 0) & (src & bit16 != 0)
        staying = (w & act_bit != 0) & (w & bit16 == 0)
        w = jnp.where(arriving, src - bit16, jnp.where(staying, w, w & ~act_bit))
    return w & _U32(0xFFFF), rank, total
