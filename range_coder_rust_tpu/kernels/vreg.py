"""Shared (8, 128)-vreg primitives for the Pallas kernels.

Everything here is pure jnp over (8, 128)-shaped arrays — identical under
``interpret=True`` (CPU tests) and Mosaic-compiled on hardware.  These are
the building blocks the rans16 kernels (kernels/rans_*.py) and the
compaction machinery (kernels/compact_flat.py) are written in.
"""

from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_I32 = jnp.int32


def _select_by(level_vals: List[jax.Array], sel: jax.Array) -> jax.Array:
    """Binary select tree: pick level_vals[sel] per element (len power of 2)."""
    vals = level_vals
    bit = 0
    while len(vals) > 1:
        half = []
        b = (sel >> bit) & 1
        for i in range(0, len(vals), 2):
            half.append(jnp.where(b == 1, vals[i + 1], vals[i]))
        vals = half
        bit += 1
    return vals[0]


def _lookup_rows(rows_bcast: List[jax.Array], idx: jax.Array) -> jax.Array:
    """Per-lane lookup of flat ``idx`` in a table laid out as broadcast
    rows: ``rows_bcast[r][..., s, :] == table_row_r`` for every sublane s.
    idx in [0, 128 * len(rows_bcast)), any shape ending in (8, 128).  One
    hardware lane-gather per row + a select tree."""
    col = (idx & 127).astype(_I32)
    shape = col.shape
    col2 = col.reshape(-1, 128)  # Mosaic supports 2-D gathers only
    n = col2.shape[0]
    pad1 = n == 1  # Mosaic rejects single-row gathers — run 2, keep row 0
    if pad1:
        col2 = jnp.concatenate([col2, col2], axis=0)
        n = 2

    def _tab(r):
        # r's 8 sublanes are identical (sublane-broadcast), so any row
        # count can be served; non-multiples of 8 (narrow groups,
        # sr < 8) broadcast the first sublane directly
        if n % 8 == 0:
            return jnp.broadcast_to(r, (n // 8, 8, 128)).reshape(-1, 128)
        return jnp.broadcast_to(r[:1], (n, 128))

    gathered = []
    for r in rows_bcast:
        g2 = jnp.take_along_axis(_tab(r), col2, axis=-1)
        gathered.append((g2[0:1] if pad1 else g2).reshape(shape))
    return _select_by(gathered, (idx >> 7).astype(_I32))


def _bcast_rows(tile: jax.Array) -> List[jax.Array]:
    """(R, 128) -> list of R (8, 128) sublane-broadcast vregs."""
    return [
        jnp.broadcast_to(tile[r : r + 1, :], (8, 128)) for r in range(tile.shape[0])
    ]


def _lane_prefix_flat(n: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Exclusive prefix sum of (R, 128) in flat (sublane-major) lane order,
    plus the total (scalar).  R = 8 is the per-step decode-refill case;
    the encode kernel calls it once per TILE on (tile_steps*8, 128).

    Implemented as two triangular-ones MXU contractions instead of
    log-step pad/slice shifts — Mosaic rejects sublane-dim concat/pad with
    offset mismatches.  Exactness: ``n`` is a 0/1 flag vector in every
    rans16 use (one potential emission/refill per lane per step), the
    triangular/ones operands are 0/1 constants, and per-row partial sums
    are <= 128 — all exact in bfloat16 — with accumulation in f32
    (integers up to 2^24 exact, totals here <= 2^17), so a single bf16
    MXU pass (Precision.DEFAULT) computes exact counts; HIGHEST would
    burn 3-6 passes for nothing.
    """
    R, C = n.shape
    nf = n.astype(jnp.float32)
    # within-row inclusive prefix: inc[s, l] = sum_{l' <= l} n[s, l']
    iota = jax.lax.broadcasted_iota(jnp.int32, (C, C), 0)
    jota = jax.lax.broadcasted_iota(jnp.int32, (C, C), 1)
    upper = (iota <= jota).astype(jnp.float32)  # U[l', l] = l' <= l
    inc = jax.lax.dot(nf, upper, preferred_element_type=jnp.float32)
    # rows strictly above: row_excl[s] = sum_{s' < s} sum_l n[s', l]
    rows = jax.lax.dot(
        nf, jnp.ones((C, C), jnp.float32),
        preferred_element_type=jnp.float32,
    )  # rows[s, l] = row total of s, broadcast over l
    si = jax.lax.broadcasted_iota(jnp.int32, (R, R), 0)
    sj = jax.lax.broadcasted_iota(jnp.int32, (R, R), 1)
    lstrict = (si > sj).astype(jnp.float32)  # L[s, s'] = s' < s
    row_excl = jax.lax.dot(
        lstrict, rows, preferred_element_type=jnp.float32)
    excl = (inc - nf + row_excl).astype(jnp.int32)
    total = jnp.sum(n)
    return excl, total


def _lane_prefix_flat_vpu(n: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """:func:`_lane_prefix_flat` computed entirely on the VPU: a 7-round
    lane log-prefix + a 3-round sublane log-prefix (rolls + masked adds),
    no MXU round-trips.  Same results; the per-STEP decode refill rank is
    latency-bound, and the two MXU contractions cost ~280 cycles of
    dependent latency there (measured 19.4 ms of the 50.7 ms 64 MB decode
    kernel) — the ~22-op VPU chain is shorter."""
    R, C = n.shape
    lane_idx = jax.lax.broadcasted_iota(_I32, (R, C), 1)
    row_idx = jax.lax.broadcasted_iota(_I32, (R, C), 0)
    x = n
    k = 1
    while k < C:  # inclusive within-row prefix
        x = x + jnp.where(lane_idx >= k, jnp.roll(x, k, axis=1), 0)
        k *= 2
    inc = x
    rowtot = jnp.broadcast_to(inc[:, C - 1 : C], (R, C))
    y = rowtot
    k = 1
    while k < R:  # inclusive over rows
        y = y + jnp.where(row_idx >= k, jnp.roll(y, k, axis=0), 0)
        k *= 2
    excl = inc - n + (y - rowtot)
    total = jnp.sum(n)
    return excl, total


def _lane_prefix_flat_hybrid(n: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """:func:`_lane_prefix_flat` with ONE MXU contraction: the within-row
    prefix rides the MXU, the (much smaller) across-row exclusive prefix
    is a ``log2(R)``-round sublane-roll ladder on the row totals —
    sublane rolls are cheap (unlike the lane rolls that sank the all-VPU
    variant), and the second 128x128 contraction's latency disappears
    from the per-step chain."""
    R, C = n.shape
    nf = n.astype(jnp.float32)
    iota = jax.lax.broadcasted_iota(_I32, (C, C), 0)
    jota = jax.lax.broadcasted_iota(_I32, (C, C), 1)
    upper = (iota <= jota).astype(jnp.float32)
    inc = jax.lax.dot(nf, upper, preferred_element_type=jnp.float32)
    rowtot = jnp.broadcast_to(inc[:, C - 1 : C], (R, C))
    row_idx = jax.lax.broadcasted_iota(_I32, (R, C), 0)
    y = rowtot
    k = 1
    while k < R:  # inclusive prefix over rows
        y = y + jnp.where(row_idx >= k, jnp.roll(y, k, axis=0), 0)
        k *= 2
    excl = (inc - nf + (y - rowtot)).astype(_I32)
    total = jnp.sum(n)
    return excl, total


def prep_cum_vreg(cum: np.ndarray) -> np.ndarray:
    """Lay a (A+1,) cum table out as the (8, 128) vreg the kernels expect,
    padded with a sentinel larger than any slot value (so searches never
    select a padding entry).  Alphabets up to 1023 symbols fit one vreg."""
    if cum.shape[0] > 1024:
        raise ValueError(f"alphabet {cum.shape[0] - 1} exceeds 1023 symbols")
    flat = np.full(1024, 0x7FFFFFFF, np.uint32)
    flat[: cum.shape[0]] = cum
    return flat.reshape(8, 128)


def prep_cum_vreg_batch(cums: np.ndarray) -> np.ndarray:
    """Vectorized :func:`prep_cum_vreg` for a (NG, A+1) batch -> the
    (NG, 8, 128) table blocks (adaptive rans16: thousands of groups)."""
    NG, a1 = cums.shape
    if a1 > 1024:
        raise ValueError(f"alphabet {a1 - 1} exceeds 1023 symbols")
    flat = np.full((NG, 1024), 0x7FFFFFFF, np.uint32)
    flat[:, :a1] = cums
    return flat.reshape(NG, 8, 128)


def symbols_to_step_major(symbols: jax.Array, *, group_lanes: int = None
                          ) -> jax.Array:
    """(B, L) lane-major symbols -> (NG, L*SR, 128) step-major tiles,
    with ``SR = group_lanes // 128`` sublane-rows of state per step."""
    if group_lanes is None:
        from .. import rans

        group_lanes = rans.GROUP_LANES
    B, L = symbols.shape
    if B % group_lanes:
        raise ValueError(f"B={B} not a multiple of {group_lanes}")
    NG = B // group_lanes
    sr = group_lanes // 128
    s = symbols.reshape(NG, sr, 128, L).astype(_I32)
    return jnp.transpose(s, (0, 3, 1, 2)).reshape(NG, L * sr, 128)
