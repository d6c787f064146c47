"""Pallas TPU decode kernel for the interleaved profile.

One kernel instance decodes a whole group: 1024 lanes (one full (8, 128)
vreg of coder states) advancing in lock-step through the shared interleaved
stream (kernels/interleave.py).  Per step, for all lanes at once:

  1. ``rfreq = (data - lower) / (range >> k)`` — the decoder's target
     cumulative value (reference examples/sample_impl.rs:29-30), u32-limb
     u64 math + estimate-and-correct division, all elementwise;
  2. symbol search — the reference's binary search
     (examples/sample_impl.rs:33-44) with per-lane probes of the cum table
     through hardware vreg gathers (Mosaic's 2-D ``take_along_axis``:
     per-lane lane-selects on sublane-broadcast table rows);
  3. the closed-form transition (ops/transition.py) replays the encoder's
     ``param_update`` exactly (reference src/decoder.rs:42-50);
  4. byte counts prefix-sum across lanes (pad/slice shifted adds) to get
     each lane's offset in the step's stream region — the interleaved
     layout makes the region base *uniform*, so the per-lane window fetch
     stays within vreg-gather reach of a 32-row (16 KB) window;
  5. the 64-bit windows shift in exactly the consumed bytes
     (reference src/decoder.rs:50-52) and the region base advances by the
     step's total.

The kernel is pure (8, 128)-shaped jnp — it runs identically under
``interpret=True`` on CPU (used by the test suite) and compiled via Mosaic
on a real chip.
"""

from __future__ import annotations

import functools
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops import u64
from ..ops.transition import CoderState, init_state, param_update_pow2
from ..ops.u64 import U64

_U32 = jnp.uint32
_I32 = jnp.int32

#: lanes per group (must match interleave.GROUP_LANES)
G = 1024
#: stream window rows read per step: 32 rows x 512 B = 16 KB covers the
#: worst-case step region (1024 lanes x 14 B = 14 KB) plus row alignment
_WIN_ROWS = 32


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
    gathered = [
        jnp.take_along_axis(
            jnp.broadcast_to(r, (col2.shape[0] // 8, 8, 128)).reshape(-1, 128),
            col2,
            axis=-1,
        ).reshape(shape)
        for r in rows_bcast
    ]
    return _select_by(gathered, (idx >> 7).astype(_I32))


def _bcast_rows(tile: jax.Array) -> List[jax.Array]:
    """(R, 128) -> list of R (8, 128) sublane-broadcast vregs."""
    return [
        jnp.broadcast_to(tile[r : r + 1, :], (8, 128)) for r in range(tile.shape[0])
    ]


def _lane_prefix_flat(n: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Exclusive prefix sum of (8, 128) in flat (sublane-major) lane order,
    plus the total (scalar).

    Implemented as two triangular-ones MXU contractions instead of
    log-step pad/slice shifts — Mosaic rejects sublane-dim concat/pad with
    offset mismatches, and the matmuls are exact in f32 (values are byte
    counts <= 14 * 1024 < 2^24).
    """
    nf = n.astype(jnp.float32)
    # within-row inclusive prefix: inc[s, l] = sum_{l' <= l} n[s, l']
    iota = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
    jota = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
    upper = (iota <= jota).astype(jnp.float32)  # U[l', l] = l' <= l
    inc = jax.lax.dot(nf, upper, precision=jax.lax.Precision.HIGHEST)
    # rows strictly above: row_excl[s] = sum_{s' < s} sum_l n[s', l]
    rows = jax.lax.dot(
        nf, jnp.ones((128, 128), jnp.float32),
        precision=jax.lax.Precision.HIGHEST,
    )  # rows[s, l] = row total of s, broadcast over l
    si = jax.lax.broadcasted_iota(jnp.int32, (8, 8), 0)
    sj = jax.lax.broadcasted_iota(jnp.int32, (8, 8), 1)
    lstrict = (si > sj).astype(jnp.float32)  # L[s, s'] = s' < s
    row_excl = jax.lax.dot(lstrict, rows, precision=jax.lax.Precision.HIGHEST)
    excl = (inc - nf + row_excl).astype(jnp.int32)
    total = jnp.sum(n)
    return excl, total


def _fetch16(window: jax.Array, local_byte: jax.Array) -> Tuple[U64, U64]:
    """Bytes [local_byte, local_byte+16) of the (WIN_ROWS, 128) u32 window
    as two big-endian U64s, per lane.  local_byte in [0, 512*WIN_ROWS-20)."""
    rows = _bcast_rows(window)  # WIN_ROWS broadcast vregs
    w0 = (local_byte >> 2).astype(_I32)
    words = []
    for j in range(5):
        idx = w0 + j
        # two-level: select 8-row pane, then 1024-entry lookup within it
        panes = [
            _lookup_rows(rows[p * 8 : (p + 1) * 8], (idx - 1024 * p) & 1023)
            for p in range(_WIN_ROWS // 8)
        ]
        words.append(_select_by(panes, (idx >> 10).astype(_I32)))
    a0, a1, a2, a3, a4 = words
    sh = (8 * (local_byte & 3)).astype(_U32)
    inv = _U32(32) - sh

    def funnel(a, b):
        lo = jnp.where(sh > 0, b >> jnp.where(inv < 32, inv, _U32(0)), _U32(0))
        return jnp.where(sh > 0, a << sh, a) | lo

    return (
        U64(funnel(a0, a1), funnel(a1, a2)),
        U64(funnel(a2, a3), funnel(a3, a4)),
    )


def _div_rfreq(dl: U64, rpt: U64, k: int) -> jax.Array:
    """floor(dl / rpt) clamped to 2^k - 1 (ops/u64.div_small_q, which is
    Mosaic-safe: casts routed through int32, no unsigned reductions).
    The clamp is compare+select — Mosaic has no vector ``minui``."""
    q = u64.div_small_q(dl, rpt)
    cap = _U32((1 << k) - 1)
    return jnp.where(q < cap, q, cap)


def _decode_kernel(cum_ref, stream_ref, out_ref, *, k: int, block_len: int,
                   a_count: int):
    """Kernel body: one group.  cum_ref (8, 128) u32 flat cum table
    (pad 0x7FFFFFFF), stream_ref (rows, 128) u32 big-endian words,
    out_ref (block_len*8, 128) i32 symbols (step-major)."""
    cum_rows = _bcast_rows(cum_ref[:])
    search_iters = max(1, (a_count - 1).bit_length())

    def prime() -> U64:
        lane = (
            jax.lax.broadcasted_iota(_I32, (8, 128), 0) * 128
            + jax.lax.broadcasted_iota(_I32, (8, 128), 1)
        )
        win0 = stream_ref[0, pl.ds(0, _WIN_ROWS), :]
        whi, _ = _fetch16(win0, lane * 8)
        return whi

    state0 = init_state((8, 128))
    window0 = prime()

    def body(t, carry):
        low, rng, win, r_base = carry
        st = CoderState(low, rng)

        # 1. target cumulative value
        rpt = u64.shri(rng, k)
        dl = u64.sub(win, low)
        rfreq = _div_rfreq(dl, rpt, k)

        # 2. binary search: largest i with cum[i] <= rfreq
        lo = jnp.zeros((8, 128), _I32)
        hi = jnp.full((8, 128), a_count, _I32)
        for _ in range(search_iters):
            mid = (lo + hi) >> 1
            cmid = _lookup_rows(cum_rows, mid)
            go = cmid <= rfreq
            lo = jnp.where(go, mid, lo)
            hi = jnp.where(go, hi, mid)
        idx = lo
        cum_s = _lookup_rows(cum_rows, idx)
        cum_n = _lookup_rows(cum_rows, idx + 1)
        cc = cum_n - cum_s

        # 3. the encoder's exact transition (reference src/decoder.rs:42-50)
        st, _, n = param_update_pow2(st, cc, cum_s, k)

        # 4. per-lane region offsets (uniform base + lane prefix)
        w_excl, s_t = _lane_prefix_flat(n)

        # 5. window refill: bytes [r_base + w_excl, +n)
        row0 = (r_base >> 9).astype(_I32)
        window_tile = stream_ref[0, pl.ds(row0, _WIN_ROWS), :]
        local = (r_base - (row0 << 9)).astype(_I32) + w_excl
        whi, wlo = _fetch16(window_tile, local)
        nn = n.astype(_I32)
        v_le8 = u64.shr(whi, 64 - 8 * nn)
        v_gt8 = u64.bit_or(u64.shl(whi, 8 * nn - 64), u64.shr(wlo, 128 - 8 * nn))
        v = u64.select(nn <= 8, v_le8, v_gt8)
        win2 = u64.bit_or(u64.shl(win, 8 * nn), v)

        out_ref[0, pl.ds(t * 8, 8), :] = idx
        return (st.low, st.rng, win2, r_base + s_t.astype(_I32))

    jax.lax.fori_loop(
        0,
        block_len,
        body,
        (state0.low, state0.rng, window0, jnp.int32(8 * G)),
    )


def prep_cum_vreg(cum: np.ndarray) -> np.ndarray:
    """Lay a (A+1,) cum table out as the (8, 128) vreg the kernel expects,
    padded with a sentinel larger than any rfreq (so the binary search never
    selects a padding slot).  Alphabets up to 1023 symbols fit one vreg."""
    if cum.shape[0] > 1024:
        raise ValueError(f"alphabet {cum.shape[0] - 1} exceeds 1023 symbols")
    flat = np.full(1024, 0x7FFFFFFF, np.uint32)
    flat[: cum.shape[0]] = cum
    return flat.reshape(8, 128)


#: backward-compat alias (pre-round-2 private name)
_prep_cum_vreg = prep_cum_vreg


@jax.jit
def pack_stream_words(streams: jax.Array) -> jax.Array:
    """(NG, SC) uint8 -> (NG, SC//512, 128) big-endian uint32 words.

    A SEPARATE jit on purpose: feeding a host-uploaded flat uint8 array
    straight into the kernel's program triggers a ~22 ms device relayout
    per call (measured on v5e; the (1, SC) u8 layout is pathological).
    Packed as its own dispatch the relayout disappears and the kernel sees
    a natively-tiled (rows, 128) u32 operand.
    """
    NG, SC = streams.shape
    if SC % 512:
        raise ValueError("stream capacity must be a multiple of 512")
    rows = SC // 512
    w = streams.reshape(NG, rows * 128, 4).astype(_U32)
    words = ((w[..., 0] << 24) | (w[..., 1] << 16) | (w[..., 2] << 8) | w[..., 3])
    return words.reshape(NG, rows, 128)


@functools.partial(
    jax.jit, static_argnames=("k", "block_len", "a_count", "interpret")
)
def decode_words(
    words: jax.Array,
    cum_vreg: jax.Array,
    *,
    k: int,
    block_len: int,
    a_count: int,
    interpret: bool = False,
) -> jax.Array:
    """Decode (NG, rows, 128) packed word streams -> (NG, G, L) symbols."""
    NG, rows, _ = words.shape
    kern = functools.partial(
        _decode_kernel, k=k, block_len=block_len, a_count=a_count
    )
    out = pl.pallas_call(
        kern,
        grid=(NG,),
        out_shape=jax.ShapeDtypeStruct((NG, block_len * 8, 128), _I32),
        in_specs=[
            pl.BlockSpec((8, 128), lambda g: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rows, 128), lambda g: (g, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, block_len * 8, 128), lambda g: (g, 0, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(cum_vreg, words)
    # step-major (t*8+s, lam) -> lane-major (lane = s*128+lam, t)
    out = out.reshape(NG, block_len, 8, 128)
    return jnp.transpose(out, (0, 2, 3, 1)).reshape(NG, G, block_len)


def decode_interleaved(
    streams: jax.Array,
    cum_vreg: jax.Array,
    *,
    k: int,
    block_len: int,
    a_count: int,
    interpret: bool = False,
) -> jax.Array:
    """Decode (NG, SC) interleaved group streams -> (NG, G, L) symbols.

    ``streams`` uint8 with SC a multiple of 512 and at least
    ``16K + max group length`` of slack rows zero-padded;
    ``cum_vreg`` (8, 128) u32 from :func:`prep_cum_vreg`.  Host wrapper
    over :func:`pack_stream_words` + :func:`decode_words` (two dispatches —
    see pack_stream_words for why).
    """
    return decode_words(
        pack_stream_words(streams),
        cum_vreg,
        k=k,
        block_len=block_len,
        a_count=a_count,
        interpret=interpret,
    )
