"""Pallas TPU encode kernel for the rans16 profile (rans.py).

The encoder iterates symbols BACKWARD (t = L-1 .. 0) — that is what makes
its emissions land in the decoder's consumption order with no permutation
stage.  Per step, for all GROUP_LANES lanes of a group (width-generic):

  1. table probe c, cum by symbol (vreg gathers on the cum table);
  2. renorm: lanes with ``x >= c << 32`` (one u32 compare: ``x.hi >= c``)
     emit their low halfword and shift ``x >>= 16``;
  3. exact division ``q, r = divmod(x, c)`` with ``q < 2^32`` via two
     16-bit-quotient stages: an f32 estimate with a safety margin and three
     exact fixup steps each (the encode-side analogue of ops/u64.div_small_q);
  4. state update ``x = (q << 16) | (cum + r)``;
  5. the emitted halfword candidates are PARKED per step (``h | emit<<16``
     into a VMEM scratch row block at the step's time index), and after
     the step loop ONE whole-tile stream compaction
     (kernels/compact_flat.compact_flat_tile) left-aligns every emission
     into the tile's private output block in region order.

## Tile-local output (round 4: two-phase, amortized compaction)

Each (group, 64-step tile) grid step owns a PRIVATE output block sized for
the worst case (64 steps x 1024 lanes x at most one halfword per lane-step
= 65536 halfwords), so capacity overflow is structurally impossible — no
retries, no entropy-based sizing.  Per-tile region sizes are returned
(SMEM) and recorded in the container (format.py v2), which is what lets
the decoder slice its per-tile windows STATICALLY and lets arbitrarily
long lanes run in ONE kernel invocation (no VMEM whole-stream cap, no
host-chained segment calls — the round-2 design both of those limited).

Round 3 compacted and blended each step's emissions inside the step loop:
a 10-round routing pass + MXU prefix + two dynamic blend-window RMWs per
step, which the round-4 hardware ablation (scripts/encode_ablation.py)
measured at ~52 of the kernel's 66 ms at 64 MB — the step loop is LATENCY
bound, so work on its serial chain costs wall-clock one-for-one.  Round 4
runs the state chain alone (phase 1), then compacts the whole tile's
emissions in ONE ``log2(tile*1024)``-round pass (phase 2) — per-step
routing depth drops from 10 rounds to 16/64, the per-step MXU prefix
becomes one per-tile prefix, and the region lands left-aligned with a
single static bulk write (no dynamic rolls, no RMW blends).  The region
bytes and sizes are IDENTICAL to round 3's — only the in-block alignment
changed, which the host gather (rans_codec) accounts for.

Symbol tiles are fed in plain buffer order with forward index maps; the
time reversal lives entirely in the host-side gather that assembles the
container (reversed device-side index maps triggered nondeterministic
pipelining hangs on v5e in round 2).  Output tile k of a group therefore
holds the emissions of time-tile ``NT - 1 - k``.

Reference parity note: this profile reproduces the capabilities of the
reference coder (/root/reference/src/encoder.rs, model-driven lossless
coding), not its byte stream; the byte-exact path is blocks.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops.u64 import mul32_wide
from .compact_flat import compact_flat_tile
from .vreg import _bcast_rows, _lane_prefix_flat, _lookup_rows

_U32 = jnp.uint32
_I32 = jnp.int32
_F32 = jnp.float32

#: per-tile region capacity in halfwords: every lane can emit at most one
#: halfword per step, so tile_steps * G is a hard worst case — overflow
#: cannot happen.  Fixed at 65536 (the compact_flat_tile buffer cap), so
#: the steps per grid tile scale inversely with the group width:
#: G=1024 -> 64-step tiles, G=2048 -> 32-step tiles.
CAP_HW = 65536
#: expanded rows per tile block (one u32 slot per region halfword; the
#: region is LEFT-aligned at slot 0, so no blend-window slack is needed)
ROWS_E = CAP_HW // 128


def tile_steps_for(group_lanes: int) -> int:
    """Steps per grid tile for a group width (the container's per-tile
    bookkeeping unit — derived, so containers of any group width parse)."""
    return max(1, CAP_HW // group_lanes)


def _to_f32(v: jax.Array) -> jax.Array:
    """Exact-ish u32 -> f32 via 16-bit halves (Mosaic has no u32->f32)."""
    hi = (v >> _U32(16)).astype(_I32).astype(_F32)
    lo = (v & _U32(0xFFFF)).astype(_I32).astype(_F32)
    return hi * 65536.0 + lo


def _div_stage(num_f: jax.Array, den_f: jax.Array) -> jax.Array:
    """floor(num/den) estimate with margin 2 (true quotient < 2^16)."""
    q = jnp.floor(num_f / den_f)
    q = jnp.clip(q, 0.0, 65535.0).astype(_I32).astype(_U32)
    return jnp.where(q > _U32(2), q - _U32(2), _U32(0))


def _mul_u32_shift16(q1: jax.Array, cc: jax.Array):
    """(q1 * cc) << 16 as u64 limbs, with q1 < 2^16, cc <= 2^16.

    The product q1 * cc is < 2^32 (exact in one u32 multiply); shifting it
    left 16 splits across the limbs.
    """
    p = q1 * cc
    return p >> _U32(16), p << _U32(16)


def barrett_rows(c) -> "np.ndarray":
    """Per-symbol Barrett reciprocals for the EXACT in-kernel division
    ``q = floor(x / c)`` with ``x < 2^48`` (Granlund-Montgomery: with
    ``l = ceil(log2 c)`` and ``m = floor(2^(48+l)/c) + 1`` — 49 bits —
    ``q = (x*m) >> (48+l)`` is exact because ``m*c - 2^(48+l) <= c <=
    2^l``).  Replaces the f32 estimate + 6 serial fixup rounds with a
    short, mostly-parallel multiply tree.

    Returns (16, 128) u32: rows 0-7 = m_lo (u32), rows 8-15 =
    ``m_hi | l << 20`` for alphabets up to 1024; zero-frequency symbols
    get c=1 constants (they are never encoded).
    """
    import numpy as np

    a = int(c.shape[0])
    if a > 1024:
        raise ValueError(f"alphabet {a} exceeds 1024 symbols")
    ml = np.zeros(1024, np.uint32)
    mhl = np.zeros(1024, np.uint32)
    for s in range(a):
        d = max(int(c[s]), 1)
        lg = (d - 1).bit_length()
        m = (1 << (48 + lg)) // d + 1
        ml[s] = m & 0xFFFFFFFF
        mhl[s] = (m >> 32) | (lg << 20)
    return np.stack([ml.reshape(8, 128), mhl.reshape(8, 128)]
                    ).reshape(16, 128)


def barrett_rows_batch(c2d) -> "np.ndarray":
    """Vectorized :func:`barrett_rows` for a (NG, A) batch of per-group
    counts -> (NG, 16, 128).  The adaptive rans16 mode uses thousands of
    per-group tables; the scalar builder's Python loop over NG * A symbols
    costs seconds at that scale."""
    import numpy as np

    c2d = np.asarray(c2d)
    NG, a = c2d.shape
    if a > 1024:
        raise ValueError(f"alphabet {a} exceeds 1024 symbols")
    d = np.maximum(c2d.astype(np.uint64), 1)
    v = (d - 1).astype(np.float64)  # exact: values < 2^16 << 2^53
    lg = np.where(d > 1, np.frexp(v)[1], 0).astype(np.uint64)
    # m = floor(2^(48+lg) / d) + 1; 48+lg = 64 exceeds u64 for lg == 16
    # (d > 2^15), so that band uses the doubling identity
    # floor(2^64/d) = 2*floor(2^63/d) + floor(2*(2^63 mod d)/d)
    sh = np.minimum(np.uint64(48) + lg, np.uint64(63))
    num = np.uint64(1) << sh
    q = num // d
    r = num - q * d
    wide = lg == 16
    m = np.where(wide, np.uint64(2) * q + (np.uint64(2) * r) // d, q) + 1
    ml = np.zeros((NG, 1024), np.uint32)
    mhl = np.zeros((NG, 1024), np.uint32)
    ml[:, :a] = (m & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    mhl[:, :a] = ((m >> np.uint64(32)) | (lg << np.uint64(20))).astype(
        np.uint32)
    out = np.concatenate(
        [ml.reshape(NG, 8, 128), mhl.reshape(NG, 8, 128)], axis=1)
    return out


def _rans_encode_kernel(cum_ref, aux_ref, baux_ref, sym_ref, exp_ref,
                        pre_ref, sz_ref, st_ref, lut_ref, hv_ref, *,
                        a_count: int, tile_steps: int, n_tiles: int,
                        barrett: bool, sr: int = 8, ablate: str = "none",
                        sync_tiles: int = 0, sync_ref=None):
    """One (group, step-tile), tiles walked in buffer order (= time
    reversed).  Two phases: (1) the sequential per-step state chain, which
    parks each step's candidate halfword + emit flag in ``hv_ref``;
    (2) ONE whole-tile stream compaction (compact_flat_tile) writing the
    region LEFT-aligned into the private tile block — the round-3 design
    ran a 10-round routing pass, an MXU prefix and two blend-window RMWs
    *per step*, which the encode ablation measured at ~52 of 66 ms.

    cum_ref (8,128) u32; aux_ref (8,128) packed lookup rows
    (rans_decode.aux_from_cum_flat); sym_ref (1, tile_steps*8, 128) i32
    step-ascending rows of time-tile ``n_tiles-1-tau``; exp_ref
    (1, ROWS_E, 128) u32 halfword-expanded PRIVATE tile block (region
    LEFT-aligned at slot 0); pre_ref (1, 16, 128) u32 preamble words
    (written at the last tile); sz_ref SMEM (NG, n_tiles) i32 per-tile
    region sizes in halfwords, buffer order; st_ref VMEM scratch
    (2, 8, 128) u32 state limbs carried across tiles; hv_ref VMEM scratch
    (tile_steps*8, 128) u32 per-step emissions ``h | emit << 16`` in
    time-ascending row blocks."""
    tau = pl.program_id(1)
    g_idx = pl.program_id(0)
    cap_hw = tile_steps * sr * 128

    packed = a_count <= 256
    if packed:
        # per-symbol word cum[s] | (c[s]-1) << 16 (aux_from_cum_flat)
        w2_rows = _bcast_rows(aux_ref[0, 1:3, :])
    else:
        n_rows = 1
        while n_rows * 128 < a_count + 2 and n_rows < 8:
            n_rows *= 2
        cum_rows = _bcast_rows(cum_ref[0])[:n_rows]

    @pl.when(tau == 0)
    def _():
        st_ref[0] = jnp.full((sr, 128), 1, _U32)   # x = 2^32
        st_ref[1] = jnp.zeros((sr, 128), _U32)

    # the per-symbol table words depend only on the INPUT symbols, not on
    # coder state — hoist the lookup out of the (latency-bound) step loop
    # as one batched gather over the whole tile, staged through VMEM
    # scratch (Mosaic cannot dynamic-slice a value, only a ref)
    if ablate == "nolut":
        pass  # constants replace every table access (perf forensics only)
    elif packed:
        lut_ref[0] = _lookup_rows(w2_rows, sym_ref[0, 0])  # (tile*8, 128)
    else:
        cum_all = _lookup_rows(cum_rows, sym_ref[0, 0])
        lut_ref[0] = cum_all
        lut_ref[1] = _lookup_rows(cum_rows, sym_ref[0, 0] + 1) - cum_all
    if barrett and ablate != "nolut":
        ml_rows = _bcast_rows(baux_ref[0, 0:8, :])
        mhl_rows = _bcast_rows(baux_ref[0, 8:16, :])
        lut_ref[1 if packed else 2] = _lookup_rows(ml_rows, sym_ref[0, 0])
        lut_ref[2 if packed else 3] = _lookup_rows(mhl_rows, sym_ref[0, 0])

    # ablation constants: a fixed symbol (c=300) replacing every table read
    _abl_d = 300
    _abl_lg = (_abl_d - 1).bit_length()
    _abl_m = (1 << (48 + _abl_lg)) // _abl_d + 1

    def body(j, carry):
        xhi, xlo = carry
        t_local = tile_steps - 1 - j

        if ablate == "nolut":
            cum_s = jnp.full((sr, 128), 1000, _U32)
            cc = jnp.full((sr, 128), _abl_d, _U32)
        elif packed:
            w2 = lut_ref[0, pl.ds(t_local * sr, sr), :]
            cum_s = w2 & _U32(0xFFFF)
            cc = (w2 >> _U32(16)) + _U32(1)
        else:
            cum_s = lut_ref[0, pl.ds(t_local * sr, sr), :]
            cc = lut_ref[1, pl.ds(t_local * sr, sr), :]

        # 2. renorm: emit one halfword where x >= c << 32  <=>  x.hi >= c
        emit = xhi >= cc
        h = xlo & _U32(0xFFFF)
        exhi = xhi >> _U32(16)
        exlo = (xlo >> _U32(16)) | (xhi << _U32(16))
        xhi1 = jnp.where(emit, exhi, xhi)
        xlo1 = jnp.where(emit, exlo, xlo)

        # 3. q = x / c, r = x % c  (x < c * 2^32 now, so q < 2^32)
        if ablate == "nodiv":
            # perf forensics: a dependency-preserving stand-in for the
            # divide (outputs are garbage; only the timing is meaningful)
            q_lo = xlo1 ^ (xhi1 << _U32(1))
            r_fin = xlo1 & _U32(0xFF)
        elif barrett:
            # exact multiply-shift (barrett_rows): q = (x*m) >> (48+l),
            # a short tree of independent 32x32 products — no estimate/
            # fixup chain, no c == 2^16 special case
            if ablate == "nolut":
                ml = jnp.full((sr, 128), _abl_m & 0xFFFFFFFF, _U32)
                mhl = jnp.full(
                    (sr, 128), (_abl_m >> 32) | (_abl_lg << 20), _U32)
            else:
                base = 1 if packed else 2
                ml = lut_ref[base, pl.ds(t_local * sr, sr), :]
                mhl = lut_ref[base + 1, pl.ds(t_local * sr, sr), :]
            mh = mhl & _U32(0xFFFFF)         # m >> 32, < 2^17
            sh = mhl >> _U32(20)             # l in [0, 16]
            ac_hi, ac_lo = mul32_wide(xlo1, ml)
            ad_hi, ad_lo = mul32_wide(xlo1, mh)
            bc_hi, bc_lo = mul32_wide(xhi1, ml)
            bd_hi, bd_lo = mul32_wide(xhi1, mh)
            p1_lo = ad_lo + bc_lo
            c0 = (p1_lo < ad_lo).astype(_U32)
            p1_hi = ad_hi + bc_hi + c0       # < 2^18
            s1 = ac_hi + p1_lo
            c1 = (s1 < ac_hi).astype(_U32)
            t2 = p1_hi + bd_lo
            c2a = (t2 < p1_hi).astype(_U32)
            s2 = t2 + c1
            c2b = (s2 < t2).astype(_U32)
            s3 = bd_hi + c2a + c2b
            h_lo = (s1 >> _U32(16)) | (s2 << _U32(16))   # product bits 48..79
            h_hi = (s2 >> _U32(16)) | (s3 << _U32(16))   # product bits 80..111
            q_lo = jnp.where(
                sh == 0, h_lo,
                (h_lo >> sh) | (h_hi << (_U32(32) - sh)))
            r_fin = xlo1 - q_lo * cc         # r < 2^16: exact mod 2^32
        else:
            full = cc == _U32(1 << 16)  # c == 2^16: q = x >> 16 exactly
            xf = _to_f32(xhi1) * 4294967296.0 + _to_f32(xlo1)
            ccf = _to_f32(cc)
            # stage 1: q1 = x // (c << 16) < 2^16
            q1 = _div_stage(xf, ccf * 65536.0)
            # r1 = x - q1 * (c << 16); fixups in u64 limb math
            d1hi, d1lo = _mul_u32_shift16(q1, cc)
            r1hi = xhi1 - d1hi - (xlo1 < d1lo).astype(_U32)
            r1lo = xlo1 - d1lo
            for _ in range(3):
                ge = jnp.logical_or(
                    r1hi > (cc >> _U32(16)),
                    jnp.logical_and(r1hi == (cc >> _U32(16)),
                                    r1lo >= (cc << _U32(16))),
                )
                q1 = q1 + ge.astype(_U32)
                nlo = r1lo - (cc << _U32(16))
                r1hi = jnp.where(ge, r1hi - (cc >> _U32(16))
                                 - (r1lo < (cc << _U32(16))).astype(_U32),
                                 r1hi)
                r1lo = jnp.where(ge, nlo, r1lo)
            # after fixups r1 < c << 16 <= 2^32: r1 lives in r1lo
            q2 = _div_stage(_to_f32(r1lo), ccf)
            r2 = r1lo - q2 * cc
            for _ in range(3):
                ge = r2 >= cc
                q2 = q2 + ge.astype(_U32)
                r2 = jnp.where(ge, r2 - cc, r2)
            q_lo = (q1 << _U32(16)) | q2

            # c == 2^16 special case: q = x >> 16, r = x & 0xFFFF
            q_lo = jnp.where(
                full, (xlo1 >> _U32(16)) | (xhi1 << _U32(16)), q_lo)
            r_fin = jnp.where(full, xlo1 & _U32(0xFFFF), r2)

        # 4. x' = (q << 16) | (cum + r)
        nxhi = q_lo >> _U32(16)
        nxlo = (q_lo << _U32(16)) | (cum_s + r_fin)

        # 5. park this step's emission for the whole-tile compaction —
        # time-ascending row blocks (t_local), which IS region order
        hv_ref[pl.ds(t_local * sr, sr), :] = h | (
            emit.astype(_U32) << _U32(16))

        return (nxhi, nxlo)

    xhi, xlo = jax.lax.fori_loop(
        0, tile_steps, body, (st_ref[0], st_ref[1])
    )
    st_ref[0], st_ref[1] = xhi, xlo

    # ---- phase 2: ONE whole-tile compaction, region left-aligned ----
    hv = hv_ref[:, :]
    tail = tile_steps * sr - sr
    if ablate == "noprefix":
        exp_ref[0, 0, 0:sr, :] = hv[0:sr] ^ hv[tail:]
        sz_ref[g_idx, tau] = jnp.int32(cap_hw // 2)
    else:
        act = (hv >> _U32(16)).astype(_I32)
        rank, total = _lane_prefix_flat(act)
        sz_ref[g_idx, tau] = total
        if ablate == "nocompact":
            exp_ref[0, 0, 0:sr, :] = (
                hv[0:sr] + rank[0:sr].astype(_U32) ^ hv[tail:])
        else:
            comp = compact_flat_tile(hv, act == 1, rank)
            if ablate == "nowrite":
                exp_ref[0, 0, 0:sr, :] = comp[0:sr] ^ comp[tail:]
            else:
                # block may carry one even-padding row (see rows_e above)
                exp_ref[0, 0, 0 : tile_steps * sr, :] = comp

    def _state_words(half):
        # lane l's state as LE words 2l (lo) / 2l+1 (hi), half rows each
        flat = (
            jax.lax.broadcasted_iota(_I32, (sr, 128), 0) * 128
            + jax.lax.broadcasted_iota(_I32, (sr, 128), 1)
        )
        word_idx = flat + half * (sr * 128)
        lane = word_idx >> 1
        lo_v = _lookup_rows(_bcast_rows(xlo), lane)
        hi_v = _lookup_rows(_bcast_rows(xhi), lane)
        return jnp.where((word_idx & 1) == 1, hi_v, lo_v)

    @pl.when(tau == n_tiles - 1)
    def _():
        for half in range(2):
            pre_ref[0, pl.ds(half * sr, sr), :] = _state_words(half)

    if sync_ref is not None:
        # sync slot j-1 records the decoder's state BEFORE time-tile
        # j*sync_tiles — exactly the encoder's state after processing
        # buffer tile NT-1-j*sync_tiles (tile-level random access)
        tt = n_tiles - 1 - tau  # the time-tile this grid step processed

        @pl.when(jnp.logical_and(tt % sync_tiles == 0, tt > 0))
        def _():
            for half in range(2):
                sync_ref[0, 0, pl.ds(half * sr, sr), :] = _state_words(half)


@functools.partial(
    jax.jit,
    static_argnames=("block_len", "a_count", "interpret", "ablate",
                     "sync_tiles"),
)
def rans_encode_tiled(
    symbols: jax.Array,
    cum_vreg: jax.Array,
    enc_aux: jax.Array | None = None,
    *,
    block_len: int,
    a_count: int,
    interpret: bool = False,
    ablate: str = "none",
    sync_tiles: int = 0,
):
    """Encode step-major symbol tiles into per-tile rans16 region blocks.

    Arguments:
      symbols: (NG, L*SR, 128) int32 step-major (symbols_to_step_major),
        L == block_len; SR = group_lanes/128 sublane-rows per step — the
        group width is DERIVED from the input shape, so any group_lanes
        (1024, 2048, ...) encodes with the same kernel.
      cum_vreg: (8, 128) uint32 (prep_cum_vreg), or (NG, 8, 128) for
        PER-GROUP tables (the adaptive rans16 mode — each group coded
        with its own order-0 table at full kernel speed).
      enc_aux: (16, 128) uint32 Barrett reciprocal rows (barrett_rows) —
        or (NG, 16, 128) per group — enables the exact multiply-shift
        division; None falls back to the f32 estimate + fixup divide
        (same outputs, longer serial chain).

    Returns ``(pre, exp, sizes)``:
      pre: (NG, 2*SR, 128) u32 preamble words (lane states, lo/hi pairs);
      exp: (NG, NT, rows_e, 128) u32 halfword-expanded tile blocks —
        tile k holds TIME-tile ``NT-1-k``, its region LEFT-aligned at
        slots ``[0, sizes[g, k])``;
      sizes: (NG, NT) int32 region sizes in halfwords, buffer order.
    """
    NG, rows, _ = symbols.shape
    if rows % block_len:
        raise ValueError(f"symbols rows {rows} not a multiple of "
                         f"block_len {block_len}")
    sr = rows // block_len
    tile = min(tile_steps_for(sr * 128), block_len)
    if block_len % tile:
        raise ValueError(f"block_len {block_len} % tile {tile} != 0")
    n_tiles = block_len // tile
    # pack_and_gather pairs CONSECUTIVE expanded rows into 128-word rows,
    # so each tile block must span an even row count — at sr == 1 (128-
    # lane groups) an odd tile length would otherwise pair a tile's last
    # row with the NEXT tile's first (found by the geometry fuzz sweep)
    rows_e = tile * sr + ((tile * sr) & 1)
    barrett = enc_aux is not None
    if not barrett:
        enc_aux = jnp.zeros((16, 128), _U32)
    n_sync = (n_tiles - 1) // sync_tiles if sync_tiles > 0 else 0
    base_kw = dict(a_count=a_count, tile_steps=tile, n_tiles=n_tiles,
                   barrett=barrett, sr=sr, ablate=ablate)
    if n_sync:
        def kern(cum, aux, baux, sym, exp, pre, sz, sync, st, lut, hv):
            _rans_encode_kernel(cum, aux, baux, sym, exp, pre, sz, st,
                                lut, hv, sync_ref=sync,
                                sync_tiles=sync_tiles, **base_kw)
    else:
        kern = functools.partial(_rans_encode_kernel, **base_kw)
    from .rans_decode import aux_from_cum_flat

    if cum_vreg.ndim == 2:  # shared table: broadcast to the group axis
        cum_vreg = jnp.broadcast_to(cum_vreg, (NG, 8, 128))
    if enc_aux.ndim == 2:
        enc_aux = jnp.broadcast_to(enc_aux, (NG, 16, 128))
    aux = jax.vmap(
        lambda cv: aux_from_cum_flat(cv.reshape(-1), a_count))(cum_vreg)
    # reverse the step-tiles on device (the encoder walks time backward,
    # tile n_tiles-1 first) so the kernel's index maps stay plain forward —
    # reversed index maps triggered nondeterministic pipelining hangs on
    # v5e in round 2; XLA fuses the flip with the step-major transpose
    sym4 = jnp.flip(symbols.reshape(NG, n_tiles, tile * sr, 128), axis=1)
    out_shape = [
        jax.ShapeDtypeStruct((NG, n_tiles, rows_e, 128), _U32),
        jax.ShapeDtypeStruct((NG, 2 * sr, 128), _U32),
        jax.ShapeDtypeStruct((NG, n_tiles), _I32),
    ]
    out_specs = [
        pl.BlockSpec((1, 1, rows_e, 128), lambda g, t: (g, t, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 2 * sr, 128), lambda g, t: (g, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),  # whole (NG, NT) array
    ]
    if n_sync:
        out_shape.append(
            jax.ShapeDtypeStruct((NG, n_sync, 2 * sr, 128), _U32))
        out_specs.append(pl.BlockSpec(
            (1, 1, 2 * sr, 128),
            lambda g, t: (
                g,
                jnp.maximum((n_tiles - 1 - t) // sync_tiles - 1, 0),
                0, 0),
            memory_space=pltpu.VMEM))
    outs = pl.pallas_call(
        kern,
        grid=(NG, n_tiles),
        out_shape=tuple(out_shape),
        in_specs=[
            pl.BlockSpec((1, 8, 128), lambda g, t: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, 128), lambda g, t: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 16, 128), lambda g, t: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, 1, tile * sr, 128),
                lambda g, t: (g, t, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=tuple(out_specs),
        scratch_shapes=[
            pltpu.VMEM((2, sr, 128), _U32),
            pltpu.VMEM((4, tile * sr, 128), _U32),  # hoisted per-step tables
            pltpu.VMEM((tile * sr, 128), _U32),     # per-step emissions
        ],
        interpret=interpret,
    )(cum_vreg, aux, enc_aux, sym4)
    if n_sync:
        exp, pre, sz, syncs = outs
        return pre, exp, sz, syncs
    exp, pre, sz = outs
    return pre, exp, sz


@functools.partial(jax.jit, static_argnames=("rows_out",))
def pack_and_gather(exp: jax.Array, row_idx: jax.Array, *, rows_out: int):
    """Halfword-expanded tile blocks -> compact LE-word stream rows.

    ``exp`` (NG, NT, rows_e, 128) u32 expanded (one u16 per u32 slot);
    ``row_idx`` (rows_out,) int32 indices into the packed row space
    ``(NG*NT*rows_e/2, 128)`` selecting, in container order, the 256-
    halfword rows covering every tile's region (host-computed from the
    kernel's sizes; see rans_codec).  Returns (rows_out, 128) u32 words.

    The halfword pairing uses lane-strided slices, NOT a trailing
    ``(..., 2)`` reshape — a minor dimension of 2 pads to the 128-lane
    tile on TPU (64x memory blowup; 17 GB at 64 MB corpus scale).
    """
    NG, NT, rows_e, _ = exp.shape
    flat = exp.reshape(NG * NT * rows_e, 128)
    w64 = flat[:, 0::2] | (flat[:, 1::2] << 16)      # (R2, 64)
    words = w64.reshape(NG * NT * rows_e // 2, 128)  # row pairs -> 128 words
    return jnp.take(words, row_idx, axis=0)
