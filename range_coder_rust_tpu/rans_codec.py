"""Host orchestration for the rans16 profile: array <-> container.

The device kernels (kernels/rans_encode.py, kernels/rans_decode.py) work
in (group, 64-step tile) granularity; this module chooses geometry,
batches groups into bounded device invocations, and assembles/parses the
container (format.py, FLAG_RANS16, container VERSION 2).

Symbol order contract: lane ``l`` of group ``g`` encodes the flat segment
``[(g * G + l) * L, (g * G + l + 1) * L)`` — i.e. ``reshape(NG * G, L)``
row-major, exactly like the planar profile's blocks.

## Tile-sized regions (payload layout v2)

The encoder emits, per 64-step tile, the halfwords the decoder refills
during that tile; the container records each tile's region size, so both
directions move through the device as STATICALLY-shaped tile windows:

* encode: the kernel writes each tile's region LEFT-aligned into a
  private worst-case-sized block (overflow impossible); one device
  gather compacts the 512-B rows covering every region into container
  order, and the host drops the per-tile sub-row junk suffix with one
  boolean mask — no per-group Python assembly, and the D2H transfer is
  ~the compressed size.
* decode: the host computes each tile's covering rows + start offset
  from the recorded sizes; one device gather pads the uploaded stream
  into per-tile windows; the kernel walks them with a per-tile SMEM
  start cursor.  Lane states thread across tiles inside the kernel.

Per-group payload layout (container VERSION 2):

    u32 NT | u32 region_hw[NT] (time order) | preamble (6 * G bytes,
    lane l's final state as 48-bit LE at [6l, 6l+6)) | regions 0..NT-1

With sync points (bit 31 of the NT word set — tile random access,
``sync_tiles``):

    u32 NT|1<<31 | u32 sync_T | u32 region_hw[NT] | preamble |
    sync states (floor((NT-1)/sync_T) x 6*G bytes, the decoder's lane
    states before time-tiles sync_T, 2*sync_T, ...) | regions 0..NT-1

The 48-bit states are exact — they live in [2^32, 2^48) — and save
16 bits/lane of container overhead vs round 2's 64-bit layout.  The
group width G comes from the container header (width-generic kernels);
the tile count NT from the payload itself — both self-describing.
"""

from __future__ import annotations

import functools
import math
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import format as fmt
from . import rans
from .errors import ConfigError, InvalidHeader
from .kernels.vreg import (
    prep_cum_vreg, prep_cum_vreg_batch, symbols_to_step_major)
from .kernels.rans_decode import _win_rows, rans_decode_tiled
from .kernels.rans_encode import (
    barrett_rows, barrett_rows_batch, pack_and_gather, rans_encode_tiled,
    tile_steps_for)
from .models.table import Pow2Table

G = rans.GROUP_LANES
#: encoder-side steps per tile for the default group width; decode derives
#: the tile size from each container's payload NT, so containers written
#: with other group widths (e.g. round-3's 1024-lane ones) still decode
TILE_STEPS = tile_steps_for(G)

#: device-invocation bound: symbols per encode call (~HBM working set;
#: the expanded tile blocks cost ~4.2 B/sym on top of the 4 B/sym
#: step-major symbols)
_BATCH_SYMBOLS = 128 << 20

#: and a group-count bound: very small lane lengths would otherwise put
#: thousands of groups in one grid, overflowing the 1 MB SMEM budget
#: (per-grid bookkeeping + the (NG, NT) size/start arrays)
_BATCH_GROUPS = 512


def _groups_per_call(L: int, group_lanes: int = None) -> int:
    g = group_lanes if group_lanes else G
    return max(1, min(_BATCH_SYMBOLS // (g * L), _BATCH_GROUPS))


#: decode-side invocation bound: decode's working set per symbol is much
#: leaner than encode's (no halfword-expanded tile blocks), and the
#: chain-interleaved decode kernel wants 8 groups per call even at
#: 65536-step lanes — ~7 GB of HBM at the 1 GB flagship batch (i32
#: kernel output + padded windows + stream rows), well inside the v5e's
#: 16 GB
_BATCH_SYMBOLS_DEC = 1 << 30


def _groups_per_call_dec(L: int, group_lanes: int = None) -> int:
    g = group_lanes if group_lanes else G
    raw = max(1, min(_BATCH_SYMBOLS_DEC // (g * L), _BATCH_GROUPS))
    # floor to a power of two so the chain-interleave factor (2/4/8)
    # divides every full batch — a batch of e.g. 3 groups would force
    # chains=1 and forfeit the latency hiding
    return 1 << (raw.bit_length() - 1)

#: row-count bucket for the compacted-stream gather (limits recompiles)
_ROWS_BUCKET = 4096


def _interpret() -> bool:
    """Mosaic only compiles for TPU; interpret the kernels elsewhere
    (CPU test meshes) — identical semantics, slower."""
    return jax.default_backend() != "tpu"


def _tracer():
    """Stage-timestamp logger, enabled by RC_TRACE=1 (perf forensics)."""
    import os
    import sys
    import time

    if not os.environ.get("RC_TRACE"):
        return lambda _msg: None
    t0 = time.time()

    def log(msg):
        print(f"[rc {time.time() - t0:7.2f}s] {msg}", file=sys.stderr,
              flush=True)
    return log


@functools.partial(jax.jit, static_argnames=(
    "block_len", "a_count", "interpret", "sync_tiles", "group_lanes"))
def _encode_device(rows, cum_vreg, enc_aux=None, *, block_len, a_count,
                   interpret, sync_tiles=0, group_lanes=None):
    """(B, L) symbol rows (any int dtype) -> (pre, exp, sizes[, syncs])."""
    sym_t = symbols_to_step_major(rows.astype(jnp.int32),
                                  group_lanes=group_lanes)
    return rans_encode_tiled(
        sym_t, cum_vreg, enc_aux, block_len=block_len, a_count=a_count,
        interpret=interpret, sync_tiles=sync_tiles)


@functools.partial(jax.jit, static_argnames=("ng", "nt", "rpad"))
def _pad_stream(stream_rows, idx, *, ng, nt, rpad):
    """(R, 128) stream rows + (ng*nt*rpad,) row indices -> per-tile
    padded windows (ng, nt, rpad, 128)."""
    return jnp.take(stream_rows, idx, axis=0).reshape(ng, nt, rpad, 128)


def _pick_chains(ng: int, sr: int, rpad: int, tile: int) -> int:
    """Interleaved decode chains per grid step (kernels/rans_decode.py):
    the largest divisor of ``ng`` in {8, 4, 2, 1} whose per-chain VMEM
    blocks (pipelined stream window + output tile + preamble + state
    scratch, x2 for double buffering) fit the ~16 MB scoped budget with
    headroom.  More chains hide more of the latency-bound per-step
    dependency chain (docs/hardware_runs.md round 5)."""
    per = (2 * rpad * 128 * 4         # stream window blocks (x2)
           + 2 * tile * sr * 128 * 4  # output tile blocks (x2)
           + 6 * sr * 128 * 4)        # pre block + state scratch
    budget = 11 << 20
    for c in (8, 4, 2):
        if ng % c == 0 and c * per <= budget:
            return c
    return 1


@functools.partial(jax.jit, static_argnames=(
    "ng", "nt", "rpad", "block_len", "a_count", "out_dtype", "interpret",
    "chains"))
def _decode_fused_jit(stream_rows, idx, starts, pre, cum_vreg, *, ng, nt,
                      rpad, block_len, a_count, out_dtype, interpret,
                      chains):
    padded = jnp.take(stream_rows, idx, axis=0).reshape(ng, nt, rpad, 128)
    sym = rans_decode_tiled(
        padded, starts, pre, cum_vreg, block_len=block_len,
        a_count=a_count, interpret=interpret, chains=chains)
    return sym.reshape(-1).astype(out_dtype)


def _decode_fused(stream_rows, idx, starts, pre, cum_vreg, *, ng, nt, rpad,
                  block_len, a_count, out_dtype, interpret, chains=None):
    """One dispatch for the whole device decode chain: pad gather ->
    tiled kernel -> narrow-dtype flatten (each tunnel dispatch costs
    tens of ms of latency here — fusing them matters).  ``chains=None``
    auto-picks the chain-interleave factor (_pick_chains)."""
    if chains is None:
        chains = _pick_chains(ng, pre.shape[1] // 2, rpad, block_len // nt)
    return _decode_fused_jit(
        stream_rows, idx, starts, pre, cum_vreg, ng=ng, nt=nt, rpad=rpad,
        block_len=block_len, a_count=a_count, out_dtype=out_dtype,
        interpret=interpret, chains=chains)


@functools.partial(jax.jit, static_argnames=("out_dtype",))
def _finalize(sym, *, out_dtype):
    """(NG, G, L) kernel output -> flat (NG*G*L,) in the narrowest dtype
    (shrinks the D2H transfer 4x for byte alphabets)."""
    NG, g, L = sym.shape
    return sym.reshape(NG * g * L).astype(out_dtype)


@functools.partial(jax.jit, static_argnames=("alphabet",))
def _histogram_device(data, *, alphabet):
    """Order-0 histogram on device: chunked one-hot MXU contractions.

    The host's np.bincount costs seconds at GB scale while the data is
    being uploaded anyway; per 64K-symbol chunk the one-hot compare is
    exact in bfloat16 and the (1, 64K) x (64K, A) dot accumulates exact
    integer counts (<= 64K < 2^24) in f32, summed across chunks in i32.
    """
    ch = 1 << 16
    pad = (-data.size) % ch
    # keep the scanned buffer in the input dtype (u8 for byte alphabets);
    # the widening happens per 64K chunk inside the loop
    d = jnp.concatenate(
        [data, jnp.full((pad,), alphabet - 1, data.dtype)])
    chunks = d.reshape(-1, ch)
    ids = jnp.arange(alphabet, dtype=jnp.int32)
    ones = jnp.ones((1, ch), jnp.bfloat16)

    def step(h, c):
        oh = (c.astype(jnp.int32)[:, None] == ids[None, :]).astype(
            jnp.bfloat16)
        s = jax.lax.dot(ones, oh, preferred_element_type=jnp.float32)
        return h + s[0].astype(jnp.int32), None

    h, _ = jax.lax.scan(step, jnp.zeros(alphabet, jnp.int32), chunks)
    # the pad symbols counted into the last bin; remove them exactly
    return h.at[alphabet - 1].add(-pad)


@functools.partial(jax.jit, static_argnames=("alphabet", "n_groups"))
def _histogram_groups(data, *, alphabet, n_groups):
    """Per-group order-0 histograms on device: (n_groups * gs,) symbols ->
    (n_groups, alphabet) int32 counts.

    One sequential chunk scan (bounded one-hot transients) whose per-chunk
    histograms reduce into their groups — the round-3 approach vmapped the
    whole-corpus histogram over groups, materializing GB-scale one-hots
    (measured 70+ s at 16 MB).  The chunk size is the largest divisor of
    the group size <= 64K symbols, so chunks never straddle groups.
    """
    gs = data.size // n_groups
    # chunk size must DIVIDE the group size (chunks may never straddle
    # groups) and stay <= 64K symbols: take the largest divisor in range
    # (gs is always a multiple of 128 = the lane-count granularity, so
    # the scan below terminates quickly; advisor r4 — the old
    # gcd-of-floor formula was not a divisor for gs % 2048 != 0)
    if gs <= (1 << 16):
        ch = gs
    else:
        k = -(-gs // (1 << 16))
        while gs % k:
            k += 1
        ch = gs // k
    ids = jnp.arange(alphabet, dtype=jnp.int32)
    ones = jnp.ones((1, ch), jnp.bfloat16)
    chunks = data.reshape(-1, ch)

    def step(_, c):
        oh = (c.astype(jnp.int32)[:, None] == ids[None, :]).astype(
            jnp.bfloat16)
        s = jax.lax.dot(ones, oh, preferred_element_type=jnp.float32)
        return 0, s[0].astype(jnp.int32)

    _, hs = jax.lax.scan(step, 0, chunks)          # (n_chunks, A)
    return hs.reshape(n_groups, gs // ch, alphabet).sum(axis=1)


@functools.partial(jax.jit, static_argnames=("rows", "length"))
def _pad_rows_device(data, pad_sym, *, rows, length):
    """Flat device array -> (rows, length) padded with ``pad_sym``."""
    pad = rows * length - data.size
    full = jnp.concatenate(
        [data, jnp.full((pad,), pad_sym, data.dtype)])
    return full.reshape(rows, length)


#: in-run transfer log: when a list, _put/_fetch append
#: (direction, t_start, t_end, nbytes) for every bulk transfer — the
#: bench uses it to measure SUSTAINED tunnel rates + overlap inside the
#: e2e run itself instead of inferring a floor from an isolated probe
#: (VERDICT r4 item 2).  Enable with start_transfer_log().
_XFER_LOG = None
_XFER_THREADS: list = []


def start_transfer_log() -> None:
    global _XFER_LOG
    _XFER_LOG = []


def stop_transfer_log():
    """Return the accumulated (dir, t0, t1, nbytes) records and disable.
    Joins any in-flight H2D completion probes first (they run on
    background threads so the instrumentation does not serialize the
    upload pipeline it is measuring)."""
    global _XFER_LOG
    for th in _XFER_THREADS:
        th.join(timeout=600)
    _XFER_THREADS.clear()
    log, _XFER_LOG = _XFER_LOG, None
    return log or []


def _log_xfer(direction: str, t0: float, t1: float, nbytes: int) -> None:
    if _XFER_LOG is not None:
        _XFER_LOG.append((direction, t0, t1, nbytes))


def _put(host_array):
    """Host -> device, chunked over threads for large NumPy arrays: the
    axon tunnel's single-stream H2D measured ~10-50 MB/s; 4-8 parallel
    streams measure ~2-3x (fetch-forced; see docs/hardware_runs.md).
    Device arrays pass through (device-side slices, no transfer)."""
    if not isinstance(host_array, np.ndarray) or host_array.nbytes < (16 << 20):
        return jnp.asarray(host_array)
    import time as _time
    from concurrent.futures import ThreadPoolExecutor

    t0 = _time.time()
    shape = host_array.shape
    flat = host_array.reshape(-1)
    nthreads = 8
    chunk = -(-flat.size // nthreads)
    parts = [flat[i * chunk : (i + 1) * chunk] for i in range(nthreads)]
    with ThreadPoolExecutor(nthreads) as ex:
        ds = list(ex.map(jnp.asarray, parts))
    out = jnp.concatenate(ds).reshape(shape)
    if _XFER_LOG is not None:
        # close the interval only when the upload has actually landed:
        # jnp.asarray returns before the tunnel transfer completes, so an
        # unforced timestamp reads fiction (measured "1.5 GB/s" H2D on a
        # 30-90 MB/s tunnel).  A 1-element fetch of the concatenated
        # buffer depends on every chunk; a fetch cannot lie.  The probe
        # runs on a BACKGROUND thread so the product pipeline keeps
        # dispatching — stop_transfer_log() joins the probes.
        import threading

        nbytes = host_array.nbytes

        def _probe():
            np.asarray(out.ravel()[0:1])
            _log_xfer("h2d", t0, _time.time(), nbytes)

        th = threading.Thread(target=_probe, daemon=True)
        th.start()
        _XFER_THREADS.append(th)
    return out


def _fetch(dev_array) -> np.ndarray:
    """Device -> host copy, chunked over threads for large arrays: the
    axon tunnel's single-stream D2H runs ~25 MB/s but parallel streams
    reach ~1.6x that (measured); below 16 MB the thread overhead wins."""
    import time as _time

    nbytes = dev_array.size * dev_array.dtype.itemsize
    if nbytes < (16 << 20) or dev_array.ndim != 1:
        # small fetches (sizes, preambles) block on the producing kernel
        # too — logging them would poison the sustained-rate estimate
        return np.asarray(dev_array)
    from concurrent.futures import ThreadPoolExecutor

    t0 = _time.time()
    nthreads = 8
    chunk = -(-dev_array.size // nthreads)
    parts = [dev_array[i * chunk : (i + 1) * chunk]
             for i in range(nthreads)]
    with ThreadPoolExecutor(nthreads) as ex:
        host = list(ex.map(np.asarray, parts))
    out = np.concatenate(host)
    _log_xfer("d2h", t0, _time.time(), nbytes)
    return out


def _rows_e(tile: int, group_lanes: int = None) -> int:
    """Expanded rows per tile block: one u32 slot per capacity halfword,
    padded to an even count (pack_and_gather pairs consecutive rows —
    must match rans_encode_tiled's buffer exactly)."""
    r = tile * (group_lanes if group_lanes else G) // 128
    return r + (r & 1)


def _enc_row_idx(sizes_np, nb: int, NT: int, tile: int,
                 group_lanes: int = None):
    """Compaction row-index for the packed-stream gather, from the encode
    kernel's per-tile sizes (regions LEFT-aligned per tile block, exp
    buffer tile k = TIME-tile NT-1-k).  The ONE shared implementation —
    encode_groups, bench.py and the perf scripts all import it (advisor
    r4: four drifting copies of this math is how gather bugs ship).

    Returns ``(row_idx, rows_out, s_time, counts, csum)``: padded row
    indices + bucketed output rows, plus the time-ordered sizes and the
    per-tile covering-row counts/offsets the junk mask needs."""
    g = group_lanes if group_lanes else G
    s_time = sizes_np[:, ::-1]                    # (nb, NT), time order
    counts = ((s_time + 255) >> 8).reshape(-1)    # covering rows per tile
    base = ((np.arange(nb)[:, None] * NT + np.arange(NT)[None, ::-1])
            * (_rows_e(tile, g) // 2)).reshape(-1)
    total = int(counts.sum())
    csum = np.cumsum(counts) - counts
    offs = np.arange(total, dtype=np.int64) - np.repeat(csum, counts)
    row_idx = (np.repeat(base, counts) + offs).astype(np.int32)
    rows_out = -(-max(total, 1) // _ROWS_BUCKET) * _ROWS_BUCKET
    return (np.pad(row_idx, (0, rows_out - total)), rows_out,
            s_time, counts, csum)


def _rpad_for(rows_needed: int, group_lanes: int = None) -> int:
    """Padded rows per decode tile window: the kernel reads a
    ``_win_rows(sr)``-row window starting anywhere inside the region, so
    the block needs that much tail slack — with less, the final refills
    of a tile read clamped rows and corrupt the NEXT tile's first steps."""
    slack = _win_rows((group_lanes if group_lanes else G) // 128)
    return -(-(rows_needed + slack) // 16) * 16


def _tile_geometry(block_len: int, group_lanes: int = None
                   ) -> Tuple[int, int]:
    """(tile_steps, n_tiles) for a lane length and group width."""
    ts = tile_steps_for(group_lanes if group_lanes else G)
    tile = min(ts, block_len)
    if block_len % tile:
        raise ConfigError(
            f"rans16 block_len {block_len} must be <= {ts} or a "
            f"multiple of it")
    return tile, block_len // tile


def encode_groups(
    symbols: np.ndarray, table, block_len: int, sync_tiles: int = 0,
    group_lanes: int = None
) -> List[bytes]:
    """Encode (NG*g, L) padded symbol rows into per-group payload bytes.

    ``table``: one shared Pow2Table, or a LIST of NG tables (one per
    group — the adaptive rans16 mode; same kernels, group-indexed table
    blocks).  ``sync_tiles=T > 0`` records each group's lane states every
    T tiles (6 B/lane/sync) so :func:`decode_tile_range` can start
    decoding mid-group — tile-level random access.  ``group_lanes``
    narrows/widens the group (multiple of 128; the kernels are
    width-generic) — narrower groups halve the per-symbol lane-state
    overhead at a given ADAPTIVE group size, wider ones run faster."""
    g = group_lanes if group_lanes else G
    n_rows, L = symbols.shape
    if L != block_len or n_rows % g:
        raise ConfigError(f"bad group geometry ({n_rows}, {L})")
    NG = n_rows // g
    tile, NT = _tile_geometry(L, g)
    if not isinstance(table, Pow2Table):  # a LIST of per-group tables
        if len(table) != NG:
            raise ConfigError(f"{len(table)} tables for {NG} groups")
        cum_vreg = jnp.asarray(prep_cum_vreg_batch(
            np.stack([t.cum for t in table])))
        enc_aux = jnp.asarray(barrett_rows_batch(
            np.stack([t.c for t in table])))
        a_count = int(table[0].c.shape[0])
    else:
        cum_vreg = jnp.asarray(prep_cum_vreg(table.cum))
        enc_aux = jnp.asarray(barrett_rows(table.c))
        a_count = int(table.c.shape[0])
    interp = _interpret()

    gpc = _groups_per_call(L, g)
    trace = _tracer()
    payloads: List[bytes] = []
    bounds_all = [(s, min(s + gpc, NG)) for s in range(0, NG, gpc)]

    n_sync = (NT - 1) // sync_tiles if sync_tiles > 0 else 0

    def dispatch(start, stop):
        """Dispatch one batch's H2D + encode kernel (all async)."""
        trace(f"enc batch {start}: H2D + kernel dispatch")
        chunk = _put(symbols[start * g : stop * g])
        cv = cum_vreg if cum_vreg.ndim == 2 else cum_vreg[start:stop]
        ea = enc_aux if enc_aux.ndim == 2 else enc_aux[start:stop]
        out = _encode_device(
            chunk, cv, ea, block_len=L, a_count=a_count, interpret=interp,
            sync_tiles=sync_tiles if n_sync else 0, group_lanes=g)
        return out if n_sync else (*out, None)

    # double-buffered pipeline: batch i+1's upload + kernel are in flight
    # while batch i blocks on its sizes/stream fetches — the tunnel and
    # the chip are independent resources (VERDICT r3 item 4)
    inflight = dispatch(*bounds_all[0]) if bounds_all else None
    for bi, (start, stop) in enumerate(bounds_all):
        nb = stop - start
        pre, exp, sizes, syncs = inflight
        if bi + 1 < len(bounds_all):
            inflight = dispatch(*bounds_all[bi + 1])
        trace("fetching sizes")
        sizes_np = np.asarray(sizes)          # (nb, NT) buffer order
        trace("sizes fetched; fetching preamble")
        pre_np = np.asarray(pre)              # (nb, 2G/128, 128) u32
        sync_np = np.asarray(syncs) if n_sync else None
        trace("preamble fetched")

        row_idx, rows_out, s_time, counts, csum = _enc_row_idx(
            sizes_np, nb, NT, tile, g)
        total = int(counts.sum())
        trace(f"row idx built ({total} rows); pack+gather dispatch")
        words = pack_and_gather(exp, jnp.asarray(row_idx), rows_out=rows_out)
        flat_hw = _fetch(words.reshape(-1)).view("<u2")[: total * 256]
        trace("compact stream fetched")

        # drop each tile's sub-row junk SUFFIX ((-s) % 256 halfwords),
        # vectorized (one repeat/arange, no per-tile Python loop)
        s_flat = s_time.reshape(-1)
        junk = counts * 256 - s_flat
        keep = np.ones(total * 256, bool)
        jc = np.cumsum(junk) - junk
        drop = (np.repeat(csum * 256 + s_flat, junk)
                + (np.arange(int(junk.sum()), dtype=np.int64)
                   - np.repeat(jc, junk)))
        keep[drop] = False
        region_hw = flat_hw[keep]
        trace("junk mask applied")

        # 48-bit preamble: LE u64 per lane (words 2l lo / 2l+1 hi), top
        # 2 bytes always zero (states < 2^48)
        group_hw = s_time.sum(axis=1)
        bounds = np.concatenate([[0], np.cumsum(group_hw)])
        hdr_nt = np.uint32(NT | (_SYNC_FLAG if n_sync else 0)).tobytes()
        if n_sync:
            hdr_nt += np.uint32(sync_tiles).tobytes()

        def states6(words):
            """(.., 2*sr, 128) u32 state words -> 6-byte LE per lane."""
            return (words.reshape(-1).view("<u8").view(np.uint8)
                    .reshape(-1, 8)[:, :6].tobytes())

        for bg in range(nb):  # NOTE: must not shadow the group width ``g``
            sync6 = states6(sync_np[bg]) if n_sync else b""
            payloads.append(
                hdr_nt
                + s_time[bg].astype("<u4").tobytes()
                + states6(pre_np[bg])
                + sync6
                + region_hw[bounds[bg] : bounds[bg + 1]].tobytes()
            )
        trace("payloads assembled")
    return payloads


#: payload NT-word flag: sync-point section present (tile random access)
_SYNC_FLAG = 1 << 31


def _parse_payload(p, block_len: int, group_lanes: int = None,
                   full: bool = False):
    """One group payload -> (sizes (NT,) int64, pre6 bytes, region bytes);
    with ``full=True`` additionally ``(sync_T, sync6 bytes)`` (sync_T = 0
    when the payload has no sync section).

    The tile size is DERIVED from the payload's own NT (tile = L / NT),
    so containers written by encoders with other group widths or tile
    defaults parse and decode — the format is self-describing."""
    g = group_lanes if group_lanes else G
    p = memoryview(p)
    if len(p) < 4:
        raise InvalidHeader("rans16 payload too short")
    nt_word = int(np.frombuffer(p[:4], "<u4")[0])
    nt = nt_word & ~_SYNC_FLAG
    has_sync = bool(nt_word & _SYNC_FLAG)
    if nt < 1 or block_len % nt:
        raise InvalidHeader(
            f"rans16 payload has {nt} tiles for lane length {block_len}")
    tile = block_len // nt
    off = 4
    sync_t = 0
    if has_sync:
        if len(p) < 8:
            raise InvalidHeader("rans16 payload too short for sync header")
        sync_t = int(np.frombuffer(p[4:8], "<u4")[0])
        if sync_t < 1:
            raise InvalidHeader("rans16 sync period must be >= 1")
        off = 8
    head = off + 4 * nt
    if len(p) < head:  # np.frombuffer on a short/unaligned slice raises
        raise InvalidHeader("rans16 payload truncated in the size table")
    sizes = np.frombuffer(p[off:head], "<u4").astype(np.int64)
    if np.any(sizes > tile * g):
        raise InvalidHeader("rans16 tile size exceeds capacity")
    pre6 = p[head : head + 6 * g]
    off2 = head + 6 * g
    n_sync = (nt - 1) // sync_t if has_sync else 0
    sync6 = p[off2 : off2 + 6 * g * n_sync]
    off2 += 6 * g * n_sync
    if (len(pre6) != 6 * g or len(sync6) != 6 * g * n_sync
            or off2 + 2 * int(sizes.sum()) != len(p)):
        raise InvalidHeader("rans16 payload size mismatch")
    if full:
        return sizes, pre6, p[off2:], sync_t, sync6
    return sizes, pre6, p[off2:]


def decode_groups(
    payloads: List[bytes], table_c: np.ndarray, block_len: int,
    group_lanes: int = None
) -> np.ndarray:
    """Decode per-group payload bytes back to (NG*g, L) symbol rows.

    ``table_c``: (A,) shared counts, or (NG, A) per-group counts (the
    adaptive rans16 mode).  ``group_lanes`` comes from the container
    (any multiple of 128 the kernels' VMEM budget allows — containers
    written with other widths than the current default still decode)."""
    g = group_lanes if group_lanes else G
    NG = len(payloads)
    a_count = int(table_c.shape[-1])

    if table_c.ndim == 2:
        cums = np.concatenate(
            [np.zeros((table_c.shape[0], 1), np.uint64),
             np.cumsum(table_c, axis=1)], axis=1).astype(np.uint32)
        cum_vreg = jnp.asarray(prep_cum_vreg_batch(cums))
    else:
        cum_vreg = jnp.asarray(prep_cum_vreg(
            np.concatenate([[0], np.cumsum(table_c)]).astype(np.uint32)))
    # pipeline-friendly batches (the ENCODE bound, not the larger decode
    # working-set bound): more, smaller batches let the double-buffered
    # loop overlap batch i+1's stream upload with batch i's symbol fetch,
    # which dominates end-to-end wall on slow links; the chain-interleave
    # factor per batch shrinks accordingly (2 at flagship geometry) but
    # the kernel is a few percent of e2e either way — the full-interleave
    # kernel capability is what bench.py's device metric measures
    # (staged with _groups_per_call_dec)
    gpc = _groups_per_call(block_len, g)
    if NG <= gpc:
        return _decode_finish(
            _decode_batch(payloads, cum_vreg, a_count, block_len, g))
    out = np.empty((NG * g, block_len),
                   np.uint8 if a_count <= 256
                   else np.uint16 if a_count <= 65536 else np.int32)
    bounds = [(s, min(s + gpc, NG)) for s in range(0, NG, gpc)]

    def dispatch(start, stop):
        cv = cum_vreg if cum_vreg.ndim == 2 else cum_vreg[start:stop]
        return _decode_batch(
            payloads[start:stop], cv, a_count, block_len, g)

    # double-buffered: batch i+1's uploads + kernel run while batch i's
    # decoded symbols stream back over the tunnel
    inflight = dispatch(*bounds[0])
    for bi, (start, stop) in enumerate(bounds):
        cur = inflight
        if bi + 1 < len(bounds):
            inflight = dispatch(*bounds[bi + 1])
        out[start * g : stop * g] = _decode_finish(cur)
    return out


def _decode_finish(handle) -> np.ndarray:
    """Fetch + reshape one dispatched batch (blocks on the tunnel).
    Keeps the kernel's narrow output dtype — widening to int32 cost two
    extra GB-scale host copies per decoded gigabyte."""
    flat_dev, NG, g, block_len, trace = handle
    flat = _fetch(flat_dev)
    trace("decoded symbols fetched")
    return flat.reshape(NG * g, block_len)


def _stage_stream_windows(sizes: np.ndarray, region, g: int):
    """Per-tile window staging shared by every decode path (the batch
    decoder, decode_tile_range and the perf harnesses — advisor r4: one
    implementation, not mirrored copies).

    ``sizes`` (nb, NT) halfword sizes in time order; ``region`` the
    concatenated region bytes (or a uint8 view).  Returns
    ``(stream_rows, ridx, starts, rpad)``: zero-padded (R, 128) LE word
    rows, the covering-row gather index, per-tile start offsets, and the
    padded rows per tile window (>= the kernel's refill-window slack)."""
    nb, NT = sizes.shape
    region = np.frombuffer(region, np.uint8) if isinstance(
        region, (bytes, bytearray, memoryview)) else region.view(np.uint8)
    flat_sz = sizes.reshape(-1)
    H = np.concatenate([[0], np.cumsum(flat_sz)])[:-1]
    a_row = (H >> 8).astype(np.int64)
    b_row = (H + flat_sz + 255) >> 8
    rpad = _rpad_for(int((b_row - a_row).max(initial=1)), g)
    R = -(-max(region.size // 2, 1) // (256 * 8)) * 8  # word rows, 8-align
    ridx = np.minimum(
        a_row[:, None] + np.arange(rpad)[None, :], max(R - 1, 0)
    ).astype(np.int32).reshape(-1)
    starts = (H & 255).astype(np.int32).reshape(nb, NT)
    buf = np.zeros(R * 512, np.uint8)
    buf[: region.size] = region
    return buf.view("<u4").reshape(R, 128), ridx, starts, rpad


def _states_to_words(states6_list, g: int) -> np.ndarray:
    """Per-group 6-byte LE lane states -> (nb, 2*g/128, 128) u32 word
    pairs (lane l = words 2l lo / 2l+1 hi) — the kernels' pre layout."""
    nb = len(states6_list)
    pre8 = np.zeros((nb, g, 8), np.uint8)
    for gi, s6 in enumerate(states6_list):
        pre8[gi, :, :6] = np.frombuffer(s6, np.uint8).reshape(g, 6)
    x = pre8.reshape(nb, g * 8).view("<u8")                # (nb, g)
    words = np.empty((nb, 2 * g), np.uint32)
    words[:, 0::2] = (x & 0xFFFFFFFF).astype(np.uint32)
    words[:, 1::2] = (x >> 32).astype(np.uint32)
    return words.reshape(nb, 2 * g // 128, 128)


def _decode_batch(
    payloads: List[bytes], cum_vreg, a_count: int, block_len: int,
    g: int = None
):
    """Parse + upload + dispatch one bounded batch of group payloads.
    Returns a handle for :func:`_decode_finish` (device work in flight)."""
    g = g if g else G
    NG = len(payloads)
    interp = _interpret()

    trace = _tracer()
    parsed = [_parse_payload(p, block_len, g) for p in payloads]
    NT = parsed[0][0].shape[0]
    if any(s.shape[0] != NT for s, _, _ in parsed):
        raise InvalidHeader("rans16 payloads disagree on tile count")
    sizes = np.stack([s for s, _, _ in parsed])            # (NG, NT)
    region = b"".join(bytes(r) for _, _, r in parsed)
    trace(f"dec batch parsed ({len(region)} region bytes)")

    rows_np, ridx, starts, rpad = _stage_stream_windows(sizes, region, g)
    NT = sizes.shape[1]
    stream_rows = _put(rows_np)
    pre = jnp.asarray(_states_to_words([p6 for _, p6, _ in parsed], g))

    out_dtype = (jnp.uint8 if a_count <= 256
                 else jnp.uint16 if a_count <= 65536 else jnp.int32)
    trace("uploads staged; decode dispatch")
    flat_dev = _decode_fused(
        stream_rows, jnp.asarray(ridx), jnp.asarray(starts), pre, cum_vreg,
        ng=NG, nt=NT, rpad=rpad, block_len=block_len, a_count=a_count,
        out_dtype=out_dtype, interpret=interp)
    return (flat_dev, NG, g, block_len, trace)


def decode_tile_range(
    payload, table_c: np.ndarray, block_len: int,
    step_lo: int, step_hi: int, group_lanes: int = None,
    *, parsed=None, cum_vreg=None,
):
    """Decode a STEP range of one group payload without decoding the rest.

    Starts at the nearest sync point at or before ``step_lo`` (the
    preamble when the payload has no sync section — sizes still let the
    decode stop at ``step_hi``, so the tail is never decoded) and decodes
    through ``step_hi``.  Returns ``(rows (g, steps), step0)`` where
    ``rows[:, s - step0]`` is every lane's symbol at step ``s`` —
    tile-level random access (SURVEY §5 checkpoint/resume at the shipping
    geometry; VERDICT r3 item 6).

    ``parsed`` / ``cum_vreg``: optional pre-parsed payload (the
    ``_parse_payload(..., full=True)`` tuple) and prepped table vreg —
    many-slice readers (api._decode_range_rans16) pass them to avoid
    re-parsing a multi-MB payload and re-prepping the table per slice
    (advisor r4).
    """
    g = group_lanes if group_lanes else G
    if parsed is None:
        parsed = _parse_payload(payload, block_len, g, full=True)
    sizes, pre6, region, sync_t, sync6 = parsed
    NT = sizes.shape[0]
    tile = block_len // NT
    if not 0 <= step_lo < step_hi <= block_len:
        raise ConfigError(
            f"step range [{step_lo}, {step_hi}) outside [0, {block_len})")
    tile_lo = step_lo // tile
    tile_hi = -(-step_hi // tile)
    if sync_t:
        j = min(tile_lo // sync_t, (NT - 1) // sync_t)
    else:
        j = 0
    t0 = j * sync_t
    states6 = bytes(pre6) if j == 0 else bytes(
        sync6[(j - 1) * 6 * g : j * 6 * g])
    nt_sub = tile_hi - t0
    sub_sizes = sizes[t0:tile_hi]
    off_hw = int(sizes[:t0].sum())
    region_hw = np.frombuffer(region, "<u2")[
        off_hw : off_hw + int(sub_sizes.sum())]

    rows_np, ridx, starts, rpad = _stage_stream_windows(
        sub_sizes.reshape(1, nt_sub), region_hw, g)
    pre = jnp.asarray(_states_to_words([states6], g))

    a_count = int(table_c.shape[-1])
    out_dtype = (jnp.uint8 if a_count <= 256
                 else jnp.uint16 if a_count <= 65536 else jnp.int32)
    if cum_vreg is None:
        cum_vreg = jnp.asarray(prep_cum_vreg(
            np.concatenate([[0], np.cumsum(table_c)]).astype(np.uint32)))
    flat = _fetch(_decode_fused(
        jnp.asarray(rows_np), jnp.asarray(ridx), jnp.asarray(starts),
        pre, cum_vreg,
        ng=1, nt=nt_sub, rpad=rpad, block_len=nt_sub * tile,
        a_count=a_count, out_dtype=out_dtype, interpret=_interpret()))
    return (flat.astype(np.int32).reshape(g, nt_sub * tile), t0 * tile)


def _shrink_lane_len(n: int, L: int, group_lanes: int = None) -> int:
    """Smallest valid lane length that still covers ``n`` symbols with one
    group, capped at the requested ``L`` — long lanes only pay off when
    there is data to fill them, and shrinking caps the padding waste.
    Valid lengths: any value <= the tile size, else multiples of it."""
    g = group_lanes if group_lanes else G
    ts = tile_steps_for(g)
    need = max(1, -(-n // g))
    if need >= L:
        return L
    if need <= ts:
        return need
    return min(L, -(-need // ts) * ts)


def encode(
    symbols: np.ndarray,
    *,
    alphabet: int,
    table: Pow2Table | None = None,
    block_len: int,
    with_checksums: bool = True,
    per_group_tables: bool = False,
    sync_tiles: int = 0,
    group_lanes: int = None,
) -> bytes:
    """Compress a 1-D integer symbol array into a rans16 container.

    ``block_len`` is the REQUESTED lane length; it is shrunk (to a
    multiple of the tile size, or less for tiny inputs) when the input is
    too small to fill even one group at that length.

    ``table=None`` builds the shared order-0 table ON DEVICE from the
    uploaded data (one-hot MXU histogram) — np.bincount costs seconds at
    GB scale on this class of host, and the data has to go up anyway.

    ``per_group_tables=True`` is the ADAPTIVE rans16 mode: a separate
    order-0 table per group of ``group_lanes * L`` symbols (two-pass:
    device histogram per group, then the same kernels with group-indexed
    table blocks — adaptive coding at full kernel speed).  Pick a small
    ``block_len`` so groups are small enough to adapt, and consider
    ``group_lanes=1024``: narrower groups halve the 6 B/lane state
    overhead per symbol at a fixed adaptive group size (the default
    2048-lane groups maximize shared-table throughput instead).
    """
    if table is not None and table.k != 16:
        raise ConfigError("rans16 profile requires k == 16")
    if per_group_tables and table is not None:
        raise ConfigError("per_group_tables builds its own tables")
    if alphabet > 1023:
        raise ConfigError(
            f"alphabet {alphabet} exceeds the rans16 limit of 1023 "
            "symbols (one cum-table vreg holds A+1 entries); use the "
            "planar profile — api.encode falls back automatically")
    n = int(symbols.size)
    g = group_lanes if group_lanes else G
    if not (128 <= g <= 65536 and g & (g - 1) == 0):
        raise ConfigError(
            f"group_lanes {g} must be a power of two in [128, 65536]")
    _tile_geometry(block_len, g)  # validate requested geometry
    if n >= 1 << 31:
        # beyond the single-call bound (the device histogram accumulates
        # in int32) the input is encoded in SLABS of whole groups appended
        # into ONE container — the unbounded-input analogue of the
        # reference's streaming Encoder (src/encoder.rs:24-46)
        return _encode_chunked(
            symbols, alphabet=alphabet, table=table, block_len=block_len,
            with_checksums=with_checksums,
            per_group_tables=per_group_tables, sync_tiles=sync_tiles, g=g)
    L = _shrink_lane_len(n, block_len, g)
    ng = max(1, math.ceil(n / (g * L)))

    narrow = (symbols if alphabet > 256
              else symbols.astype(np.uint8, copy=False))
    from .models.table import build_table_pow2

    if per_group_tables:
        # device path: per-group histograms want the data resident, and
        # the one upload is amortized by the MXU histogram + kernels
        data_dev = _put(narrow)
        # pad with the last data symbol: guaranteed present in the last
        # group's histogram (a zero-frequency pad would be uncodable)
        pad_symbol = int(symbols[-1]) if n else 0
        padded = _pad_rows_device(
            data_dev, np.asarray(pad_symbol, narrow.dtype),
            rows=ng * g, length=L)
        counts = np.asarray(_histogram_groups(
            padded.reshape(-1), alphabet=alphabet, n_groups=ng)
        ).astype(np.uint64)
        if n == 0:
            counts[:] = 1
        tables = [build_table_pow2(c, 16) for c in counts]
        payloads = encode_groups(padded, tables, L, sync_tiles, g)
        tables_c = np.stack([t.c for t in tables])
    else:
        # HOST histogram + host padding: u8/u16 bincount costs ~0.3 s per
        # 64 MB, and keeping the rows host-side lets encode_groups upload
        # PER BATCH — its double-buffering then overlaps batch i+1's H2D
        # with batch i's region fetch.  The round-3/4 design uploaded the
        # whole corpus first (for the device histogram), serializing
        # seconds of tunnel ahead of the pipeline.
        if table is None:
            if n == 0:
                counts = np.ones(max(alphabet, 1), np.uint64)
            else:
                hist_src = (narrow if narrow.dtype == np.uint8
                            else narrow.astype(np.uint16, copy=False))
                counts = np.zeros(alphabet, np.int64)
                step = 1 << 28
                for i in range(0, n, step):
                    counts += np.bincount(
                        hist_src[i : i + step],
                        minlength=alphabet)[:alphabet]
                counts = counts.astype(np.uint64)
            table = build_table_pow2(counts, 16)
        pad_symbol = int(np.argmax(table.c))
        rows_host = np.full(ng * g * L, pad_symbol, narrow.dtype)
        rows_host[:n] = narrow
        payloads = encode_groups(
            rows_host.reshape(ng * g, L), table, L, sync_tiles, g)
        tables_c = table.c
    return fmt.pack(
        k=16,
        alphabet=alphabet,
        block_len=L,
        n_symbols=n,
        payloads=payloads,
        tables_c=tables_c,
        per_block_tables=per_group_tables,
        with_checksums=with_checksums,
        profile="rans16",
        group_lanes=g,
    )


#: symbols per slab in the chunked (>= 2^31 symbols) encode path —
#: rounded down to whole groups; each slab runs the standard batched
#: device pipeline and appends its groups to the one container
_SLAB_SYMBOLS = 1 << 30


def _encode_chunked(
    symbols: np.ndarray, *, alphabet: int, table, block_len: int,
    with_checksums: bool, per_group_tables: bool, sync_tiles: int, g: int
) -> bytes:
    """Multi-slab encode for inputs past the single-call 2^31-symbol cap
    (BASELINE config 4, 10 GB): whole-group slabs stream through
    :func:`encode_groups`, payloads append into one container.

    The shared table comes from a HOST histogram pass (u8 ``np.bincount``
    runs ~0.3 s per 64 MB — far cheaper than uploading the corpus twice
    over the tunnel for the device histogram); per-group tables likewise
    build host-side per slab.  The container is identical in structure to
    the single-call output — decode needs no special handling.
    """
    from .models.table import build_table_pow2

    n = int(symbols.size)
    L = block_len
    span = g * L
    narrow = (symbols if symbols.dtype == np.uint8
              else symbols.astype(np.uint8) if alphabet <= 256
              else symbols.astype(np.uint16) if alphabet <= 65536
              else symbols)
    slab = max(1, _SLAB_SYMBOLS // span) * span

    if not per_group_tables and table is None:
        counts = np.zeros(alphabet, np.int64)
        step = 1 << 28
        for i in range(0, n, step):
            counts += np.bincount(narrow[i : i + step],
                                  minlength=alphabet)[:alphabet]
        table = build_table_pow2(counts.astype(np.uint64), 16)
    pad_symbol = (int(np.argmax(table.c)) if not per_group_tables
                  else int(narrow[-1]))

    payloads: List[bytes] = []
    tables_per_group: List = []
    for s0 in range(0, n, slab):
        part = narrow[s0 : min(s0 + slab, n)]
        ng = -(-part.size // span)
        if part.size < ng * span:  # last slab: pad to whole groups
            full = np.full(ng * span, pad_symbol, narrow.dtype)
            full[: part.size] = part
            part = full
        rows = part.reshape(ng * g, L)
        if per_group_tables:
            slab_tables = []
            for gi in range(ng):
                cnt = np.bincount(rows[gi * g : (gi + 1) * g].reshape(-1),
                                  minlength=alphabet)[:alphabet]
                slab_tables.append(build_table_pow2(
                    cnt.astype(np.uint64), 16))
            payloads += encode_groups(rows, slab_tables, L, sync_tiles, g)
            tables_per_group += [t.c for t in slab_tables]
        else:
            payloads += encode_groups(rows, table, L, sync_tiles, g)
    return fmt.pack(
        k=16,
        alphabet=alphabet,
        block_len=L,
        n_symbols=n,
        payloads=payloads,
        tables_c=(np.stack(tables_per_group) if per_group_tables
                  else table.c),
        per_block_tables=per_group_tables,
        with_checksums=with_checksums,
        profile="rans16",
        group_lanes=g,
    )


def decode(cont: fmt.Container) -> np.ndarray:
    """Decompress a parsed rans16 container back to the symbol array."""
    if cont.profile != "rans16":
        raise ConfigError("not a rans16 container")
    gl = cont.group_lanes
    if gl < 128 or gl % 128:
        raise ConfigError(
            f"container group_lanes {gl} is not a multiple of 128")
    rows = decode_groups(cont.payloads, np.asarray(cont.tables_c),
                         cont.block_len, gl)
    return rows.reshape(-1)[: cont.n_symbols]
