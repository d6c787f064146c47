"""Host orchestration for the rans16 profile: array <-> container.

The device kernels (kernels/rans_encode.py, kernels/rans_decode.py) work in
group granularity; this module chooses geometry, sizes capacities from the
table's entropy (retrying bigger on the kernel's overflow signal), batches
groups into bounded device invocations, and assembles/parses the container
(format.py, FLAG_RANS16).

Symbol order contract: lane ``l`` of group ``g`` encodes the flat segment
``[(g * G + l) * L, (g * G + l + 1) * L)`` — i.e. ``reshape(NG * G, L)``
row-major, exactly like the planar profile's blocks.

## Segment chaining (long lanes)

The per-lane fixed cost is ~56 bits (the stored final state minus the
information it carries), so the compressed rate is ``H_q + 56/L`` bits/sym
— beating the scalar reference's stream size (BASELINE acceptance) needs
``L`` in the tens of thousands, far beyond what one kernel invocation's
VMEM stream buffer can hold.  Lanes longer than ``SEG`` are therefore
encoded in SEG-step segments by repeated kernel calls that thread the lane
states through (``st_in``/``return_state``): the encoder runs backward, so
segment ``NS-1`` is encoded first and segment 0 last; each segment's
emissions are exactly the halfwords the decoder refills during that
segment, so each segment's region section is self-delimiting and the
decoder simply runs the same chain forward (segment 0 primed from the
preamble, later segments with carried states and a bare region buffer).

Per-group payload layout:

    u32 NS | u32 region_bytes[NS] | preamble (8 * G bytes) | regions 0..NS-1
"""

from __future__ import annotations

import math
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import format as fmt
from . import rans
from .errors import ConfigError, InvalidHeader
from .kernels.decode_pallas import prep_cum_vreg
from .kernels.encode_pallas import symbols_to_step_major
from .kernels.rans_decode import rans_decode_words, stream_bytes_to_words
from .kernels.rans_encode import TILE_STEPS, pack_expanded, rans_encode_tiles
from .models.table import Pow2Table

G = rans.GROUP_LANES

#: steps per chained kernel invocation — sized so one segment's stream /
#: expanded buffers fit VMEM comfortably (~3.5 MB at 8 bits/sym)
SEG = 2048


def _interpret() -> bool:
    """Mosaic only compiles for TPU; interpret the kernels elsewhere
    (CPU test meshes) — identical semantics, slower."""
    return jax.default_backend() != "tpu"

#: device-invocation bound: groups per call (VMEM is per-group; HBM holds
#: the batch)
_GROUPS_PER_CALL = 8


def _entropy_bits(table: Pow2Table) -> float:
    c = table.c.astype(np.float64)
    p = c / float(1 << table.k)
    nz = p > 0
    return float(-(p[nz] * np.log2(p[nz])).sum())


def _cap_hw_for(L: int, bits: float, attempt: int) -> int:
    """Per-group per-segment region capacity (halfwords), growing with
    each retry."""
    base = G * L * bits / 16.0
    cap = int(base * (1.2 * (2 ** attempt)) + 4096)
    cap = min(cap, G * L)  # hard bound: one halfword per symbol per step
    return -(-cap // 1024) * 1024


def _segments(block_len: int, seg: int) -> Tuple[int, int]:
    """(n_segments, seg_len) for a lane of ``block_len`` steps."""
    if block_len <= seg:
        return 1, block_len
    if block_len % seg:
        raise ConfigError(
            f"rans16 block_len {block_len} must be <= {seg} or a multiple"
        )
    return block_len // seg, seg


def encode_groups(
    symbols: np.ndarray, table: Pow2Table, block_len: int, *, seg: int = SEG
) -> List[bytes]:
    """Encode (NG*G, L) padded symbol rows into per-group payload bytes."""
    n_rows, L = symbols.shape
    if L != block_len or n_rows % G:
        raise ConfigError(f"bad group geometry ({n_rows}, {L})")
    NG = n_rows // G
    NS, seg_len = _segments(block_len, seg)
    cum_vreg = jnp.asarray(prep_cum_vreg(table.cum))
    bits = max(_entropy_bits(table), 0.05)
    a_count = int(table.c.shape[0])

    payloads: List[bytes] = []
    for start in range(0, NG, _GROUPS_PER_CALL):
        stop = min(start + _GROUPS_PER_CALL, NG)
        nb = stop - start
        chunk = symbols[start * G : stop * G]
        regions: List[List[bytes]] = [[] for _ in range(nb)]
        state = None
        pre_np = None
        for s in range(NS - 1, -1, -1):
            chunk_s = chunk[:, s * seg_len : (s + 1) * seg_len]
            sym_t = symbols_to_step_major(jnp.asarray(chunk_s))
            attempt = 0
            while True:
                cap_hw = _cap_hw_for(seg_len, bits, attempt)
                pre, exp, cur, st_out = rans_encode_tiles(
                    sym_t, cum_vreg, block_len=seg_len, a_count=a_count,
                    cap_hw=cap_hw, st_in=state, chain=state is not None,
                    return_state=True, interpret=_interpret(),
                )
                cur_np = np.asarray(cur)
                if int(cur_np.min()) >= 0:
                    break
                attempt += 1
                if cap_hw >= G * seg_len:  # already at the hard bound
                    raise AssertionError("rans16 capacity exceeded hard bound")
            state = st_out
            packed = np.asarray(pack_expanded(exp))
            for g in range(nb):
                c = int(cur_np[g, 0])
                regions[g].insert(0, packed[g].reshape(-1).astype(
                    "<u4").tobytes()[2 * c : 2 * cap_hw])
            if s == 0:
                pre_np = np.asarray(pre)
        for g in range(nb):
            sizes = np.array([len(r) for r in regions[g]], "<u4")
            payloads.append(
                np.uint32(NS).tobytes()
                + sizes.tobytes()
                + pre_np[g].reshape(-1).astype("<u4").tobytes()
                + b"".join(regions[g])
            )
    return payloads


def _parse_payload(p: bytes, block_len: int, seg: int):
    """Split one group payload -> (preamble bytes, [region bytes])."""
    NS, seg_len = _segments(block_len, seg)
    if len(p) < 4:
        raise InvalidHeader("rans16 payload too short")
    ns = int(np.frombuffer(p[:4], "<u4")[0])
    if ns != NS:
        raise InvalidHeader(
            f"rans16 payload has {ns} segments, geometry implies {NS}"
        )
    head = 4 + 4 * NS
    sizes = np.frombuffer(p[4:head], "<u4").astype(np.int64)
    pre = p[head : head + 8 * G]
    if len(pre) != 8 * G or head + 8 * G + int(sizes.sum()) != len(p):
        raise InvalidHeader("rans16 payload size mismatch")
    regions = []
    off = head + 8 * G
    for sz in sizes.tolist():
        regions.append(p[off : off + sz])
        off += sz
    return pre, regions


def decode_groups(
    payloads: List[bytes], table_c: np.ndarray, block_len: int,
    *, seg: int = SEG
) -> np.ndarray:
    """Decode per-group payload bytes back to (NG*G, L) symbol rows."""
    NG = len(payloads)
    a = int(table_c.shape[0])
    NS, seg_len = _segments(block_len, seg)
    cum = np.concatenate([[0], np.cumsum(table_c)]).astype(np.uint32)
    cum_vreg = jnp.asarray(prep_cum_vreg(cum))
    out = np.empty((NG * G, block_len), np.int32)
    for start in range(0, NG, _GROUPS_PER_CALL):
        stop = min(start + _GROUPS_PER_CALL, NG)
        nb = stop - start
        parsed = [_parse_payload(p, block_len, seg)
                  for p in payloads[start:stop]]
        state = None
        for s in range(NS):
            bufs = [
                (pre + regions[s]) if s == 0 else regions[s]
                for pre, regions in parsed
            ]
            rows = max((len(b) + 511) // 512 for b in bufs) + 10
            rows = -(-rows // 8) * 8
            words = jnp.asarray(
                np.stack([stream_bytes_to_words(b, rows) for b in bufs])
            )
            dec, state = rans_decode_words(
                words, cum_vreg, block_len=seg_len, a_count=a,
                st_in=state, primed=s == 0, return_state=True,
                interpret=_interpret(),
            )
            out[start * G : stop * G,
                s * seg_len : (s + 1) * seg_len] = np.asarray(dec).reshape(
                nb * G, seg_len)
    return out


def _shrink_lane_len(n: int, L: int) -> int:
    """Smallest valid lane length that still covers ``n`` symbols with one
    group, capped at the requested ``L`` — long lanes only pay off when
    there is data to fill them, and shrinking caps the padding waste.
    Valid lengths: any value <= TILE_STEPS, multiples of TILE_STEPS up to
    SEG, multiples of SEG beyond (kernel tiling / segment constraints)."""
    need = max(1, -(-n // G))
    if need >= L:
        return L
    if need <= TILE_STEPS:
        return need
    if need <= SEG:
        return min(L, -(-need // TILE_STEPS) * TILE_STEPS)
    return min(L, -(-need // SEG) * SEG)


def encode(
    symbols: np.ndarray,
    *,
    alphabet: int,
    table: Pow2Table,
    block_len: int,
    with_checksums: bool = True,
) -> bytes:
    """Compress a 1-D int32 symbol array into a rans16 container.

    ``block_len`` is the REQUESTED lane length; it is shrunk (to a
    multiple of SEG, or less for tiny inputs) when the input is too small
    to fill even one group at that length — long lanes only pay off when
    there is data to fill them, and shrinking caps the padding waste.
    """
    if table.k != 16:
        raise ConfigError("rans16 profile requires k == 16")
    n = int(symbols.size)
    _segments(block_len, SEG)  # validate requested geometry
    L = _shrink_lane_len(n, block_len)
    ng = max(1, math.ceil(n / (G * L)))
    pad_symbol = int(np.argmax(table.c))
    padded = np.full(ng * G * L, pad_symbol, np.int32)
    padded[:n] = symbols
    payloads = encode_groups(padded.reshape(ng * G, L), table, L)
    return fmt.pack(
        k=16,
        alphabet=alphabet,
        block_len=L,
        n_symbols=n,
        payloads=payloads,
        tables_c=table.c,
        with_checksums=with_checksums,
        profile="rans16",
        group_lanes=G,
    )


def decode(cont: fmt.Container) -> np.ndarray:
    """Decompress a parsed rans16 container back to the symbol array."""
    if cont.profile != "rans16":
        raise ConfigError("not a rans16 container")
    if cont.group_lanes != G:
        raise ConfigError(
            f"container group_lanes {cont.group_lanes} != supported {G}"
        )
    rows = decode_groups(cont.payloads, cont.tables_c, cont.block_len)
    return rows.reshape(-1)[: cont.n_symbols]
