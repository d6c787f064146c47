"""Host orchestration for the rans16 profile: array <-> container.

The device kernels (kernels/rans_encode.py, kernels/rans_decode.py) work in
group granularity; this module chooses geometry, sizes capacities from the
table's entropy (retrying bigger on the kernel's overflow signal), batches
groups into bounded device invocations, and assembles/parses the container
(format.py, FLAG_RANS16).

Symbol order contract: lane ``l`` of group ``g`` encodes the flat segment
``[(g * G + l) * L, (g * G + l + 1) * L)`` — i.e. ``reshape(NG * G, L)``
row-major, exactly like the planar profile's blocks.
"""

from __future__ import annotations

import math
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import format as fmt
from . import rans
from .errors import ConfigError
from .kernels.decode_pallas import prep_cum_vreg
from .kernels.encode_pallas import symbols_to_step_major
from .kernels.rans_decode import rans_decode_words, stream_bytes_to_words
from .kernels.rans_encode import pack_expanded, rans_encode_tiles
from .models.table import Pow2Table

G = rans.GROUP_LANES


def _interpret() -> bool:
    """Mosaic only compiles for TPU; interpret the kernels elsewhere
    (CPU test meshes) — identical semantics, slower."""
    return jax.default_backend() != "tpu"

#: device-invocation bound: groups per call (VMEM is per-group; HBM holds
#: the batch).  8 groups x 2048 syms/lane = 16M symbols per call.
_GROUPS_PER_CALL = 8


def _entropy_bits(table: Pow2Table) -> float:
    c = table.c.astype(np.float64)
    p = c / float(1 << table.k)
    nz = p > 0
    return float(-(p[nz] * np.log2(p[nz])).sum())


def _cap_hw_for(L: int, bits: float, attempt: int) -> int:
    """Per-group region capacity (halfwords), growing with each retry."""
    base = G * L * bits / 16.0
    cap = int(base * (1.3 * (2 ** attempt)) + 8192)
    cap = min(cap, G * L)  # hard bound: one halfword per symbol per step
    return -(-cap // 1024) * 1024


def encode_groups(
    symbols: np.ndarray, table: Pow2Table, block_len: int
) -> List[bytes]:
    """Encode (NG*G, L) padded symbol rows into per-group stream bytes."""
    n_rows, L = symbols.shape
    if L != block_len or n_rows % G:
        raise ConfigError(f"bad group geometry ({n_rows}, {L})")
    NG = n_rows // G
    cum_vreg = jnp.asarray(prep_cum_vreg(table.cum))
    bits = max(_entropy_bits(table), 0.05)
    a_count = int(table.c.shape[0])

    payloads: List[bytes] = []
    for start in range(0, NG, _GROUPS_PER_CALL):
        stop = min(start + _GROUPS_PER_CALL, NG)
        chunk = symbols[start * G : stop * G]
        sym_t = symbols_to_step_major(jnp.asarray(chunk))
        attempt = 0
        while True:
            cap_hw = _cap_hw_for(L, bits, attempt)
            pre, exp, cur = rans_encode_tiles(
                sym_t, cum_vreg, block_len=L, a_count=a_count,
                cap_hw=cap_hw, interpret=_interpret(),
            )
            cur_np = np.asarray(cur)
            if int(cur_np.min()) >= 0:
                break
            attempt += 1
            if cap_hw >= G * L:  # already at the hard bound: impossible
                raise AssertionError("rans16 capacity exceeded hard bound")
        packed = np.asarray(pack_expanded(exp))
        pre_np = np.asarray(pre)
        for g in range(stop - start):
            c = int(cur_np[g, 0])
            payloads.append(
                pre_np[g].reshape(-1).astype("<u4").tobytes()
                + packed[g].reshape(-1).astype("<u4").tobytes()[
                    2 * c : 2 * cap_hw
                ]
            )
    return payloads


def decode_groups(
    payloads: List[bytes], table_c: np.ndarray, block_len: int
) -> np.ndarray:
    """Decode per-group stream bytes back to (NG*G, L) symbol rows."""
    NG = len(payloads)
    a = int(table_c.shape[0])
    cum = np.concatenate([[0], np.cumsum(table_c)]).astype(np.uint32)
    cum_vreg = jnp.asarray(prep_cum_vreg(cum))
    out = np.empty((NG * G, block_len), np.int32)
    for start in range(0, NG, _GROUPS_PER_CALL):
        stop = min(start + _GROUPS_PER_CALL, NG)
        batch = payloads[start:stop]
        rows = max((len(p) + 511) // 512 for p in batch) + 10
        rows = -(-rows // 8) * 8
        words = jnp.asarray(
            np.stack([stream_bytes_to_words(p, rows) for p in batch])
        )
        dec = rans_decode_words(
            words, cum_vreg, block_len=block_len, a_count=a,
            interpret=_interpret(),
        )
        out[start * G : stop * G] = np.asarray(dec).reshape(
            (stop - start) * G, block_len
        )
    return out


def encode(
    symbols: np.ndarray,
    *,
    alphabet: int,
    table: Pow2Table,
    block_len: int,
    with_checksums: bool = True,
) -> bytes:
    """Compress a 1-D int32 symbol array into a rans16 container."""
    if table.k != 16:
        raise ConfigError("rans16 profile requires k == 16")
    from .kernels.rans_encode import TILE_STEPS

    if block_len > TILE_STEPS and block_len % TILE_STEPS:
        raise ConfigError(
            f"rans16 block_len {block_len} must be <= {TILE_STEPS} or a "
            f"multiple of it"
        )
    n = int(symbols.size)
    L = block_len
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
