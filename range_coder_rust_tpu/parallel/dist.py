"""Sharded block-parallel codec over a device mesh.

Design (SPMD, scaling-book recipe): pick a 1-D mesh over all devices, shard
the block axis ``B`` across it, replicate the frequency table, and let XLA
insert the collectives.  The coder's math is purely elementwise over the
block axis (blocks.py), so partitioning introduces **zero** communication in
the hot loop — the only collectives are the table broadcast (replicated
sharding) and the host gather of per-block lengths/payloads for container
assembly, the XLA-native analogue of the reference's in-process byte
appends (src/encoder.rs:35; SURVEY.md §2 'communication backend').

Works identically on one real TPU chip, a v5p slice, or N virtual CPU
devices (``--xla_force_host_platform_device_count``) — the mesh is the only
degree of freedom.
"""

from __future__ import annotations

import functools
from typing import Callable, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..blocks import compact_emissions, decode_blocks, encode_scan

#: the single mesh axis name: blocks are the unit of data parallelism
AXIS = "blocks"


def default_mesh(devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """1-D mesh over all (or the given) devices."""
    devs = list(devices) if devices is not None else jax.devices()
    return Mesh(np.array(devs), (AXIS,))


def block_sharding(mesh: Mesh) -> NamedSharding:
    """Rows (= blocks) split across the mesh; trailing dims replicated."""
    return NamedSharding(mesh, P(AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def make_sharded_codec(
    mesh: Mesh, *, k: int, block_len: int, capacity: int
) -> Tuple[Callable, Callable]:
    """Jitted (encode, decode) with explicit input/output shardings.

    encode(symbols (B, L) int32, c (A,), cum (A+1,)) -> (code (B, C) u8,
    lengths (B,) i32); decode(code (B, C) u8, c, cum) -> symbols (B, L).
    ``B`` must be a multiple of the mesh size for even sharding.
    """
    shard_b = block_sharding(mesh)
    repl = replicated(mesh)

    enc_scan = jax.jit(
        functools.partial(encode_scan.__wrapped__, k=k),
        in_shardings=(shard_b, repl, repl),
        out_shardings=(shard_b,) * 5,
    )
    enc_compact = jax.jit(
        functools.partial(compact_emissions.__wrapped__, capacity=capacity),
        in_shardings=(shard_b,) * 4,
        out_shardings=shard_b,
    )

    def enc(symbols, c, cum):
        ehi, elo, en, pos, lengths = enc_scan(symbols, c, cum)
        return enc_compact(ehi, elo, en, pos), lengths
    dec = jax.jit(
        functools.partial(decode_blocks.__wrapped__, k=k, block_len=block_len),
        in_shardings=(shard_b, repl, repl),
        out_shardings=shard_b,
    )
    return enc, dec
