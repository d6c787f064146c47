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


def make_sharded_rans16(
    mesh: Mesh, *, block_len: int, a_count: int,
    per_group_tables: bool = False
) -> Tuple[Callable, Callable]:
    """Mesh-sharded rans16 kernels: groups are the data-parallel axis.

    Groups are fully independent coder units (exactly like planar blocks),
    so the partitioning is communication-free; the Pallas kernels run
    per-shard under ``shard_map`` (XLA's GSPMD cannot split a pallas_call
    by itself).  Outputs are bit-identical to the single-device kernels —
    container assembly downstream is unchanged, which is what makes the
    sharded container byte-identical (tests/test_parallel.py).

    With G = rans.GROUP_LANES (2048 default; kernels are width-generic,
    the width is derived from the input shapes):

    encode(rows (NG*G, L) any-int, cum_vreg (8,128) u32,
           enc_aux (16,128) u32 barrett_rows)
      -> (pre (NG,2G/128,128) u32, exp (NG,NT,rows_e,128) u32,
          sizes (NG,NT))
    decode(padded (NG,NT,rpad,128) u32, starts (NG,NT) i32,
           pre (NG,2G/128,128) u32, cum_vreg) -> (NG, G, L) i32

    ``NG`` must be a multiple of the mesh size.
    """
    import jax.numpy as jnp

    from ..kernels.rans_decode import rans_decode_tiled
    from ..kernels.rans_encode import rans_encode_tiled
    from ..kernels.vreg import symbols_to_step_major

    P = jax.sharding.PartitionSpec
    interp = jax.default_backend() != "tpu"
    # per-group (adaptive) tables ride the group axis with their groups;
    # a shared table is replicated
    t_spec = P(AXIS) if per_group_tables else P()

    def enc_local(rows, cum_vreg, enc_aux):
        sym = symbols_to_step_major(rows.astype(jnp.int32))
        return rans_encode_tiled(
            sym, cum_vreg, enc_aux, block_len=block_len, a_count=a_count,
            interpret=interp)

    # check_vma=False: pallas_call out_shapes carry no varying-mesh-axis
    # metadata, and the kernels touch no collectives anyway
    enc = jax.jit(jax.shard_map(
        enc_local, mesh=mesh,
        in_specs=(P(AXIS), t_spec, t_spec),
        out_specs=(P(AXIS), P(AXIS), P(AXIS)),
        check_vma=False,
    ))

    def dec_local(padded, starts, pre, cum_vreg):
        return rans_decode_tiled(
            padded, starts, pre, cum_vreg, block_len=block_len,
            a_count=a_count, interpret=interp)

    dec = jax.jit(jax.shard_map(
        dec_local, mesh=mesh,
        in_specs=(P(AXIS), P(AXIS), P(AXIS), t_spec),
        out_specs=P(AXIS),
        check_vma=False,
    ))
    return enc, dec
