"""Multi-host orchestration: N JAX processes, one global mesh, ordered gather.

The reference has no distribution at all — its only "transport" is an
in-process ``VecDeque`` append/pop (reference src/encoder.rs:35,
src/decoder.rs:33; SURVEY.md §2 "communication backend: NONE").  This module
is the DCN-scale answer mandated by SURVEY.md §5/§7 step 7:

* processes join via :func:`initialize` (``jax.distributed``);
* the block axis is sharded over ONE global 1-D mesh spanning every chip of
  every host — the coder math is elementwise over blocks (blocks.py), so
  the hot loop still has **zero** communication;
* the two real collectives ride outside the hot loop, exactly as planned in
  SURVEY.md §2: per-block compressed lengths are all-gathered so every host
  knows the container offsets, and the fixed-capacity payload rows are
  gathered (ICI within a slice, DCN across hosts) so process 0 can assemble
  the container in block order;
* container assembly itself (trim rows by length, pack) is host-side and
  identical to the single-host path (format.py) — byte-for-byte the same
  container regardless of process count, which is what the tests pin.

Works the same on real multi-host TPU slices and on N local CPU processes
(``jax.distributed.initialize`` + ``--xla_force_host_platform_device_count``),
which is how tests/test_multihost.py exercises the DCN path on one machine.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

import jax
from jax.experimental import multihost_utils

from .. import format as fmt
from ..blocks import default_capacity
from .dist import AXIS, block_sharding, default_mesh, make_sharded_codec, replicated


def initialize(
    coordinator_address: str,
    num_processes: int,
    process_id: int,
    **kw,
) -> None:
    """Join the process group (thin wrapper over ``jax.distributed``).

    On TPU pods the three arguments are auto-detected and callers can use
    ``jax.distributed.initialize()`` directly; this wrapper exists so CPU
    simulations and tests pass them explicitly.
    """
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        **kw,
    )


def global_mesh() -> jax.sharding.Mesh:
    """1-D mesh over every device of every process (ICI + DCN)."""
    return default_mesh(jax.devices())


def local_block_range(n_blocks: int, mesh: Optional[jax.sharding.Mesh] = None
                      ) -> Tuple[int, int]:
    """The [start, stop) rows of the global block axis this process owns.

    Blocks are laid out contiguously in mesh-device order, so a process's
    rows are those of its addressable devices.  ``n_blocks`` must divide
    evenly over the mesh (pad the corpus to a multiple — api.py's padding
    rule applies globally).
    """
    mesh = mesh or global_mesh()
    devs = list(mesh.devices.flat)
    n_dev = len(devs)
    if n_blocks % n_dev:
        raise ValueError(f"{n_blocks} blocks not divisible by {n_dev} devices")
    per = n_blocks // n_dev
    mine = [i for i, d in enumerate(devs) if d.process_index == jax.process_index()]
    if mine != list(range(mine[0], mine[0] + len(mine))):
        raise ValueError("mesh devices of one process must be contiguous")
    return mine[0] * per, (mine[0] + len(mine)) * per


def encode_multihost(
    local_rows: np.ndarray,
    c: np.ndarray,
    cum: np.ndarray,
    *,
    k: int,
    n_blocks: int,
    capacity: Optional[int] = None,
    mesh: Optional[jax.sharding.Mesh] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Encode this process's block rows as part of the global batch.

    Arguments:
      local_rows: ``(B_local, L)`` int32 — exactly the rows
        :func:`local_block_range` assigns this process.
      c / cum: the shared pow2 table (replicated to every host by value —
        table build is deterministic, so hosts agree without a broadcast).
      n_blocks: global block count ``B`` (must shard evenly).

    Returns ``(code, lengths)`` **fully replicated on every host** as NumPy:
    ``code (B, C) uint8`` and ``lengths (B,) int32`` in global block order —
    the ordered gather.  Process 0 (or any process) can then assemble the
    container with :func:`assemble_container`.
    """
    mesh = mesh or global_mesh()
    L = int(local_rows.shape[1])
    cap = capacity if capacity is not None else default_capacity(L, k)

    enc, _ = make_sharded_codec(mesh, k=k, block_len=L, capacity=cap)

    sharding = block_sharding(mesh)
    syms = jax.make_array_from_process_local_data(
        sharding, np.ascontiguousarray(local_rows, np.int32), (n_blocks, L)
    )
    repl = replicated(mesh)
    c_g = jax.make_array_from_process_local_data(repl, np.asarray(c, np.uint32))
    cum_g = jax.make_array_from_process_local_data(repl, np.asarray(cum, np.uint32))

    code, lengths = enc(syms, c_g, cum_g)

    # the ordered gather: lengths first (tiny), then the payload rows
    lengths_all = multihost_utils.process_allgather(lengths, tiled=True)
    code_all = multihost_utils.process_allgather(code, tiled=True)
    return np.asarray(code_all), np.asarray(lengths_all).astype(np.int32)


def assemble_container(
    code: np.ndarray,
    lengths: np.ndarray,
    *,
    k: int,
    alphabet: int,
    block_len: int,
    n_symbols: int,
    tables_c: np.ndarray,
    with_checksums: bool = True,
) -> bytes:
    """Trim gathered rows by length and pack the standard container —
    byte-identical to the single-host api.py output for the same corpus."""
    payloads = [code[i, : int(lengths[i])].tobytes() for i in range(code.shape[0])]
    return fmt.pack(
        k=k,
        alphabet=alphabet,
        block_len=block_len,
        n_symbols=n_symbols,
        payloads=payloads,
        tables_c=np.asarray(tables_c, np.uint32),
        per_block_tables=False,
        with_checksums=with_checksums,
    )
