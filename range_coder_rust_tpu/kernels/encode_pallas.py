"""Pallas TPU encode kernel: the hot scan of the encoder, on-chip.

The reference encodes one symbol with a table probe plus ``param_update``
(reference src/encoder.rs:24-37, src/range_coder.rs:53-92).  The planar XLA
``lax.scan`` version (blocks.encode_scan) pays per-step dispatch overhead and
streams every intermediate through HBM; this kernel keeps 1024 coder states
(one (8, 128) vreg pair per u64) in vector registers and advances them over
``TCH``-step tiles, so the only HBM traffic is the symbol tile in and the
emission tile out.

Layout contract (shared with the downstream compaction / interleave):

* symbols  (NG, L*8, 128) int32, **step-major**: row ``t*8 + s`` lane ``lam``
  holds the symbol of flat lane ``s*128 + lam`` at step ``t``;
* outputs ehi/elo (NG, L*8, 128) uint32 and en (NG, L*8, 128) int32 in the
  same step-major layout: the per-transition emitted-low words and byte
  counts (ops/transition.py — the stream bytes for a step are the top ``n``
  bytes of the 64-bit emitted low);
* flush  (NG, 3*8, 128): rows 0-7/8-15 = final low hi/lo bitcast, rows 16-23
  unused (padding to a supported tile) — the 8 residual bytes per lane
  (reference src/encoder.rs:40-46).

The grid is (NG, NT): groups outer, step-tiles inner.  TPU grids execute
sequentially minor-to-major, so the (low, range) state lives in VMEM scratch
and carries across step-tiles of the same group; it reinitializes when the
step-tile index wraps to 0.

Identical math to blocks.encode_scan — tests pin the outputs equal.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops.transition import CoderState, init_state, param_update_pow2
from ..ops.u64 import U64
from .decode_pallas import _bcast_rows, _lookup_rows

_U32 = jnp.uint32
_I32 = jnp.int32

#: steps per grid tile: 64 steps x V groups x 8 rows x 128 lanes x 3
#: outputs x 4 B = 3 MB of VMEM output blocks at V=4 — under the ~16 MB
#: budget with double buffering.
TILE_STEPS = 64

#: groups advanced per kernel instance.  The per-step math is one long
#: dependency chain; V independent group states interleave in the VPU
#: pipeline and buy instruction-level parallelism.
GROUP_BATCH = 4


def _encode_kernel(cum_ref, sym_ref, ehi_ref, elo_ref, en_ref, flush_ref,
                   st_ref, *, k: int, tile_steps: int, n_tiles: int,
                   v: int):
    """One (group-batch, step-tile): advance v*1024 lane coders.

    cum_ref (8, 128) u32 cum table vreg (prep_cum_vreg); sym_ref
    (v, tile_steps*8, 128) i32; outputs as module docstring; st_ref VMEM
    scratch (4, v, 8, 128) u32 persisting the (low, range) limbs across
    step-tiles.
    """
    tau = pl.program_id(1)

    @pl.when(tau == 0)
    def _():
        st0 = init_state((v, 8, 128))
        st_ref[0] = st0.low.hi
        st_ref[1] = st0.low.lo
        st_ref[2] = st0.rng.hi
        st_ref[3] = st0.rng.lo

    cum_rows = _bcast_rows(cum_ref[:])

    def body(t, carry):
        lhi, llo, rhi, rlo = carry
        st = CoderState(U64(lhi, llo), U64(rhi, rlo))
        sym = sym_ref[:, pl.ds(t * 8, 8), :]
        cum_s = _lookup_rows(cum_rows, sym)
        cum_n = _lookup_rows(cum_rows, sym + 1)
        cc = cum_n - cum_s
        st, emit, n = param_update_pow2(st, cc, cum_s, k)
        ehi_ref[:, pl.ds(t * 8, 8), :] = emit.hi
        elo_ref[:, pl.ds(t * 8, 8), :] = emit.lo
        en_ref[:, pl.ds(t * 8, 8), :] = n
        return (st.low.hi, st.low.lo, st.rng.hi, st.rng.lo)

    st = jax.lax.fori_loop(
        0,
        tile_steps,
        body,
        (st_ref[0], st_ref[1], st_ref[2], st_ref[3]),
    )
    st_ref[0], st_ref[1], st_ref[2], st_ref[3] = st

    # flush: after the last tile, the 8 residual low bytes per lane
    # (reference src/encoder.rs:40-46); n == 8 is implicit in the format
    @pl.when(tau == n_tiles - 1)
    def _():
        flush_ref[:, 0:8, :] = st[0]
        flush_ref[:, 8:16, :] = st[1]
        flush_ref[:, 16:24, :] = jnp.zeros((v, 8, 128), _U32)


@functools.partial(
    jax.jit, static_argnames=("k", "block_len", "interpret")
)
def encode_tiles(
    symbols: jax.Array,
    cum_vreg: jax.Array,
    *,
    k: int,
    block_len: int,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Advance all group coders over step-major symbol tiles.

    Arguments:
      symbols: (NG, L*8, 128) int32 step-major (see module docstring).
      cum_vreg: (8, 128) uint32 from decode_pallas.prep_cum_vreg.
      block_len: L, symbols per lane; must be a multiple of TILE_STEPS
        or smaller than it.

    Returns (ehi, elo, en, flush): step-major emission tiles plus the
    (NG, 24, 128) flush rows (low hi / low lo / padding).
    """
    NG, rows, _ = symbols.shape
    if rows != block_len * 8:
        raise ValueError(f"symbols rows {rows} != 8 * block_len {block_len}")
    tile = min(TILE_STEPS, block_len)
    if block_len % tile:
        raise ValueError(
            f"block_len {block_len} not a multiple of tile {tile}"
        )
    v = GROUP_BATCH if NG % GROUP_BATCH == 0 else 1
    n_tiles = block_len // tile
    kern = functools.partial(
        _encode_kernel, k=k, tile_steps=tile, n_tiles=n_tiles, v=v
    )
    ehi, elo, en, flush = pl.pallas_call(
        kern,
        grid=(NG // v, n_tiles),
        out_shape=(
            jax.ShapeDtypeStruct((NG, block_len * 8, 128), _U32),
            jax.ShapeDtypeStruct((NG, block_len * 8, 128), _U32),
            jax.ShapeDtypeStruct((NG, block_len * 8, 128), _I32),
            jax.ShapeDtypeStruct((NG, 24, 128), _U32),
        ),
        in_specs=[
            pl.BlockSpec((8, 128), lambda g, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((v, tile * 8, 128), lambda g, t: (g, t, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((v, tile * 8, 128), lambda g, t: (g, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((v, tile * 8, 128), lambda g, t: (g, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((v, tile * 8, 128), lambda g, t: (g, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((v, 24, 128), lambda g, t: (g, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[pltpu.VMEM((4, v, 8, 128), _U32)],
        interpret=interpret,
    )(cum_vreg, symbols)
    return ehi, elo, en, flush


@functools.partial(jax.jit, static_argnames=("group_lanes",))
def symbols_to_step_major(symbols: jax.Array, *, group_lanes: int = 1024
                          ) -> jax.Array:
    """(B, L) lane-major symbols -> (NG, L*8, 128) step-major tiles."""
    B, L = symbols.shape
    if B % group_lanes:
        raise ValueError(f"B={B} not a multiple of {group_lanes}")
    NG = B // group_lanes
    s = symbols.reshape(NG, 8, 128, L).astype(_I32)
    return jnp.transpose(s, (0, 3, 1, 2)).reshape(NG, L * 8, 128)


@jax.jit
def emissions_to_lane_major(ehi, elo, en, flush):
    """Step-major kernel outputs -> the (B, L+1) lane-major arrays the
    compaction/interleave stages consume (flush appended as the final
    transition with n=8, reference src/encoder.rs:40-46)."""
    NG, rows, _ = ehi.shape
    L = rows // 8

    def lane_major(x):
        return jnp.transpose(
            x.reshape(NG, L, 8, 128), (0, 2, 3, 1)
        ).reshape(NG * 1024, L)

    fhi = flush[:, 0:8, :].reshape(NG * 1024, 1)
    flo = flush[:, 8:16, :].reshape(NG * 1024, 1)
    ehi_l = jnp.concatenate([lane_major(ehi), fhi], axis=1)
    elo_l = jnp.concatenate([lane_major(elo), flo], axis=1)
    en_l = jnp.concatenate(
        [lane_major(en), jnp.full((NG * 1024, 1), 8, _I32)], axis=1
    )
    pos = jnp.cumsum(en_l, axis=1) - en_l
    lengths = pos[:, -1] + en_l[:, -1]
    return ehi_l, elo_l, en_l, pos, lengths
