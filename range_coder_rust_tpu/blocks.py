"""Block-parallel batch encode/decode under ``jit``.

The reference processes one stream sequentially — every emitted byte depends
on all prior symbols through ``(lower, range)`` (reference src/encoder.rs:24-37,
SURVEY.md §2).  The TPU-native answer is block parallelism: the input is
chunked into ``B`` independent blocks, each with its own coder state living
in one vector lane; a single ``lax.scan`` over symbol positions advances all
``B`` coders per step with the closed-form transition (ops/transition.py).
No data-dependent control flow, no dynamic shapes — XLA fuses each scan step
into a handful of VPU ops over ``(B,)`` lanes.

Emission handling: inside the scan each step produces only ``(low64, n)``
(the stream bytes are the top ``n`` bytes of ``low64`` — see
ops/transition.py); the variable-length byte streams are materialized after
the scan by an exclusive-prefix-sum + scatter compaction, entirely on
device.  Per-block payloads are byte-identical to the scalar golden encoder
run with the same table (tests/test_blocks.py), which pins the cross-lane
layout to the reference semantics (src/range_coder.rs:53-92).

The decoder mirrors it: per step, a vectorized ``searchsorted`` (or a
precomputed rfreq->symbol LUT) finds each lane's symbol
(reference examples/sample_impl.rs:27-45), the same closed-form transition
advances the replica state, and each lane's 64-bit window refills from its
own byte cursor (reference src/decoder.rs:38-54) via a 16-byte gather.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from .ops import u64
from .ops.transition import (
    EMIT_MAX,
    decode_find_rfreq,
    flush_state,
    init_state,
    param_update_pow2,
)
from .models.table import find_index

_U32 = jnp.uint32
_U8 = jnp.uint8

#: Flush length: the final 64-bit lower bound, 8 bytes
#: (reference src/encoder.rs:40-46).
FLUSH_BYTES = 8


def default_capacity(block_len: int, k: int) -> int:
    """Worst-case per-block payload bytes.

    A symbol with ``c = 1`` consumes ``k`` bits of range; adversarial input
    can also trigger range-reduction waste, so the bound is intentionally
    loose: ``ceil(k/8)+1`` bytes per symbol plus the 8-byte flush.  The
    encoder verifies at runtime that no block overflowed (host check in
    api.py); typical payloads are far below entropy*L/8 of this.
    """
    return block_len * ((k + 7) // 8 + 1) + FLUSH_BYTES


def _bytes_be_to_u64(b: jax.Array) -> u64.U64:
    """Fold big-endian bytes ``(..., 8) uint8`` into a U64."""
    w = b.astype(_U32)
    hi = (w[..., 0] << 24) | (w[..., 1] << 16) | (w[..., 2] << 8) | w[..., 3]
    lo = (w[..., 4] << 24) | (w[..., 5] << 16) | (w[..., 6] << 8) | w[..., 7]
    return u64.U64(hi, lo)


@functools.partial(jax.jit, static_argnames=("k", "capacity"))
def encode_blocks(
    symbols: jax.Array,
    c: jax.Array,
    cum: jax.Array,
    *,
    k: int,
    capacity: int,
) -> Tuple[jax.Array, jax.Array]:
    """Encode ``(B, L)`` symbol indices into per-block byte streams.

    Arguments:
      symbols: ``(B, L)`` integer symbol indices in ``[0, A)``.
      c / cum: shared pow2-normalized table (models/table.py), uint32
        ``(A,)`` / ``(A+1,)`` with ``cum[A] == 2**k``.
      k: log2 of the total frequency (static).
      capacity: per-block output capacity ``C`` (static); overflowing blocks
        are detected via the returned lengths (``lengths[b] > C`` means the
        block must be re-encoded with a larger capacity — bytes past C are
        dropped, never written OOB).

    Returns ``(code, lengths)``: ``code (B, C) uint8`` (zero-padded past each
    block's length) and ``lengths (B,) int32`` including the 8 flush bytes.
    """
    B, L = symbols.shape
    cs = c[symbols]  # (B, L) gather of per-symbol frequencies
    cums = cum[symbols]

    def step(st, x):
        cc, cu = x
        st, emit, n = param_update_pow2(st, cc, cu, k)
        return st, (emit.hi, emit.lo, n)

    st, (ehi, elo, en) = jax.lax.scan(
        step, init_state((B,)), (cs.T, cums.T)
    )  # outputs (L, B)

    femit, fn = flush_state(st)
    ehi = jnp.concatenate([ehi.T, femit.hi[:, None]], axis=1)  # (B, L+1)
    elo = jnp.concatenate([elo.T, femit.lo[:, None]], axis=1)
    en = jnp.concatenate([en.T, fn[:, None]], axis=1)

    pos = jnp.cumsum(en, axis=1) - en  # exclusive prefix sum (B, L+1)
    lengths = pos[:, -1] + en[:, -1]

    emit = u64.U64(ehi, elo)
    out = jnp.zeros((B, capacity), _U8)
    rows = jnp.broadcast_to(jnp.arange(B)[:, None], (B, L + 1))
    for j in range(EMIT_MAX):
        # j-th emitted byte of each transition = byte j of emit (0 past byte 8)
        val = (
            (u64.shri(emit, 56 - 8 * j).lo & _U32(0xFF)).astype(_U8)
            if j < 8
            else jnp.zeros((B, L + 1), _U8)
        )
        col = jnp.where(j < en, pos + j, capacity)  # invalid -> OOB, dropped
        out = out.at[rows, col].set(val, mode="drop")
    return out, lengths


@functools.partial(jax.jit, static_argnames=("k", "block_len", "use_lut"))
def decode_blocks(
    code: jax.Array,
    c: jax.Array,
    cum: jax.Array,
    *,
    k: int,
    block_len: int,
    use_lut: bool = True,
) -> jax.Array:
    """Decode ``(B, C)`` per-block byte streams back to ``(B, L)`` symbols.

    The symbol count per block is ``block_len`` — like the reference, the
    format carries no implicit EOF (examples/sample_impl.rs:113-120 note);
    the container (format.py) supplies it.

    ``use_lut`` selects the rfreq -> symbol lookup table (one gather per
    symbol, 2^k entries, shared-table fast path) over the binary-search
    ``searchsorted`` (per-block-table general path).
    """
    B, C = code.shape
    code_pad = jnp.pad(code, ((0, 0), (0, 16)))
    lut = None
    if use_lut:
        r = jnp.arange(1 << k, dtype=_U32)
        lut = jnp.searchsorted(cum[1:], r, side="right").astype(jnp.int32)

    def step(carry, _):
        st, window, cursor = carry
        rfreq = decode_find_rfreq(st, window, k)
        if lut is not None:
            idx = lut[rfreq]
        else:
            idx = find_index(cum, rfreq)
        cc = c[idx]
        cu = cum[idx]
        st, _, n = param_update_pow2(st, cc, cu, k)

        # window refill: shift in exactly the n bytes the encoder emitted
        # (reference src/decoder.rs:50-52)
        w16 = jax.vmap(
            lambda row, cur: jax.lax.dynamic_slice(row, (cur,), (16,))
        )(code_pad, cursor)
        whi = _bytes_be_to_u64(w16[:, 0:8])
        wlo = _bytes_be_to_u64(w16[:, 8:16])
        v_le8 = u64.shr(whi, 64 - 8 * n)
        v_gt8 = u64.bit_or(u64.shl(whi, 8 * n - 64), u64.shr(wlo, 128 - 8 * n))
        v = u64.select(n <= 8, v_le8, v_gt8)
        window = u64.bit_or(u64.shl(window, 8 * n), v)
        cursor = cursor + n
        return (st, window, cursor), idx

    window0 = _bytes_be_to_u64(code_pad[:, 0:8])  # prime (src/decoder.rs:21)
    cursor0 = jnp.full((B,), 8, jnp.int32)
    (_, _, _), syms = jax.lax.scan(
        step, (init_state((B,)), window0, cursor0), None, length=block_len
    )
    return syms.T  # (B, L)
