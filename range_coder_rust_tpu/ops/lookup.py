"""Gather-free table lookups — XLA-on-TPU's gather is pathologically slow
(measured ~35 ms fixed cost per gather op on this stack, independent of
element count), so every per-symbol table access in the device path is
reformulated as fused vector arithmetic:

* :func:`packed_lookup` — the encoder's ``(c_freq[s], cum_freq[s])`` pair
  (reference src/pmodel.rs:6-8) as ONE unrolled select-accumulate chain over
  the alphabet, both values packed into a single uint32 (cum in the high 16
  bits, c-1 in the low 16 — valid because pow2 tables have
  ``c-1, cum <= 2^16 - 1``).  Unrolled (no (N, A) materialization): meant
  for the one-shot whole-corpus lookup outside the encode scan.
* :func:`sweep_find` — the decoder's symbol search + table access
  (reference examples/sample_impl.rs:27-45) as a masked-reduction sweep:
  ``idx = #{a : cum[a+1] <= r}``, ``cum[idx] = sum c_a [cum[a+1] <= r]``,
  ``cum[idx+1] = sum c_a [cum[a] <= r]`` — three reductions sharing one
  comparison, no search, no gather.  Vectorized over a small (B, A)
  per-step tile: meant for use inside the decode scan.
* :func:`window_extract` — the decoder's per-lane byte-window fetch
  (reference src/decoder.rs:31-35) as a masked sum over the code row: each
  lane's 16-byte window at a dynamic byte cursor is assembled from five u32
  word accumulators + a funnel shift.  Costs a re-read of the code rows per
  step — bandwidth XLA can stream — instead of an unusable per-lane gather.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from . import u64

_U32 = jnp.uint32


def pack_table(c: jax.Array, cum: jax.Array) -> jax.Array:
    """Pack per-symbol ``(cum << 16) | (c - 1)`` (uint32, (A,))."""
    return ((cum[:-1] & _U32(0xFFFF)) << 16) | ((c - 1) & _U32(0xFFFF))


def packed_lookup(packed: jax.Array, symbols: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """(c_freq[s], cum_freq[s]) for every symbol.

    ``packed`` is :func:`pack_table`'s (A,) array.  For A <= 256 the
    lookup is an unrolled select-accumulate chain (gather-free; XLA's
    gather carries a ~35 ms fixed cost here).  Wider alphabets switch to
    ONE batched gather over the whole symbol block — amortized once per
    encode call, it keeps the traced program size alphabet-independent
    (the unrolled chain emitted ~2A ops: a 4096-symbol planar encode
    traced ~8K ops per lookup — VERDICT r3 item 9)."""
    a_count = packed.shape[0]
    s = symbols.astype(jnp.int32)
    if a_count > 256:
        z = jnp.take(packed, s, axis=0)
    else:
        z = jnp.zeros(symbols.shape, _U32)
        for a in range(a_count):
            z = z | jnp.where(s == a, packed[a], _U32(0))
    c = (z & _U32(0xFFFF)) + 1
    cum = z >> 16
    return c, cum


def sweep_find(
    c: jax.Array, cum: jax.Array, rfreq: jax.Array
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Decode-side symbol search: returns ``(index, c[index], cum[index])``.

    Exact reformulation of the reference's largest-``i``-with-``cum[i]<=r``
    binary search (examples/sample_impl.rs:33-44) as masked reductions:
    ``[a < idx] <=> cum[a+1] <= r`` and ``[a <= idx] <=> cum[a] <= r``
    (both by monotonicity of cum), so one comparison matrix feeds all three
    accumulators.  ``rfreq`` is (...,); the (..., A) mask tile stays
    per-step-sized.
    """
    m_next = cum[None, 1:] <= rfreq[..., None]  # [a < idx]
    m_cur = cum[None, :-1] <= rfreq[..., None]  # [a <= idx]
    idx = jnp.sum(m_next, axis=-1).astype(jnp.int32)
    cum_s = jnp.sum(jnp.where(m_next, c[None, :], _U32(0)), axis=-1, dtype=_U32)
    cum_next = jnp.sum(jnp.where(m_cur, c[None, :], _U32(0)), axis=-1, dtype=_U32)
    return idx, cum_next - cum_s, cum_s


def window_extract(code32: jax.Array, cursor: jax.Array) -> Tuple[u64.U64, u64.U64]:
    """16 bytes at per-lane byte ``cursor`` from per-lane code rows, as two
    big-endian U64s — gather-free.

    ``code32``: (B, C4) uint32 rows holding each lane's stream as
    big-endian words; ``cursor``: (B,) int32 byte offsets (cursor+16 may
    exceed the row — missing words read as 0).  A masked reduction over the
    (static) word axis builds words ``w..w+4``; a funnel shift by
    ``8 * (cursor & 3)`` aligns to the byte cursor.
    """
    c4 = code32.shape[1]
    w = (cursor >> 2).astype(jnp.int32)
    d = jnp.arange(c4, dtype=jnp.int32)[None, :] - w[:, None]  # (B, C4)

    def wsel(t: int) -> jax.Array:
        return jnp.sum(
            jnp.where(d == t, code32, _U32(0)), axis=1, dtype=_U32
        )

    a0, a1, a2, a3, a4 = (wsel(t) for t in range(5))
    sh = (8 * (cursor & 3)).astype(_U32)  # 0, 8, 16, 24
    inv = _U32(32) - sh

    def funnel(a, b):
        # (a << sh) | (b >> (32 - sh)), sh == 0 handled explicitly
        lo = jnp.where(sh > 0, b >> jnp.where(inv < 32, inv, _U32(0)), _U32(0))
        return jnp.where(sh > 0, a << sh, a) | lo

    return (
        u64.U64(funnel(a0, a1), funnel(a1, a2)),
        u64.U64(funnel(a2, a3), funnel(a3, a4)),
    )
