"""The interleaved stream layout — lane-parallel streams in decode order.

**Why.**  The planar profile gives each block its own byte stream; a decoder
must then fetch bytes at 1024 *independent* data-dependent cursors per step
— per-lane random access that TPU vector units cannot do (vreg gathers
reach 1024 words at most, and XLA-level gathers cost ~35 ms per op on this
stack).  The classic SIMD answer (interleaved rANS, e.g. Giesen's
interleaved streams) is to share ONE stream among all lanes, ordered by the
*decoder's* consumption schedule: then every decode step reads one
contiguous region whose base advances uniformly, and per-lane offsets
within the region are just a prefix sum over lanes — always within
vreg-gather reach of a small window.

**Layout** (profile "interleaved", GROUP_LANES = 1024 lanes per group; lane
``l`` of a group encodes the group's ``l``-th length-``L`` segment; each
lane is a standard carryless coder, reference src/range_coder.rs semantics
unchanged):

* preamble: lane ``l``'s logical bytes ``[0, 8)`` (the decoder's window
  prime, reference src/decoder.rs:21) at positions ``[8l, 8l+8)``;
* then for decode step ``t = 0..L-1``, in lane order: the ``n[t, l]``
  bytes lane ``l`` shifts into its window after decoding symbol ``t``
  (reference src/decoder.rs:50-52) — logical bytes
  ``[8 + c_l(t), 8 + c_l(t) + n[t, l])`` with ``c_l(t) = sum_{t'<t} n``.

``n[t, l]`` is both the encoder's emission count and the decoder's
consumption count at step ``t`` (lock-step invariant, SURVEY.md §3 inv 4),
so the physical stream is an exact permutation of the concatenated per-lane
scalar streams: same total size, flush bytes landing where late consumers
need them.

The permutation is computed with the same run-length-expansion machinery as
the planar compaction (``jnp.repeat`` + prefix sums — no gathers), and
applied with one batched scatter.  ``deinterleave_to_planar`` (NumPy)
inverts it; ``interleaved_stream_numpy`` is an independent from-spec
reference used by tests.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

_U32 = jnp.uint32
_U8 = jnp.uint8

#: lanes per group: one full (8, 128) vreg of coder states
GROUP_LANES = 1024


@functools.partial(jax.jit, static_argnames="capacity")
def interleave_emissions(
    planar: jax.Array,
    en: jax.Array,
    pos: jax.Array,
    *,
    capacity: int,
) -> Tuple[jax.Array, jax.Array]:
    """Build interleaved group streams from planar per-lane streams.

    Arguments:
      planar: (NG, G, C) uint8 — per-lane compacted streams (zeros past
        each lane's length), grouped.
      en:     (NG, G, L+1) int32 — per-transition byte counts, flush last.
      pos:    (NG, G, L+1) int32 — exclusive prefix sums of ``en`` per lane.
      capacity: SC, the per-group output capacity (static); must be >=
        ``8*G + sum of consumed bytes`` (= the group's total stream length).

    Returns (streams (NG, SC) uint8, group_lengths (NG,) int32).
    """
    NG, G, C = planar.shape
    L = en.shape[2] - 1

    n_cons = en[:, :, :L]  # consumption counts (flush column excluded)
    c_l = pos[:, :, :L]  # c_l(t)
    # within-region lane offsets: exclusive cumsum over the lane axis per t
    w_l = jnp.cumsum(n_cons, axis=1) - n_cons  # (NG, G, L)
    # region sizes and bases
    s_t = jnp.sum(n_cons, axis=1)  # (NG, L)
    r_base = 8 * G + jnp.cumsum(s_t, axis=1) - s_t  # (NG, L)
    group_lengths = 8 * G + jnp.sum(n_cons, axis=(1, 2))

    rep = C - 8  # per-lane expanded length (consumed bytes <= C - 8)

    def lane_positions_fast(nn, cc, ww, rb):
        # nn/cc/ww: (L,) per-lane; rb: (L,) group region bases.  Each term
        # is constant over a lane's per-step byte run -> run-length expand.
        r_of = jnp.repeat(rb, nn, total_repeat_length=rep)
        cstart = jnp.repeat(cc, nn, total_repeat_length=rep)
        w_of = jnp.repeat(ww, nn, total_repeat_length=rep)
        jj = jnp.arange(rep, dtype=jnp.int32)
        return r_of + w_of + (jj - cstart)

    p = jax.vmap(jax.vmap(lane_positions_fast))(
        n_cons, c_l, w_l, jnp.broadcast_to(r_base[:, None, :], (NG, G, L))
    )  # (NG, G, rep) positions for logical bytes j = 8 + jj

    valid = (jnp.arange(rep, dtype=jnp.int32)[None, None, :]
             < pos[:, :, L:L + 1])  # jj < consumed bytes of the lane
    cols = jnp.where(valid, p, capacity).reshape(NG, G * rep)
    vals = planar[:, :, 8:].reshape(NG, G * rep)

    out = jnp.zeros((NG, capacity), _U8)
    # preamble: first 8 logical bytes of each lane, lane-major — contiguous
    out = out.at[:, : 8 * G].set(planar[:, :, :8].reshape(NG, 8 * G))
    rows = jnp.broadcast_to(jnp.arange(NG)[:, None], cols.shape)
    out = out.at[rows, cols].set(vals, mode="drop")
    return out, group_lengths


@functools.partial(jax.jit, static_argnames="capacity")
def interleave_emissions_words(
    planar: jax.Array,
    en: jax.Array,
    pos: jax.Array,
    *,
    capacity: int,
) -> Tuple[jax.Array, jax.Array]:
    """:func:`interleave_emissions` + big-endian word packing in ONE jit:
    returns ``(words (NG, SC//512, 128) uint32, group_lengths (NG,))``.

    The words layout is what the Pallas decode kernel consumes
    (kernels/decode_pallas.decode_words).  Flat (NG, SC) uint8 arrays at
    jit boundaries trigger a ~22 ms/call device relayout on v5e when
    consumed downstream — keeping the byte image internal to this program
    and emitting natively-tiled u32 avoids it.
    """
    if capacity % 512:
        raise ValueError("stream capacity must be a multiple of 512")
    out, group_lengths = interleave_emissions.__wrapped__(
        planar, en, pos, capacity=capacity
    )
    NG = out.shape[0]
    rows = capacity // 512
    w = out.reshape(NG, rows * 128, 4).astype(_U32)
    words = ((w[..., 0] << 24) | (w[..., 1] << 16) | (w[..., 2] << 8) | w[..., 3])
    return words.reshape(NG, rows, 128), group_lengths


def deinterleave_to_planar(
    stream: np.ndarray, en: np.ndarray, capacity_planar: int
) -> np.ndarray:
    """NumPy inverse: interleaved group stream -> per-lane planar streams.

    ``stream`` (SC,) uint8, ``en`` (G, L+1) int32.  Returns (G, C) uint8.
    Host-side utility (testing, recovery tooling).
    """
    G, L1 = en.shape
    L = L1 - 1
    n_cons = en[:, :L]
    out = np.zeros((G, capacity_planar), np.uint8)
    out[:, :8] = stream[: 8 * G].reshape(G, 8)
    base = 8 * G
    cursors = np.full(G, 8, np.int64)
    for t in range(L):
        for l in range(G):
            n = int(n_cons[l, t])
            if n:
                out[l, cursors[l] : cursors[l] + n] = stream[base : base + n]
                cursors[l] += n
                base += n
    return out


def interleaved_stream_numpy(lane_streams, en) -> bytes:
    """From-spec reference: build the interleaved stream from per-lane
    scalar byte streams (lists of bytes) and the emission-count matrix
    ``en (G, L+1)``.  Independent of the JAX implementation; used as the
    test oracle."""
    G, L1 = np.asarray(en).shape
    L = L1 - 1
    en = np.asarray(en)
    out = bytearray()
    for l in range(G):
        out += bytes(lane_streams[l][:8])
    cursors = [8] * G
    for t in range(L):
        for l in range(G):
            n = int(en[l, t])
            out += bytes(lane_streams[l][cursors[l] : cursors[l] + n])
            cursors[l] += n
    return bytes(out)
