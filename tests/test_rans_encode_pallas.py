"""The rans16 tiled Pallas encode kernel must be bit-exact vs the NumPy
spec (rans.py): per-tile region sizes, region halfwords, and final states.
"""

import numpy as np
import pytest

from range_coder_rust_tpu import rans, rans_codec
from range_coder_rust_tpu.models.table import table_from_data_pow2


def _zipf(n, a=256, seed=3, alpha=1.2):
    rng = np.random.default_rng(seed)
    ranks = np.arange(1, a + 1)
    p = 1.0 / ranks**alpha
    p /= p.sum()
    return rng.choice(a, size=n, p=p).astype(np.int32)


def _oracle_payload_parts(group_rows, t, L):
    """Per-tile sizes / region halfwords / states from the NumPy spec."""
    states, regions, counts = rans.encode_lanes(group_rows, t.c, t.cum)
    tile = min(rans_codec.TILE_STEPS, L)
    sizes = counts.reshape(L // tile, tile).sum(axis=1).astype(np.int64)
    region = np.concatenate(
        [r for r in regions if r.size] or [np.zeros(0, np.uint16)]
    ).astype(np.uint16)
    return sizes, region, states


@pytest.mark.parametrize(
    "NG,L,a,alpha",
    [(1, 64, 256, 1.2), (2, 128, 77, 0.4), (1, 64, 400, 0.8)],
)
def test_encode_payloads_match_spec(NG, L, a, alpha):
    """encode_groups (kernel + device compaction + host assembly) must
    reproduce the spec's sizes, region stream, and preamble states —
    including the generic search path (a > 256)."""
    G = rans.GROUP_LANES
    data = _zipf(NG * G * L, a=a, seed=NG + L, alpha=alpha).reshape(NG, G, L)
    t = table_from_data_pow2(data, a, 16)
    payloads = rans_codec.encode_groups(data.reshape(NG * G, L), t, L)
    assert len(payloads) == NG
    for g in range(NG):
        sizes, region, states = _oracle_payload_parts(data[g], t, L)
        got_sizes, pre6, got_region = rans_codec._parse_payload(
            payloads[g], L)
        np.testing.assert_array_equal(got_sizes, sizes)
        np.testing.assert_array_equal(
            np.frombuffer(got_region, "<u2"), region)
        x8 = np.zeros((G, 8), np.uint8)
        x8[:, :6] = np.frombuffer(pre6, np.uint8).reshape(G, 6)
        np.testing.assert_array_equal(x8.reshape(-1).view("<u8"), states)


def test_encode_multi_tile_long_lane():
    """Lanes spanning many tiles exercise the cross-tile state carry (the
    round-2 design needed host-side segment chaining for this)."""
    G = rans.GROUP_LANES
    L = 4 * rans_codec.TILE_STEPS
    data = _zipf(G * L, a=200, seed=7).reshape(1, G, L)
    t = table_from_data_pow2(data, 200, 16)
    payloads = rans_codec.encode_groups(data.reshape(G, L), t, L)
    sizes, region, states = _oracle_payload_parts(data[0], t, L)
    got_sizes, _, got_region = rans_codec._parse_payload(payloads[0], L)
    np.testing.assert_array_equal(got_sizes, sizes)
    np.testing.assert_array_equal(np.frombuffer(got_region, "<u2"), region)
    rows = rans_codec.decode_groups(payloads, t.c, L)
    np.testing.assert_array_equal(rows, data.reshape(G, L))


def test_encode_worst_case_capacity():
    """Uniform bytes at k=16 emit close to the per-tile bound; the
    worst-case-sized tile blocks must absorb it with no overflow path."""
    G = rans.GROUP_LANES
    L = 64
    rng = np.random.default_rng(0)
    data = rng.integers(0, 256, size=(G, L)).astype(np.int32)
    t = table_from_data_pow2(data, 256, 16)
    payloads = rans_codec.encode_groups(data, t, L)
    rows = rans_codec.decode_groups(payloads, t.c, L)
    np.testing.assert_array_equal(rows, data)
