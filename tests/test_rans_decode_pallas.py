"""The rans16 tiled Pallas decode kernel must invert the reference
encoder, consuming spec-built streams through the per-tile window layout.
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


def _spec_payload(group_rows, t, L):
    """Build a v2 group payload from the NumPy spec encoder."""
    G = rans.GROUP_LANES
    states, regions, counts = rans.encode_lanes(group_rows, t.c, t.cum)
    tile = min(rans_codec.TILE_STEPS, L)
    sizes = counts.reshape(L // tile, tile).sum(axis=1).astype("<u4")
    region = np.concatenate(
        [r for r in regions if r.size] or [np.zeros(0, np.uint16)]
    ).astype("<u2")
    pre6 = states.astype("<u8").view(np.uint8).reshape(G, 8)[:, :6]
    return (
        np.uint32(len(sizes)).tobytes()
        + sizes.tobytes()
        + pre6.tobytes()
        + region.tobytes()
    )


@pytest.mark.parametrize(
    "NG,L,a,alpha",
    [(1, 64, 256, 1.2), (2, 128, 77, 0.4), (1, 64, 300, 0.7),
     (1, 64, 129, 0.9), (1, 64, 255, 1.0)],
)
def test_rans_decode_kernel(NG, L, a, alpha):
    G = rans.GROUP_LANES
    data = _zipf(NG * G * L, a=a, seed=NG + L, alpha=alpha).reshape(NG, G, L)
    t = table_from_data_pow2(data, a, 16)
    payloads = [_spec_payload(data[g], t, L) for g in range(NG)]
    out = rans_codec.decode_groups(payloads, t.c, L)
    np.testing.assert_array_equal(out, data.reshape(NG * G, L))


def test_rans_decode_kernel_multi_tile():
    """L spanning several grid tiles exercises the state carry and the
    per-tile start offsets (tile regions land at arbitrary halfword
    phases within their padded windows)."""
    G = rans.GROUP_LANES
    L = 3 * rans_codec.TILE_STEPS
    data = _zipf(G * L, a=200, seed=9).reshape(1, G, L)
    t = table_from_data_pow2(data, 200, 16)
    payloads = [_spec_payload(data[0], t, L)]
    out = rans_codec.decode_groups(payloads, t.c, L)
    np.testing.assert_array_equal(out, data.reshape(G, L))


def test_rans_decode_rejects_bad_payload():
    from range_coder_rust_tpu.errors import InvalidHeader

    with pytest.raises(InvalidHeader):
        rans_codec._parse_payload(b"\x05", 64)
    with pytest.raises(InvalidHeader):
        # wrong tile count for the geometry
        rans_codec._parse_payload(
            np.uint32(9).tobytes() + b"\x00" * 64, 64)
