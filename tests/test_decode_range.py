"""Block-level random access: api.decode_range decodes only the covering
independent units (SURVEY.md §5 — per-block independence IS the
checkpoint/resume mechanism)."""

import numpy as np
import pytest

from range_coder_rust_tpu import api
from range_coder_rust_tpu.errors import ChecksumMismatch, ConfigError


def _zipf(n, a=256, seed=3):
    rng = np.random.default_rng(seed)
    ranks = np.arange(1, a + 1)
    p = 1.0 / ranks**1.2
    p /= p.sum()
    return rng.choice(a, size=n, p=p).astype(np.int32)


@pytest.mark.parametrize("cfg", [
    api.CodecConfig(block_len=128),
    api.CodecConfig(block_len=128, raw_total=True),
    api.CodecConfig(profile="rans16", block_len=64),
])
def test_decode_range_matches_slices(cfg):
    data = _zipf(300_000, seed=7)
    blob = api.encode(data, alphabet=256, config=cfg)
    for start, count in [(0, 100), (131072, 4096), (299_000, 1000),
                         (65536 - 7, 20), (123, 0)]:
        got = api.decode_range(blob, start, count)
        np.testing.assert_array_equal(got, data[start : start + count])


def test_decode_range_adaptive():
    from range_coder_rust_tpu.adaptive import encode_adaptive

    data = _zipf(40_000, seed=9)
    blob = encode_adaptive(data, alphabet=256, k=12, block_len=256)
    got = api.decode_range(blob, 10_000, 3000)
    np.testing.assert_array_equal(got, data[10_000:13_000])


def test_decode_range_ignores_corruption_elsewhere():
    """Corrupting block j must not affect decode_range of block i != j —
    and must still be detected when the range covers block j."""
    data = _zipf(200_000, seed=11)
    cfg = api.CodecConfig(block_len=512)
    blob = bytearray(api.encode(data, alphabet=256, config=cfg))
    blob[-3] ^= 0x40  # corrupt the LAST block's payload
    blob = bytes(blob)
    with pytest.raises(ChecksumMismatch):
        api.decode(blob)
    got = api.decode_range(blob, 0, 1000)  # far from the corruption
    np.testing.assert_array_equal(got, data[:1000])
    with pytest.raises(ChecksumMismatch):
        api.decode_range(blob, 199_600, 400)  # covers the corrupted block


def test_decode_range_bounds():
    data = _zipf(10_000, seed=13)
    blob = api.encode(data, alphabet=256)
    with pytest.raises(ConfigError):
        api.decode_range(blob, 9_000, 2_000)
    with pytest.raises(ConfigError):
        api.decode_range(blob, -1, 10)


def test_decode_range_zero_count_at_end():
    """count == 0 must return an empty array even at start == n_symbols
    (previously indexed one unit past the end — advisor r3)."""
    span = 128 * 3
    data = _zipf(span, seed=2)
    blob = api.encode(data, alphabet=256,
                      config=api.CodecConfig(block_len=128))
    got = api.decode_range(blob, span, 0)
    assert got.size == 0
    got = api.decode_range(blob, 0, 0)
    assert got.size == 0
