"""End-to-end api.encode/decode round trips for the rans16 profile."""

import numpy as np
import pytest

from range_coder_rust_tpu import api, format as fmt
from range_coder_rust_tpu.errors import ChecksumMismatch, ConfigError


def _zipf(n, a=256, seed=3):
    rng = np.random.default_rng(seed)
    ranks = np.arange(1, a + 1)
    p = 1.0 / ranks**1.2
    p /= p.sum()
    return rng.choice(a, size=n, p=p).astype(np.int32)


CFG = api.CodecConfig(profile="rans16", block_len=64)


def test_rans16_roundtrip_exact_multiple():
    data = _zipf(1024 * 64)  # exactly one group
    blob = api.encode(data, config=CFG)
    cont = fmt.unpack(blob)
    assert cont.profile == "rans16" and cont.group_lanes == 1024
    out = api.decode(blob)
    np.testing.assert_array_equal(out, data)


def test_rans16_roundtrip_partial_group():
    data = _zipf(1024 * 64 + 777, seed=5)  # 2 groups, second mostly pad
    blob = api.encode(data, config=CFG)
    out = api.decode(blob)
    np.testing.assert_array_equal(out, data)


def test_rans16_checksum_detects_corruption():
    data = _zipf(1024 * 64, seed=6)
    blob = bytearray(api.encode(data, config=CFG))
    blob[-3] ^= 0x40  # flip a bit in the last payload
    with pytest.raises(ChecksumMismatch):
        api.decode(bytes(blob))


def test_rans16_requires_k16():
    with pytest.raises(ConfigError):
        api.CodecConfig(profile="rans16", k=12)
    with pytest.raises(ConfigError):
        api.CodecConfig(profile="nope")
