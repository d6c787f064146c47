"""Randomized round-trip property tests for the rans16 profile.

The round-3 shifted-support bug (decode repair landing outside the
search window) survived every hand-written case until a fuzz-shaped
corpus hit it — this file keeps a small randomized sweep in the suite:
random alphabet sizes (both search paths), random supports (leading /
interior holes), random skews, and awkward lengths (partial groups,
partial tiles).
"""

import numpy as np
import pytest

from range_coder_rust_tpu import api


@pytest.mark.parametrize("seed", range(6))
def test_rans16_random_roundtrip(seed):
    rng = np.random.default_rng(1000 + seed)
    a = int(rng.integers(2, 300))
    support_lo = int(rng.integers(0, a - 1))
    support_hi = int(rng.integers(support_lo + 1, a))
    width = support_hi - support_lo + 1
    alpha = float(rng.uniform(0.0, 2.0))
    p = 1.0 / np.arange(1, width + 1) ** alpha
    p = rng.permutation(p)
    p /= p.sum()
    n = int(rng.integers(1, 1024 * 200))
    data = (support_lo + rng.choice(width, size=n, p=p)).astype(np.int32)
    L = int(rng.choice([64, 128, 192, 448]))
    blob = api.encode(data, alphabet=a,
                      config=api.CodecConfig(profile="rans16", block_len=L))
    np.testing.assert_array_equal(api.decode(blob), data)


@pytest.mark.parametrize("seed", range(3))
def test_rans16_random_per_group_roundtrip(seed):
    rng = np.random.default_rng(2000 + seed)
    L = 64
    ng = int(rng.integers(2, 4))
    parts = []
    for g in range(ng):
        lo = int(rng.integers(0, 200))
        w = int(rng.integers(2, 56))
        parts.append(lo + rng.integers(0, w, 1024 * L))
    data = np.concatenate(parts).astype(np.int32)
    cfg = api.CodecConfig(profile="rans16", block_len=L,
                          per_group_tables=True)
    blob = api.encode(data, alphabet=256, config=cfg)
    np.testing.assert_array_equal(api.decode(blob), data)
