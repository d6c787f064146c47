"""Tests for the array-native table model (models/table.py): histogram,
cumulative build, exact pow2 normalization, searchsorted find_index parity
with the reference's binary search, LUT, ideal bits."""

import numpy as np
import pytest

import jax.numpy as jnp

from range_coder_rust_tpu.errors import TableError
from range_coder_rust_tpu.models.freq_table import FreqTable
from range_coder_rust_tpu.models.table import (
    build_table_pow2,
    counts_from_data,
    cumulative,
    decode_lut,
    find_index,
    ideal_bits,
    normalize_pow2,
    table_from_data_pow2,
)

RNG = np.random.default_rng(11)


def test_counts_matches_numpy():
    data = RNG.integers(0, 50, size=10_000)
    got = np.asarray(counts_from_data(jnp.asarray(data), 50))
    want = np.bincount(data, minlength=50)
    assert np.array_equal(got, want)


def test_cumulative_matches_calc_cum():
    counts = RNG.integers(0, 100, size=30).astype(np.uint32)
    counts[5] = 0
    got = np.asarray(cumulative(jnp.asarray(counts)))
    ft = FreqTable.from_counts(np.maximum(counts, 0) + (counts.sum() == 0))
    want = np.concatenate([[0], np.cumsum(counts)])
    assert np.array_equal(got, want)
    del ft


#: fixed padded alphabet so normalize_pow2 compiles once per k
_PAD_A = 384


def _norm_padded(counts, k):
    padded = np.zeros(_PAD_A, np.uint32)
    padded[: len(counts)] = counts
    return np.asarray(normalize_pow2(jnp.asarray(padded), k))[: len(counts)]


@pytest.mark.parametrize("k", [4, 8, 12, 16])
def test_normalize_pow2_exact(k):
    for trial in range(20):
        a = int(RNG.integers(2, min(1 << k, 300) + 1))
        counts = RNG.integers(0, 10_000, size=a).astype(np.uint32)
        if counts.sum() == 0:
            counts[0] = 1
        nnz = int((counts > 0).sum())
        if nnz > 1 << k:
            continue
        c = _norm_padded(counts, k)
        assert int(c.sum()) == 1 << k, f"trial {trial}: sum {c.sum()}"
        assert np.all(c[counts > 0] >= 1)
        assert np.all(c[counts == 0] == 0)


def test_normalize_pow2_proportionality():
    # a dominant symbol keeps a dominant share
    counts = np.array([1000, 10, 10, 10], np.uint32)
    c = _norm_padded(counts, 10)
    assert int(c.sum()) == 1024
    assert c[0] > 900


def test_normalize_pow2_degenerate():
    # single symbol takes the whole budget
    c = _norm_padded(np.array([7], np.uint32), 8)
    assert c.tolist() == [256]
    # all-equal
    c = _norm_padded(np.full(16, 3, np.uint32), 8)
    assert c.tolist() == [16] * 16
    # many min-1 clamps: one huge + 200 singletons, k=8 (256 slots for 201)
    counts = np.concatenate([[100_000], np.ones(200)]).astype(np.uint32)
    c = _norm_padded(counts, 8)
    assert int(c.sum()) == 256
    assert np.all(c >= 1)


def test_build_table_validation():
    with pytest.raises(TableError):
        build_table_pow2(np.zeros(5, np.uint32), 8)
    with pytest.raises(TableError):
        build_table_pow2(np.ones(300, np.uint32), 8)  # 300 > 2^8
    t = build_table_pow2(np.array([3, 1, 4], np.uint64), 8)
    assert t.k == 8 and int(t.c.sum()) == 256 and t.cum[-1] == 256


def test_build_table_huge_total_prescales():
    counts = np.array([3 << 31, 1 << 31, 5], np.uint64)
    t = build_table_pow2(counts, 12)
    assert int(t.c.sum()) == 1 << 12 and t.c[2] >= 1
    assert t.c[0] > t.c[1] > t.c[2]


def test_find_index_matches_reference_binary_search():
    """searchsorted must agree with FreqTable.find_index's loop for every
    rfreq in range (reference examples/sample_impl.rs:33-44)."""
    counts = np.array([5, 0, 3, 9, 1, 0, 2], np.uint32)
    counts_nz = counts + (counts == 0)  # reference search assumes cum sorted anyway
    ft = FreqTable.from_counts(counts_nz)
    cum = np.asarray(cumulative(jnp.asarray(counts_nz)))
    total = int(counts_nz.sum())

    # replicate the reference search directly (same loop as FreqTable.find_index)
    def ref_search(rfreq):
        left, right = 0, len(counts_nz) - 1
        while left < right:
            mid = (left + right) // 2
            if ft.cum_freq(mid + 1) <= rfreq:
                left = mid + 1
            else:
                right = mid
        return left

    rfreqs = np.arange(total, dtype=np.uint32)
    got = np.asarray(find_index(jnp.asarray(cum), jnp.asarray(rfreqs)))
    want = np.array([ref_search(int(r)) for r in rfreqs])
    assert np.array_equal(got, want)


def test_decode_lut_matches_find_index():
    t = table_from_data_pow2(RNG.integers(0, 40, size=5000), 40, 10)
    cum = jnp.asarray(t.cum)
    lut = np.asarray(decode_lut(cum, 10))
    rfreqs = jnp.arange(1 << 10, dtype=jnp.uint32)
    want = np.asarray(find_index(cum, rfreqs))
    assert np.array_equal(lut, want)
    # lut[r] is the symbol whose [cum, cum+c) interval contains r
    for r in [0, 1, 511, 1023]:
        s = lut[r]
        assert t.cum[s] <= r < t.cum[s + 1]


def test_ideal_bits():
    c = jnp.asarray(np.array([1, 2, 0, 512], np.uint32))
    bits = np.asarray(ideal_bits(c, 1024))
    assert bits[0] == pytest.approx(10.0)
    assert bits[1] == pytest.approx(9.0)
    assert np.isinf(bits[2])
    assert bits[3] == pytest.approx(1.0)


def test_ideal_bits_matches_scalar_pmodel():
    counts = np.array([3, 1, 4, 1, 5], np.uint32)
    ft = FreqTable.from_counts(counts)
    bits = np.asarray(ideal_bits(jnp.asarray(counts), int(counts.sum())))
    for i in range(5):
        assert bits[i] == pytest.approx(ft.ideal_code_length(i), rel=1e-6)


def test_normalize_np_matches_device():
    """Host NumPy normalization is bit-identical to the device version."""
    import jax.numpy as jnp

    from range_coder_rust_tpu.models.table import normalize_pow2, normalize_pow2_np

    rng = np.random.default_rng(77)
    for k, a in [(8, 10), (12, 256), (16, 256), (4, 3), (16, 100)]:
        for _ in range(5):
            counts = rng.integers(0, 10000, size=a).astype(np.uint32)
            counts[rng.integers(0, a, size=a // 3)] = 0
            if counts.sum() == 0:
                counts[0] = 1
            if (counts > 0).sum() > (1 << k):
                continue
            dev = np.asarray(normalize_pow2(jnp.asarray(counts), k))
            host = normalize_pow2_np(counts, k)
            assert np.array_equal(dev, host), (k, a, counts)
