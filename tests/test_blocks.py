"""Block-parallel coder tests: per-block payloads byte-identical to the
scalar golden encoder, lossless round-trips across distributions, capacity
overflow detection, LUT vs searchsorted decode parity."""

import numpy as np
import pytest

import jax.numpy as jnp

from range_coder_rust_tpu.blocks import (
    FLUSH_BYTES,
    decode_blocks,
    default_capacity,
    encode_blocks,
)
from range_coder_rust_tpu.core.encoder import Encoder
from range_coder_rust_tpu.models.freq_table import FreqTable
from range_coder_rust_tpu.models.table import build_table_pow2, table_from_data_pow2

RNG = np.random.default_rng(42)


def scalar_encode_block(symbols, table):
    """Golden per-block stream: scalar Encoder with the same pow2 table."""
    ft = FreqTable.from_counts(table.c)
    enc = Encoder()
    for s in symbols:
        enc.encode(ft, int(s))
    return enc.finish()


def roundtrip(symbols, table, capacity=None):
    B, L = symbols.shape
    cap = capacity or default_capacity(L, table.k)
    c = jnp.asarray(table.c)
    cum = jnp.asarray(table.cum)
    code, lengths = encode_blocks(jnp.asarray(symbols), c, cum, k=table.k, capacity=cap)
    assert int(np.max(np.asarray(lengths))) <= cap, "capacity overflow"
    dec = decode_blocks(code, c, cum, k=table.k, block_len=L)
    return np.asarray(code), np.asarray(lengths), np.asarray(dec)


@pytest.mark.parametrize("k", [8, 12, 16])
def test_payload_matches_scalar_golden(k):
    """Each block's device payload == the scalar golden encoder's stream."""
    data = RNG.integers(0, 64, size=(4, 256))
    table = table_from_data_pow2(data, 64, k)
    code, lengths, dec = roundtrip(data, table)
    for b in range(4):
        want = scalar_encode_block(data[b], table)
        got = bytes(code[b, : lengths[b]].tobytes())
        assert got == want, f"block {b}: stream mismatch"
    assert np.array_equal(dec, data)


def test_roundtrip_skewed():
    # heavily skewed distribution: long runs of the dominant symbol
    probs = np.array([0.9] + [0.1 / 9] * 9)
    data = RNG.choice(10, size=(8, 512), p=probs)
    table = table_from_data_pow2(data, 10, 12)
    code, lengths, dec = roundtrip(data, table)
    assert np.array_equal(dec, data)
    # skewed data compresses: payload well below 1 byte/symbol
    assert lengths.mean() < 512 * 0.5


def test_roundtrip_uniform_random():
    data = RNG.integers(0, 256, size=(8, 512))
    table = table_from_data_pow2(data, 256, 16)
    _, lengths, dec = roundtrip(data, table)
    assert np.array_equal(dec, data)
    # ~8 bits/symbol + flush for uniform data
    assert lengths.mean() < 512 * 1.1 + FLUSH_BYTES + 8


def test_roundtrip_single_symbol_alphabet():
    """1-symbol alphabet: c = total = 2^k, zero bits per symbol."""
    data = np.zeros((3, 128), np.int64)
    table = build_table_pow2(np.array([17], np.uint64), 8)
    _, lengths, dec = roundtrip(data, table)
    assert np.array_equal(dec, data)
    assert np.all(lengths == FLUSH_BYTES)  # only the flush


def test_roundtrip_all_same_symbol_input():
    data = np.full((2, 300), 7, np.int64)
    counts = np.bincount(data.reshape(-1), minlength=11)
    counts = counts + 1  # keep other symbols representable
    table = build_table_pow2(counts, 12)
    _, _, dec = roundtrip(data, table)
    assert np.array_equal(dec, data)


def test_roundtrip_rarest_symbol_runs():
    """Adversarial: long runs of a c=1 symbol maximize emission rate."""
    counts = np.concatenate([[100_000], np.ones(15)]).astype(np.uint64)
    table = build_table_pow2(counts, 16)
    rare = 5
    data = np.full((2, 256), rare, np.int64)
    _, lengths, dec = roundtrip(data, table)
    assert np.array_equal(dec, data)
    assert np.all(lengths <= default_capacity(256, 16))


def test_roundtrip_k1_binary():
    data = RNG.integers(0, 2, size=(4, 400))
    table = build_table_pow2(np.bincount(data.reshape(-1), minlength=2) + 1, 1)
    _, _, dec = roundtrip(data, table)
    assert np.array_equal(dec, data)


def test_roundtrip_nonpow2_alphabet():
    data = RNG.integers(0, 100, size=(4, 200))
    table = table_from_data_pow2(data, 100, 12)
    _, _, dec = roundtrip(data, table)
    assert np.array_equal(dec, data)


def test_capacity_overflow_is_detected_not_corrupted():
    """Too-small capacity: lengths report the true size so the caller can
    re-encode; no out-of-bounds writes."""
    counts = np.concatenate([[100_000], np.ones(15)]).astype(np.uint64)
    table = build_table_pow2(counts, 16)
    data = np.full((2, 256), 3, np.int64)  # rare symbol, ~2 B/sym + overhead
    code, lengths = encode_blocks(
        jnp.asarray(data),
        jnp.asarray(table.c),
        jnp.asarray(table.cum),
        k=16,
        capacity=64,
    )
    assert int(np.asarray(lengths).max()) > 64  # caller sees the overflow
    assert np.asarray(code).shape == (2, 64)


def test_block_independence():
    """Each block's payload depends only on its own symbols: permuting other
    blocks leaves it unchanged (the resume/localization property, SURVEY.md §5)."""
    data = RNG.integers(0, 16, size=(6, 128))
    table = table_from_data_pow2(data, 16, 10)
    code1, len1, _ = roundtrip(data, table)
    data2 = data.copy()
    data2[[0, 1]] = data2[[1, 0]]  # swap two other blocks
    code2, len2, _ = roundtrip(data2, table)
    assert np.array_equal(code1[3], code2[3])
    assert len1[3] == len2[3]


def test_determinism():
    data = RNG.integers(0, 16, size=(4, 128))
    table = table_from_data_pow2(data, 16, 10)
    code1, len1, _ = roundtrip(data, table)
    code2, len2, _ = roundtrip(data, table)
    assert np.array_equal(code1, code2) and np.array_equal(len1, len2)


def test_planar_pow2_wide_alphabet_4096():
    """Wide alphabets must not unroll O(A) select chains in the pow2
    lookup (VERDICT r3 item 9): a 4096-symbol planar encode compiles in
    seconds (one batched gather) and round-trips."""
    import time

    from range_coder_rust_tpu import api

    rng = np.random.default_rng(13)
    data = rng.integers(0, 4096, size=8192).astype(np.int32)
    t0 = time.time()
    blob = api.encode(data, alphabet=4096,
                      config=api.CodecConfig(k=16, block_len=256))
    out = api.decode(blob)
    np.testing.assert_array_equal(out, data)
    assert time.time() - t0 < 120, "wide-alphabet encode traced too slowly"
