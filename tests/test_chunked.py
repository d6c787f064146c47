"""Chunked (slab-appended) rans16 encode — the >= 2^31-symbol path
(BASELINE config 4).  Exercised at test scale by shrinking the slab
bound: the chunked container must be BYTE-IDENTICAL to the single-call
one (groups are independent; the slab boundary must not leak into the
stream) and must round-trip."""

import numpy as np
import pytest

from range_coder_rust_tpu import format as fmt
from range_coder_rust_tpu import rans_codec
from range_coder_rust_tpu.models.table import table_from_data_pow2


def _zipf(n, a=256, seed=3, alpha=1.2):
    rng = np.random.default_rng(seed)
    ranks = np.arange(1, a + 1)
    p = 1.0 / ranks**alpha
    p /= p.sum()
    return rng.choice(a, size=n, p=p).astype(np.int32)


@pytest.mark.parametrize("tail", [0, 1234])
def test_chunked_matches_single_call(monkeypatch, tail):
    g, L = 128, 64
    span = g * L
    monkeypatch.setattr(rans_codec, "_SLAB_SYMBOLS", span)  # 1 group/slab
    n = span * 3 + tail
    data = _zipf(n, seed=7 + tail)
    t = table_from_data_pow2(data, 256, 16)

    chunked = rans_codec._encode_chunked(
        data, alphabet=256, table=t, block_len=L, with_checksums=True,
        per_group_tables=False, sync_tiles=0, g=g)
    single = rans_codec.encode(
        data, alphabet=256, table=t, block_len=L, group_lanes=g)
    assert chunked == single

    out = rans_codec.decode(fmt.unpack(chunked))
    np.testing.assert_array_equal(out, data)


def test_chunked_builds_shared_table(monkeypatch):
    g, L = 128, 64
    span = g * L
    monkeypatch.setattr(rans_codec, "_SLAB_SYMBOLS", 2 * span)
    n = span * 5 + 99
    data = _zipf(n, seed=11)
    blob = rans_codec._encode_chunked(
        data, alphabet=256, table=None, block_len=L, with_checksums=True,
        per_group_tables=False, sync_tiles=0, g=g)
    cont = fmt.unpack(blob)
    assert cont.n_symbols == n and not cont.per_block_tables
    np.testing.assert_array_equal(rans_codec.decode(cont), data)


def test_chunked_per_group_tables(monkeypatch):
    g, L = 128, 64
    span = g * L
    monkeypatch.setattr(rans_codec, "_SLAB_SYMBOLS", 2 * span)
    n = span * 3 + 500
    data = _zipf(n, a=64, seed=13)
    chunked = rans_codec._encode_chunked(
        data, alphabet=64, table=None, block_len=L, with_checksums=True,
        per_group_tables=True, sync_tiles=0, g=g)
    single = rans_codec.encode(
        data, alphabet=64, block_len=L, per_group_tables=True,
        group_lanes=g)
    assert chunked == single
    cont = fmt.unpack(chunked)
    assert cont.per_block_tables
    np.testing.assert_array_equal(rans_codec.decode(cont), data)


def test_chunked_sync_tiles_and_range(monkeypatch):
    """Chunked containers keep tile random access working."""
    from range_coder_rust_tpu import api

    g, L = 128, 1024  # 2 tiles of 512 steps at g=128
    span = g * L
    monkeypatch.setattr(rans_codec, "_SLAB_SYMBOLS", span)
    n = span * 2 + 777
    data = _zipf(n, seed=17)
    t = table_from_data_pow2(data, 256, 16)
    blob = rans_codec._encode_chunked(
        data, alphabet=256, table=t, block_len=L, with_checksums=True,
        per_group_tables=False, sync_tiles=1, g=g)
    got = api.decode_range(blob, span + 100, 300)
    np.testing.assert_array_equal(got, data[span + 100 : span + 400])
