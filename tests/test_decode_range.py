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


def test_rans16_sync_points_tile_random_access():
    """sync_tiles containers decode small slices while only PARSING the
    rest: corrupting region bytes outside the touched tile window must
    not affect the slice (proof the rest is never decoded), and the
    sync overhead must be exactly S * 6 * G bytes per group."""
    from range_coder_rust_tpu import rans, rans_codec

    G = rans.GROUP_LANES
    L = 256  # 8 tiles of 32 at the 2048-lane default
    T = 2
    data = _zipf(G * L + 12345, seed=9)
    cfg = api.CodecConfig(profile="rans16", block_len=L, sync_tiles=T)
    blob = api.encode(data, alphabet=256, config=cfg)
    cfg0 = api.CodecConfig(profile="rans16", block_len=L)
    blob0 = api.encode(data, alphabet=256, config=cfg0)
    tile = L // 8 if L >= rans_codec.TILE_STEPS else L

    # full decode ignores sync sections
    np.testing.assert_array_equal(api.decode(blob), data)

    # size overhead: S syncs of 6*G bytes per group (+4B sync_T header)
    from range_coder_rust_tpu import format as fmt
    cont = fmt.unpack(blob)
    n_sync = (L // tile - 1) // T
    per_group = n_sync * 6 * G + 4
    assert len(blob) - len(blob0) == per_group * len(cont.payloads)

    # slices decode exactly
    for start, count in [(0, 100), (L - 5, 10), (G * L - 3, 20),
                         (L * 7, 64)]:
        got = api.decode_range(blob, start, count)
        np.testing.assert_array_equal(got, data[start : start + count])

    # decode a slice in the LAST lane's early steps: with sync entry at
    # tile 0's sync... corrupt region bytes of the FINAL tiles (beyond
    # the touched window) — the slice must still decode, because those
    # tiles are parsed (sizes) but never decoded
    sizes, pre6, region, sync_t, sync6 = rans_codec._parse_payload(
        cont.payloads[0], L, G, full=True)
    assert sync_t == T and len(sync6) == n_sync * 6 * G
    p = bytearray(cont.payloads[0])
    tail_off = len(p) - 2 * int(sizes[-1])  # last tile's region bytes
    p[tail_off:] = bytes(len(p) - tail_off)  # zero the last tile
    cont2 = type(cont)(**{**cont.__dict__,
                          "payloads": [bytes(p)] + cont.payloads[1:],
                          "checksums": None})
    rows, step0 = rans_codec.decode_tile_range(
        bytes(p), np.asarray(cont.tables_c), L, 2 * T * tile,
        2 * T * tile + 5, G)
    want = data[: G * L].reshape(G, L)
    lo = (2 * T * tile // (T * tile)) * T * tile  # sync entry step
    assert step0 == 2 * T * tile - (2 * T * tile - lo)
    np.testing.assert_array_equal(
        rows[:, 2 * T * tile - step0 : 2 * T * tile - step0 + 5],
        want[:, 2 * T * tile : 2 * T * tile + 5])
