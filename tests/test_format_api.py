"""Container format + high-level API tests: round trips, validation errors,
corruption localization, compression-vs-entropy bound."""

import numpy as np
import pytest

from range_coder_rust_tpu import api
from range_coder_rust_tpu import format as fmt
from range_coder_rust_tpu.api import CodecConfig
from range_coder_rust_tpu.errors import (
    ChecksumMismatch,
    ConfigError,
    InvalidHeader,
    ZeroFrequency,
)
from range_coder_rust_tpu.models.table import build_table_pow2

RNG = np.random.default_rng(5)
CFG = CodecConfig(k=12, block_len=512)


def test_roundtrip_bytes():
    data = bytes(RNG.integers(0, 256, size=10_000, dtype=np.uint8))
    blob = api.encode(data, config=CFG)
    assert api.decode_bytes(blob) == data


def test_roundtrip_text_like():
    # skewed, text-like distribution
    base = b"the quick brown fox jumps over the lazy dog. " * 400
    blob = api.encode(base, config=CFG)
    assert api.decode_bytes(blob) == base
    # compresses: ~4.4 bits/char entropy for this text
    assert len(blob) < len(base) * 0.75


def test_roundtrip_partial_last_block():
    data = RNG.integers(0, 50, size=CFG.block_len * 3 + 17)
    blob = api.encode(data, config=CFG)
    out = api.decode(blob)
    assert np.array_equal(out, data)


def test_roundtrip_tiny_and_empty():
    for n in [0, 1, 2, 7]:
        data = RNG.integers(0, 5, size=n)
        blob = api.encode(data, config=CFG)
        out = api.decode(blob)
        assert np.array_equal(out, data), f"n={n}"


def test_roundtrip_single_block():
    data = RNG.integers(0, 8, size=100)
    blob = api.encode(data, config=CodecConfig(k=8, block_len=4096))
    assert np.array_equal(api.decode(blob), data)


def test_compressed_size_near_entropy():
    """Achieved bits/symbol within a few % of the order-0 Shannon bound
    (the ideal_code_length contract, reference src/pmodel.rs:14-40)."""
    probs = np.array([0.5, 0.25, 0.125, 0.0625, 0.0625])
    n = 200_000
    data = RNG.choice(5, size=n, p=probs)
    blob = api.encode(data, config=CodecConfig(k=16, block_len=8192))
    counts = np.bincount(data, minlength=5)
    p = counts / n
    entropy = -(p[p > 0] * np.log2(p[p > 0])).sum()
    payload_bits = 8 * (len(blob) - fmt.HEADER_BYTES)
    bits_per_sym = payload_bits / n
    assert bits_per_sym < entropy * 1.05 + 0.1, (bits_per_sym, entropy)
    assert np.array_equal(api.decode(blob), data)


def test_explicit_table_and_zero_freq_guard():
    table = build_table_pow2(np.array([10, 5, 0, 3], np.uint64), 8)
    data = np.array([0, 1, 3, 0], np.int64)
    blob = api.encode(data, table=table, config=CodecConfig(k=8, block_len=64))
    assert np.array_equal(api.decode(blob), data)
    with pytest.raises(ZeroFrequency):
        api.encode(np.array([0, 2]), table=table, config=CodecConfig(k=8, block_len=64))


def test_alphabet_validation():
    with pytest.raises(ConfigError):
        api.encode(np.array([0, 5]), alphabet=3, config=CFG)
    with pytest.raises(ConfigError):
        api.encode(np.array([-1, 2]), config=CFG)


def test_bad_magic_and_truncation():
    blob = api.encode(b"hello world hello", config=CFG)
    with pytest.raises(InvalidHeader):
        api.decode(b"XXXX" + blob[4:])
    with pytest.raises(InvalidHeader):
        api.decode(blob[: len(blob) - 3])
    with pytest.raises(InvalidHeader):
        api.decode(blob[:10])
    with pytest.raises(InvalidHeader):
        api.decode(blob + b"\x00")  # trailing garbage


def test_checksum_localizes_corruption():
    data = RNG.integers(0, 100, size=CFG.block_len * 4)
    blob = bytearray(api.encode(data, config=CFG))
    cont = fmt.unpack(bytes(blob))
    # flip one byte inside block 2's payload
    payload_start = len(blob) - sum(len(p) for p in cont.payloads)
    off = payload_start + len(cont.payloads[0]) + len(cont.payloads[1]) + 5
    blob[off] ^= 0xFF
    with pytest.raises(ChecksumMismatch) as ei:
        api.decode(bytes(blob))
    assert ei.value.block_index == 2
    # without verification it still decodes (garbage in block 2 only)
    out = api.decode(bytes(blob), verify_checksums=False)
    L = CFG.block_len
    assert np.array_equal(out[:2 * L], data[:2 * L])
    assert np.array_equal(out[3 * L:], data[3 * L:])
    assert not np.array_equal(out[2 * L:3 * L], data[2 * L:3 * L])


def test_pack_unpack_roundtrip_fields():
    payloads = [b"\x01" * 10, b"\x02" * 20]
    c = np.array([128, 128], np.uint32)
    blob = fmt.pack(
        k=8, alphabet=2, block_len=16, n_symbols=30, payloads=payloads,
        tables_c=c, with_checksums=True,
    )
    cont = fmt.unpack(blob)
    assert cont.k == 8 and cont.alphabet == 2 and cont.block_len == 16
    assert cont.n_symbols == 30 and cont.n_blocks == 2
    assert cont.payloads == payloads
    assert np.array_equal(cont.tables_c, c)


def test_unpack_rejects_bad_tables():
    payloads = [b"\x00" * 8]
    c = np.array([100, 100], np.uint32)  # sums to 200 != 256
    blob = fmt.pack(
        k=8, alphabet=2, block_len=8, n_symbols=8, payloads=payloads, tables_c=c
    )
    with pytest.raises(InvalidHeader):
        fmt.unpack(blob)


def test_k16_table_dtype_roundtrip():
    """k=16: c can hold the value 2**16, needs the u32 table dtype."""
    c = np.array([1 << 16], np.uint32)
    blob = fmt.pack(
        k=16, alphabet=1, block_len=8, n_symbols=8,
        payloads=[b"\x00" * 8], tables_c=c,
    )
    cont = fmt.unpack(blob)
    assert int(cont.tables_c[0]) == 1 << 16


def test_chunked_encode_decode_paths():
    """Force multi-chunk host orchestration (chunk_symbols < corpus)."""
    cfg = CodecConfig(k=10, block_len=256, chunk_symbols=1024)  # 4 rows/chunk
    data = RNG.integers(0, 30, size=256 * 11 + 3)
    blob = api.encode(data, config=cfg)
    assert np.array_equal(api.decode(blob), data)


def test_rans16_payload_validation_errors():
    """Malformed rans16 payloads raise typed InvalidHeader, never crash:
    truncation, inconsistent tile counts, oversized tile sizes, bad sync
    period (reference panics on truncated input, src/decoder.rs:33 —
    SURVEY §5 mandates typed validation instead)."""
    import numpy as np
    import pytest

    from range_coder_rust_tpu import rans, rans_codec
    from range_coder_rust_tpu.errors import InvalidHeader

    G = rans.GROUP_LANES
    L = 64
    rng = np.random.default_rng(2)
    data = rng.integers(0, 100, size=(G, L)).astype(np.int32)
    from range_coder_rust_tpu.models.table import table_from_data_pow2

    t = table_from_data_pow2(data, 100, 16)
    p = rans_codec.encode_groups(data, t, L)[0]

    with pytest.raises(InvalidHeader):
        rans_codec._parse_payload(p[:3], L)            # truncated header
    with pytest.raises(InvalidHeader):
        rans_codec._parse_payload(p[: len(p) // 2], L)  # truncated body
    bad = bytearray(p)
    bad[0:4] = np.uint32(7).tobytes()                   # 7 tiles for L=64
    with pytest.raises(InvalidHeader):
        rans_codec._parse_payload(bytes(bad), L)
    bad = bytearray(p)
    nt = int(np.frombuffer(p[:4], "<u4")[0])
    bad[4:8] = np.uint32(1 << 30).tobytes()             # size > capacity
    with pytest.raises(InvalidHeader):
        rans_codec._parse_payload(bytes(bad), L)
    bad = bytearray(p)
    bad[0:4] = np.uint32(nt | (1 << 31)).tobytes()      # sync flag, T=0
    bad[4:8] = np.uint32(0).tobytes()
    with pytest.raises(InvalidHeader):
        rans_codec._parse_payload(bytes(bad), L)


def test_rans16_payload_unaligned_truncation():
    """Truncations that leave non-4-byte-aligned sections must still be
    typed InvalidHeader, not numpy ValueError (advisor r4)."""
    import numpy as np
    import pytest

    from range_coder_rust_tpu import rans_codec
    from range_coder_rust_tpu.errors import InvalidHeader

    nt_word = np.uint32(2 | (1 << 31)).tobytes()
    with pytest.raises(InvalidHeader):
        rans_codec._parse_payload(nt_word + b"\x01\x02", 64)  # 6 bytes
    with pytest.raises(InvalidHeader):
        rans_codec._parse_payload(
            np.uint32(2).tobytes() + b"\x01\x02\x03", 64)  # 7 bytes
