"""Arbitrary-total (non-pow2) device mode — conformance vs the C++ golden.

The reference's PModel contract allows ANY u32 total_freq
(/root/reference/src/pmodel.rs:6-10); the pow2 device path normalizes
tables, so this variant keeps true division and must be byte-identical to
the scalar golden coder for un-normalized tables.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from range_coder_rust_tpu.blocks import (
    decode_blocks_div,
    encode_blocks_div,
)
from range_coder_rust_tpu.native import golden


def _random_table(rng, a):
    """Raw counts with a deliberately non-pow2, odd total."""
    c = rng.integers(1, 1000, a).astype(np.uint32)
    if int(c.sum()) % 2 == 0:
        c[0] += 1  # force an odd total — definitely not a power of two
    cum = np.concatenate([[0], np.cumsum(c)]).astype(np.uint32)
    return c, cum, int(cum[-1])


@pytest.mark.parametrize("a_count", [10, 97])
def test_div_mode_byte_identical_to_golden(a_count):
    rng = np.random.default_rng(a_count)
    c, cum, total = _random_table(rng, a_count)
    B, L = 6, 48
    p = c.astype(np.float64) / total
    syms = rng.choice(a_count, size=(B, L), p=p).astype(np.int32)

    cap = 6 * L + 8
    code, lengths = encode_blocks_div(
        jnp.asarray(syms), jnp.asarray(c), jnp.asarray(cum), total,
        capacity=cap)
    code_np, lengths_np = np.asarray(code), np.asarray(lengths)
    assert int(lengths_np.max()) <= cap

    for b in range(B):
        ref = golden.encode(syms[b], c, cum[:-1], total)
        got = code_np[b, : lengths_np[b]].tobytes()
        assert got == ref, f"block {b}: device stream != scalar golden"

    dec = decode_blocks_div(
        code, jnp.asarray(c), jnp.asarray(cum), total, block_len=L)
    np.testing.assert_array_equal(np.asarray(dec), syms)


def test_div_mode_extreme_totals():
    """Totals near the u32 limit and tiny totals both round-trip."""
    rng = np.random.default_rng(7)
    a = 4
    # huge total: c values ~2^29 each
    c = (rng.integers(1 << 28, 1 << 29, a)).astype(np.uint32)
    cum = np.concatenate([[0], np.cumsum(c.astype(np.uint64))])
    assert cum[-1] < (1 << 32)
    cum = cum.astype(np.uint32)
    total = int(cum[-1])
    syms = rng.integers(0, a, (3, 32)).astype(np.int32)
    cap = 8 * 32 + 8
    code, lengths = encode_blocks_div(
        jnp.asarray(syms), jnp.asarray(c), jnp.asarray(cum), total,
        capacity=cap)
    code_np, ln = np.asarray(code), np.asarray(lengths)
    for b in range(3):
        ref = golden.encode(syms[b], c, cum[:-1], total)
        assert code_np[b, : ln[b]].tobytes() == ref
    dec = decode_blocks_div(
        code, jnp.asarray(c), jnp.asarray(cum), total, block_len=32)
    np.testing.assert_array_equal(np.asarray(dec), syms)


def test_api_raw_total_roundtrip():
    """api.encode/decode with raw-histogram tables (FLAG_RAW_TOTAL)."""
    from range_coder_rust_tpu import api, format as fmt

    rng = np.random.default_rng(23)
    data = rng.integers(0, 200, 5000).astype(np.int32)
    cfg = api.CodecConfig(block_len=128, raw_total=True)
    blob = api.encode(data, config=cfg)
    cont = fmt.unpack(blob)
    assert cont.k == 0 and cont.profile == "planar"
    assert int(cont.tables_c.sum()) == 5000  # the raw histogram IS the table
    np.testing.assert_array_equal(api.decode(blob), data)


def test_api_raw_total_requires_planar():
    from range_coder_rust_tpu import api
    from range_coder_rust_tpu.errors import ConfigError

    with pytest.raises(ConfigError):
        api.CodecConfig(profile="rans16", raw_total=True)


def test_div_mode_boundary_total_2pow24():
    """Totals just below 2^24: quotients can reach total-1, above
    div_small_q's single-stage exactness clip — the two-stage divide must
    take over at 2^24 - 16, not 2^24 (round-2 advisor finding).  The table
    puts nearly all mass on the LAST symbol so decode's rfreq lands near
    total-1 constantly."""
    for total in [(1 << 24) - 1, (1 << 24) - 16, (1 << 24) - 17, 1 << 24]:
        c = np.array([1, 2, total - 3], np.uint32)
        cum = np.concatenate([[0], np.cumsum(c)]).astype(np.uint32)
        rng = np.random.default_rng(total & 0xFFFF)
        syms = rng.choice(3, size=(2, 64), p=c / c.sum()).astype(np.int32)
        syms[0, :4] = [2, 2, 2, 2]  # force max-rfreq territory early
        cap = 6 * 64 + 8
        code, lengths = encode_blocks_div(
            jnp.asarray(syms), jnp.asarray(c), jnp.asarray(cum), total,
            capacity=cap)
        code_np, ln = np.asarray(code), np.asarray(lengths)
        for b in range(2):
            ref = golden.encode(syms[b], c, cum[:-1], total)
            assert code_np[b, : ln[b]].tobytes() == ref, f"total={total}"
        dec = decode_blocks_div(
            code, jnp.asarray(c), jnp.asarray(cum), total, block_len=64)
        np.testing.assert_array_equal(np.asarray(dec), syms)


def test_api_raw_total_wide_alphabet():
    """raw_total with a large alphabet (token-id scale) must not blow up
    the traced program (round-2 advisor: the per-symbol select chain was
    O(alphabet) ops; now one batched gather)."""
    from range_coder_rust_tpu import api

    rng = np.random.default_rng(41)
    data = rng.integers(0, 4096, 2000).astype(np.int32)
    cfg = api.CodecConfig(block_len=256, raw_total=True)
    blob = api.encode(data, alphabet=4096, config=cfg)
    np.testing.assert_array_equal(api.decode(blob), data)
