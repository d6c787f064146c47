"""Property tests: ops/u64 limb arithmetic vs NumPy uint64 (exhaustive-ish
random + adversarial edge cases).  SURVEY.md §5: u64-emulation unit tests
replace the reference's checked-arithmetic guards."""

import numpy as np
import pytest

import jax.numpy as jnp

from range_coder_rust_tpu.ops import u64

RNG = np.random.default_rng(0xC0DEC)

EDGE = np.array(
    [
        0,
        1,
        2,
        0xFF,
        0x100,
        0xFFFF,
        0x10000,
        0xFFFFFFFF,
        0x100000000,
        0x0000FFFFFFFFFFFF,
        0x0001000000000000,
        0x00FFFFFFFFFFFFFF,
        0x0100000000000000,
        0x7FFFFFFFFFFFFFFF,
        0x8000000000000000,
        0xFFFFFFFFFFFFFFFE,
        0xFFFFFFFFFFFFFFFF,
    ],
    dtype=np.uint64,
)


def rand_u64(n):
    # mix uniform bits with values biased to edge structure (runs of 0/1 bytes)
    a = RNG.integers(0, 1 << 64, size=n, dtype=np.uint64)
    shift = RNG.integers(0, 64, size=n, dtype=np.uint64)
    b = (~np.uint64(0)) << shift
    c = (~np.uint64(0)) >> shift
    mix = RNG.integers(0, 3, size=n)
    return np.where(mix == 0, a, np.where(mix == 1, a & b, a | c))


def pairs(n=4096):
    xs = np.concatenate([EDGE, rand_u64(n)])
    ys = np.concatenate([EDGE[::-1], rand_u64(n)])
    m = min(len(xs), len(ys))
    return xs[:m], ys[:m]


def test_roundtrip_np():
    x, _ = pairs()
    assert np.array_equal(u64.to_np(u64.from_np(x)), x)


def test_add_sub():
    x, y = pairs()
    a, b = u64.from_np(x), u64.from_np(y)
    assert np.array_equal(u64.to_np(u64.add(a, b)), x + y)
    assert np.array_equal(u64.to_np(u64.sub(a, b)), x - y)


def test_add_overflow_flag():
    x, y = pairs()
    a, b = u64.from_np(x), u64.from_np(y)
    s, of = u64.add_overflow(a, b)
    assert np.array_equal(u64.to_np(s), x + y)
    exact = x.astype(object) + y.astype(object)
    assert np.array_equal(np.asarray(of), np.array([v > 0xFFFFFFFFFFFFFFFF for v in exact]))


def test_compares():
    x, y = pairs()
    a, b = u64.from_np(x), u64.from_np(y)
    assert np.array_equal(np.asarray(u64.lt(a, b)), x < y)
    assert np.array_equal(np.asarray(u64.ge(a, b)), x >= y)
    assert np.array_equal(np.asarray(u64.eq(a, a)), np.ones_like(x, bool))
    assert np.array_equal(np.asarray(u64.eq(a, b)), x == y)


def test_logicals():
    x, y = pairs()
    a, b = u64.from_np(x), u64.from_np(y)
    assert np.array_equal(u64.to_np(u64.bit_and(a, b)), x & y)
    assert np.array_equal(u64.to_np(u64.bit_or(a, b)), x | y)
    assert np.array_equal(u64.to_np(u64.bit_xor(a, b)), x ^ y)
    assert np.array_equal(u64.to_np(u64.bit_not(a)), ~x)


@pytest.mark.parametrize("kind", ["shl", "shr"])
def test_dynamic_shifts(kind):
    x, _ = pairs()
    a = u64.from_np(x)
    for n in list(range(0, 65)) + [70, 100]:
        nn = jnp.full(x.shape, n, jnp.int32)
        if kind == "shl":
            got = u64.to_np(u64.shl(a, nn))
            want = x << np.uint64(n) if n < 64 else np.zeros_like(x)
        else:
            got = u64.to_np(u64.shr(a, nn))
            want = x >> np.uint64(n) if n < 64 else np.zeros_like(x)
        assert np.array_equal(got, want), f"{kind} by {n}"


@pytest.mark.parametrize("n", [0, 1, 7, 8, 16, 31, 32, 33, 48, 56, 63, 64, 80])
def test_static_shifts(n):
    x, _ = pairs()
    a = u64.from_np(x)
    want_l = x << np.uint64(n) if n < 64 else np.zeros_like(x)
    want_r = x >> np.uint64(n) if n < 64 else np.zeros_like(x)
    assert np.array_equal(u64.to_np(u64.shli(a, n)), want_l)
    assert np.array_equal(u64.to_np(u64.shri(a, n)), want_r)


def test_clz():
    x, _ = pairs()
    a = u64.from_np(x)
    got = np.asarray(u64.clz(a))
    want = np.array([64 - v.item().bit_length() for v in x])
    assert np.array_equal(got, want)
    # every single-bit value
    bits = np.uint64(1) << np.arange(64, dtype=np.uint64)
    got = np.asarray(u64.clz(u64.from_np(bits)))
    assert np.array_equal(got, 63 - np.arange(64))


def test_mul32_wide():
    n = 4096
    a = RNG.integers(0, 1 << 32, size=n, dtype=np.uint64).astype(np.uint32)
    b = RNG.integers(0, 1 << 32, size=n, dtype=np.uint64).astype(np.uint32)
    a = np.concatenate([a, np.array([0, 1, 0xFFFF, 0x10000, 0xFFFFFFFF], np.uint32)])
    b = np.concatenate([b, np.array([0xFFFFFFFF, 0xFFFFFFFF, 0xFFFF, 0x10000, 1], np.uint32)])
    hi, lo = u64.mul32_wide(jnp.asarray(a), jnp.asarray(b))
    prod = a.astype(np.uint64) * b.astype(np.uint64)
    assert np.array_equal(np.asarray(hi), (prod >> np.uint64(32)).astype(np.uint32))
    assert np.array_equal(np.asarray(lo), prod.astype(np.uint32))


def test_mul_u64_u32():
    x, _ = pairs()
    b = RNG.integers(0, 1 << 32, size=len(x), dtype=np.uint64).astype(np.uint32)
    got = u64.to_np(u64.mul_u64_u32(u64.from_np(x), jnp.asarray(b)))
    want = x * b.astype(np.uint64)  # numpy wraps mod 2^64
    assert np.array_equal(got, want)


def test_mul_u64_u32_wide():
    x, _ = pairs()
    b = RNG.integers(0, 1 << 32, size=len(x), dtype=np.uint64).astype(np.uint32)
    carry, low = u64.mul_u64_u32_wide(u64.from_np(x), jnp.asarray(b))
    for xi, bi, ci, li in zip(
        x.tolist(), b.tolist(), np.asarray(carry).tolist(), u64.to_np(low).tolist()
    ):
        prod = xi * bi
        assert (prod >> 64) == ci and (prod & ((1 << 64) - 1)) == li


def test_divmod_u32():
    x, _ = pairs(8192)
    d = np.concatenate(
        [
            RNG.integers(1, 1 << 32, size=len(x) - 8, dtype=np.uint64),
            np.array([1, 2, 3, 0xFFFF, 0x10000, 0xFFFFFFFF, 10, 7], np.uint64),
        ]
    ).astype(np.uint32)
    q, r = u64.divmod_u32(u64.from_np(x), jnp.asarray(d))
    want_q = x // d.astype(np.uint64)
    want_r = x % d.astype(np.uint64)
    assert np.array_equal(u64.to_np(q), want_q)
    assert np.array_equal(np.asarray(r).astype(np.uint64), want_r)


def test_div_small_q():
    # decoder-shaped operands: y = rpt >= 2^32 (range >= 2^48, k <= 16),
    # x = data - lower < range <= rpt * 2^16 + rem, so q <= 2^16.
    n = 8192
    y = RNG.integers(1 << 32, 1 << 63, size=n, dtype=np.uint64)
    qtrue = RNG.integers(0, 1 << 16, size=n, dtype=np.uint64)
    slack = RNG.integers(0, 1 << 32, size=n, dtype=np.uint64)
    x = qtrue * y + (slack % np.maximum(y, np.uint64(1)))
    ok = x >= qtrue * y  # discard wrapped cases
    x, y, qtrue = x[ok], y[ok], qtrue[ok]
    got = np.asarray(u64.div_small_q(u64.from_np(x), u64.from_np(y)))
    assert np.array_equal(got.astype(np.uint64), x // y)


def test_div_small_q_edges():
    xs, ys = [], []
    for y in [1 << 32, (1 << 48) - 1, 1 << 48, (1 << 63) - 55, 0xFFFFFFFFFFFF]:
        for q in [0, 1, 2, 65535, 65536, 1234]:
            for off in [0, 1, y - 1]:
                x = q * y + off
                if x < 1 << 64 and off < y:
                    xs.append(x)
                    ys.append(y)
    x = np.array(xs, np.uint64)
    y = np.array(ys, np.uint64)
    got = np.asarray(u64.div_small_q(u64.from_np(x), u64.from_np(y)))
    assert np.array_equal(got.astype(np.uint64), x // y)


def test_byte():
    x, _ = pairs()
    a = u64.from_np(x)
    for i in range(10):
        got = np.asarray(u64.byte(a, jnp.full(x.shape, i, jnp.int32)))
        want = (
            (x >> np.uint64(56 - 8 * i)) & np.uint64(0xFF) if i < 8 else np.zeros_like(x)
        )
        assert np.array_equal(got.astype(np.uint64), want), f"byte {i}"
