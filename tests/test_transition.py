"""Lock-step conformance: the closed-form vector transition
(ops/transition.py) must be byte- and state-identical to the scalar golden
coder (core/rc64.py) — which is itself tested against the C++ golden model —
for long adversarial symbol streams.

The device side runs one ``lax.scan`` collecting the full per-step trace
(emitted low64, byte count, post-state); the comparison against the scalar
coder happens on host afterwards."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from range_coder_rust_tpu.core.rc64 import RangeCoder
from range_coder_rust_tpu.ops import u64
from range_coder_rust_tpu.ops.transition import (
    CoderState,
    decode_find_rfreq,
    flush_state,
    init_state,
    param_update_div,
    param_update_pow2,
)

RNG = np.random.default_rng(7)


def random_pow2_table(a_count, k, rng):
    """Random table with total = 2^k, every freq >= 1."""
    total = 1 << k
    cuts = np.sort(rng.choice(total - 1, size=a_count - 1, replace=False)) + 1
    bounds = np.concatenate([[0], cuts, [total]])
    c = np.diff(bounds).astype(np.uint32)
    assert c.min() >= 1 and c.sum() == total
    cum = np.concatenate([[0], np.cumsum(c)[:-1]]).astype(np.uint32)
    return c, cum


def scalar_trace(symbols, c, cum, total):
    """Reference-semantics per-step trace: (bytes, low, range)."""
    rc = RangeCoder()
    out = []
    for s in symbols:
        b = rc.param_update(int(c[s]), int(cum[s]), int(total))
        out.append((b, rc.lower_bound, rc.range))
    return out


def device_trace_pow2(cs, cums, k, lanes=None):
    """Scan the closed-form transition; returns per-step arrays."""

    def step(st, x):
        cc, cu = x
        st, emit, n = param_update_pow2(st, cc, cu, k)
        return st, (emit.hi, emit.lo, n, st.low.hi, st.low.lo, st.rng.hi, st.rng.lo)

    shape = () if lanes is None else (lanes,)
    st0 = init_state(shape)
    _, ys = jax.lax.scan(jax.jit(step), st0, (jnp.asarray(cs), jnp.asarray(cums)))
    return [np.asarray(y) for y in ys]


def emitted_bytes(ehi, elo, n):
    """Stream bytes of one step: top n bytes of emit, zero-padded past 8."""
    v = (int(ehi) << 32) | int(elo)
    return bytes((v >> (8 * (7 - j))) & 0xFF if j < 8 else 0 for j in range(int(n)))


def check_lockstep(syms, c, cum, total, ehi, elo, en, lhi, llo, rhi, rlo):
    trace = scalar_trace(syms, c, cum, total)
    for i, (want_bytes, want_low, want_rng) in enumerate(trace):
        assert emitted_bytes(ehi[i], elo[i], en[i]) == want_bytes, f"step {i} bytes"
        got_low = (int(lhi[i]) << 32) | int(llo[i])
        got_rng = (int(rhi[i]) << 32) | int(rlo[i])
        assert got_low == want_low, f"step {i} low"
        assert got_rng == want_rng, f"step {i} range"


@pytest.mark.parametrize("k", [1, 8, 12, 16])
def test_lockstep_pow2(k):
    a_count = min(1 << k, 37)
    c, cum = random_pow2_table(a_count, k, RNG)
    n_sym = 4000
    # adversarial mix: random, runs of rarest symbol, runs of most common
    rare = int(np.argmin(c))
    common = int(np.argmax(c))
    syms = RNG.integers(0, a_count, size=n_sym).astype(np.int64)
    syms[500:600] = rare
    syms[700:800] = common
    ys = device_trace_pow2(c[syms], cum[syms], k)
    check_lockstep(syms, c, cum, 1 << k, *ys)


def test_lockstep_div_arbitrary_total():
    """Arbitrary (non-pow2) totals through the division path."""
    rng = np.random.default_rng(21)
    c = rng.integers(1, 5000, size=23).astype(np.uint32)
    cum = np.concatenate([[0], np.cumsum(c)[:-1]]).astype(np.uint32)
    total = int(c.sum())
    syms = rng.integers(0, 23, size=1500).astype(np.int64)

    def step(st, x):
        cc, cu = x
        st, emit, n = param_update_div(st, cc, cu, jnp.uint32(total))
        return st, (emit.hi, emit.lo, n, st.low.hi, st.low.lo, st.rng.hi, st.rng.lo)

    _, ys = jax.lax.scan(
        step, init_state(()), (jnp.asarray(c[syms]), jnp.asarray(cum[syms]))
    )
    check_lockstep(syms, c, cum, total, *[np.asarray(y) for y in ys])


def test_lockstep_vectorized_many_lanes():
    """Same lock-step property, 64 lanes advanced at once, each its own
    stream — the shape the block coder actually runs."""
    k = 12
    a_count = 29
    c, cum = random_pow2_table(a_count, k, RNG)
    B, L = 64, 300
    syms = RNG.integers(0, a_count, size=(B, L))
    # xs for scan: (L, B)
    ys = device_trace_pow2(c[syms].T, cum[syms].T, k, lanes=B)
    for b in range(B):
        lane = [y[:, b] for y in ys]
        check_lockstep(syms[b], c, cum, 1 << k, *lane)


def test_flush_matches_scalar_finish():
    k = 10
    c, cum = random_pow2_table(16, k, RNG)
    syms = RNG.integers(0, 16, size=200)
    rc = RangeCoder()
    for s in syms:
        rc.param_update(int(c[s]), int(cum[s]), 1 << k)
    final_low = rc.lower_bound

    def step(st, x):
        st, _, _ = param_update_pow2(st, x[0], x[1], k)
        return st, ()

    st, _ = jax.lax.scan(
        step, init_state(()), (jnp.asarray(c[syms]), jnp.asarray(cum[syms]))
    )
    emit, n = flush_state(st)
    assert int(n) == 8
    got = int(u64.to_np(emit)).to_bytes(8, "big")
    # scalar finish: 8 left_shifts of lower (reference src/encoder.rs:40-46)
    assert got == final_low.to_bytes(8, "big")


def test_decode_find_rfreq_matches_scalar():
    """rfreq = (data - lower) / rpt must match exact integer math for
    decoder-reachable states (batched in one device call)."""
    k = 16
    rng = np.random.default_rng(3)
    c, cum = random_pow2_table(100, k, rng)
    syms = rng.integers(0, 100, size=500)
    rc = RangeCoder()
    states = []
    for s in syms:
        rc.param_update(int(c[s]), int(cum[s]), 1 << k)
        states.append((rc.lower_bound, rc.range))

    lows, rngs, datas, wants = [], [], [], []
    for low, r in states[::7]:
        rpt = r >> k
        for dl in [0, 1, rpt - 1, rpt, r - 1, r // 2]:
            if not 0 <= dl < r:
                continue
            data = low + dl
            if data >= 1 << 64:  # scalar window never wraps
                continue
            lows.append(low)
            rngs.append(r)
            datas.append(data)
            wants.append(min(dl // rpt, (1 << k) - 1))
    st = CoderState(
        u64.from_np(np.array(lows, np.uint64)), u64.from_np(np.array(rngs, np.uint64))
    )
    got = np.asarray(
        jax.jit(decode_find_rfreq, static_argnums=2)(
            st, u64.from_np(np.array(datas, np.uint64)), k
        )
    )
    assert np.array_equal(got.astype(np.int64), np.array(wants))
