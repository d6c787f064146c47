"""compact_flat must equal NumPy boolean compress for any mask."""

import jax.numpy as jnp
import numpy as np
import pytest

from range_coder_rust_tpu.kernels.compact_flat import (
    compact_flat,
    flat_roll_dyn,
    flat_roll_pow2,
)


def _run(vals, mask):
    out, rank, total = compact_flat(
        jnp.asarray(vals.reshape(8, 128)), jnp.asarray(mask.reshape(8, 128))
    )
    return np.asarray(out).reshape(-1), int(np.asarray(total))


def test_compact_random_masks():
    rng = np.random.default_rng(0)
    for density in (0.0, 0.02, 0.3, 0.5, 0.8, 0.97, 1.0):
        for _ in range(20):
            vals = rng.integers(0, 1 << 16, size=1024).astype(np.uint32)
            mask = rng.random(1024) < density
            got, total = _run(vals, mask)
            want = vals[mask]
            assert total == want.size
            np.testing.assert_array_equal(got[: want.size], want)


def test_compact_adversarial_masks():
    vals = np.arange(1024).astype(np.uint32)
    masks = [
        np.zeros(1024, bool),
        np.ones(1024, bool),
        np.arange(1024) % 2 == 1,
        np.arange(1024) % 2 == 0,
        np.arange(1024) >= 1023,          # single last element
        np.arange(1024) < 1,              # single first element
        np.arange(1024) >= 512,           # back half
        (np.arange(1024) % 128) == 127,   # one per row, end of row
        (np.arange(1024) // 128) % 2 == 0,  # alternating rows
    ]
    for mask in masks:
        got, total = _run(vals, mask)
        want = vals[mask]
        assert total == want.size
        np.testing.assert_array_equal(got[: want.size], want)


def test_flat_rolls():
    x = np.arange(1024).astype(np.uint32).reshape(8, 128)
    for d in (1, 2, 64, 128, 256, 512, -1, -128, -300):
        got = np.asarray(flat_roll_pow2(jnp.asarray(x), d)).reshape(-1)
        want = np.roll(np.arange(1024), d)
        np.testing.assert_array_equal(got, want)
    for s in (0, 1, 127, 128, 1000):
        got = np.asarray(
            flat_roll_dyn(jnp.asarray(x), jnp.int32(s))
        ).reshape(-1)
        np.testing.assert_array_equal(got, np.roll(np.arange(1024), s))


def test_compact_flat_packed_matches_compact_flat():
    """The single-word packed routing must agree with the 3-array one."""
    import jax.numpy as jnp
    from range_coder_rust_tpu.kernels.compact_flat import (
        compact_flat, compact_flat_packed)

    rng = np.random.default_rng(17)
    for density in (0.0, 0.1, 0.5, 0.9, 1.0):
        v = jnp.asarray(rng.integers(0, 1 << 16, (8, 128)), jnp.uint32)
        act = jnp.asarray(rng.random((8, 128)) < density)
        c0, r0, t0 = compact_flat(v, act)
        c1, r1, t1 = compact_flat_packed(v, act)
        n = int(t0)
        assert int(t1) == n
        np.testing.assert_array_equal(np.asarray(r0), np.asarray(r1))
        np.testing.assert_array_equal(
            np.asarray(c0).reshape(-1)[:n], np.asarray(c1).reshape(-1)[:n])


def test_compact_flat_tile_matches_compress():
    """Whole-tile zombie-routing compaction (round 4): the first ``total``
    flat values must equal NumPy compress for any (R, 128) buffer up to
    the 65536-element cap, across densities and adversarial patterns."""
    import jax.numpy as jnp
    from range_coder_rust_tpu.kernels.compact_flat import compact_flat_tile
    from range_coder_rust_tpu.kernels.vreg import _lane_prefix_flat

    rng = np.random.default_rng(23)
    for R in (8, 16, 64, 512):
        n = R * 128
        vals = rng.integers(0, 1 << 16, (R, 128)).astype(np.uint32)
        masks = [
            rng.random((R, 128)) < d for d in (0.0, 0.05, 0.33, 0.95, 1.0)
        ] + [
            np.arange(n).reshape(R, 128) == n - 1,     # single last element
            np.arange(n).reshape(R, 128) == 0,         # single first
            (np.arange(n).reshape(R, 128) // 128) % 2 == 1,  # odd rows
        ]
        for mask in masks:
            act = jnp.asarray(mask.astype(np.int32))
            rank, total = _lane_prefix_flat(act)
            got = np.asarray(compact_flat_tile(
                jnp.asarray(vals), jnp.asarray(mask), rank)).reshape(-1)
            want = vals.reshape(-1)[mask.reshape(-1)]
            assert int(total) == want.size
            np.testing.assert_array_equal(got[: want.size], want)


def test_lane_prefix_vpu_matches_mxu():
    """The VPU log-prefix (decode's per-step refill rank) must equal the
    MXU-contraction prefix for every shape the kernels use."""
    import jax.numpy as jnp
    from range_coder_rust_tpu.kernels.vreg import (
        _lane_prefix_flat, _lane_prefix_flat_vpu)

    rng = np.random.default_rng(5)
    for R in (8, 16, 512):
        for d in (0.0, 0.3, 1.0):
            n = jnp.asarray((rng.random((R, 128)) < d).astype(np.int32))
            r0, t0 = _lane_prefix_flat(n)
            r1, t1 = _lane_prefix_flat_vpu(n)
            assert int(t0) == int(t1)
            np.testing.assert_array_equal(np.asarray(r0), np.asarray(r1))


def test_lane_prefix_hybrid_matches_mxu():
    import jax.numpy as jnp
    from range_coder_rust_tpu.kernels.vreg import (
        _lane_prefix_flat, _lane_prefix_flat_hybrid)

    rng = np.random.default_rng(9)
    for R in (8, 16, 512):
        for d in (0.0, 0.4, 1.0):
            n = jnp.asarray((rng.random((R, 128)) < d).astype(np.int32))
            r0, t0 = _lane_prefix_flat(n)
            r1, t1 = _lane_prefix_flat_hybrid(n)
            assert int(t0) == int(t1)
            np.testing.assert_array_equal(np.asarray(r0), np.asarray(r1))
