"""The whole-tile stream compaction must equal NumPy boolean compress for
any mask, and the flat rolls / lane-prefix primitives it builds on must be
exact (they define the rans16 region byte layout)."""

import jax.numpy as jnp
import numpy as np

from range_coder_rust_tpu.kernels.compact_flat import (
    compact_flat_tile,
    flat_roll_pow2,
)
from range_coder_rust_tpu.kernels.vreg import _lane_prefix_flat


def _run(vals, mask, R=8):
    v = jnp.asarray(vals.reshape(R, 128))
    act = jnp.asarray(mask.reshape(R, 128))
    rank, total = _lane_prefix_flat(act.astype(jnp.int32))
    out = compact_flat_tile(v, act, rank)
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
    for R in (8, 64):
        n = R * 128
        x = np.arange(n).astype(np.uint32).reshape(R, 128)
        for d in (1, 2, 64, 128, 256, n // 2, -1, -128, -300):
            got = np.asarray(flat_roll_pow2(jnp.asarray(x), d)).reshape(-1)
            np.testing.assert_array_equal(got, np.roll(np.arange(n), d))


def test_compact_flat_tile_matches_compress():
    """Whole-tile zombie-routing compaction (round 4): the first ``total``
    flat values must equal NumPy compress for any (R, 128) buffer up to
    the 65536-element cap, across densities and adversarial patterns."""
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
    """The VPU log-prefix (kept as a documented variant) must equal the
    MXU-contraction prefix for every shape the kernels use."""
    from range_coder_rust_tpu.kernels.vreg import _lane_prefix_flat_vpu

    rng = np.random.default_rng(5)
    for R in (8, 16, 512):
        for d in (0.0, 0.3, 1.0):
            n = jnp.asarray((rng.random((R, 128)) < d).astype(np.int32))
            r0, t0 = _lane_prefix_flat(n)
            r1, t1 = _lane_prefix_flat_vpu(n)
            assert int(t0) == int(t1)
            np.testing.assert_array_equal(np.asarray(r0), np.asarray(r1))


def test_lane_prefix_hybrid_matches_mxu():
    from range_coder_rust_tpu.kernels.vreg import _lane_prefix_flat_hybrid

    rng = np.random.default_rng(9)
    for R in (8, 16, 512):
        for d in (0.0, 0.4, 1.0):
            n = jnp.asarray((rng.random((R, 128)) < d).astype(np.int32))
            r0, t0 = _lane_prefix_flat(n)
            r1, t1 = _lane_prefix_flat_hybrid(n)
            assert int(t0) == int(t1)
            np.testing.assert_array_equal(np.asarray(r0), np.asarray(r1))
