"""Chain-interleaved decode (round 5): C independent group chains per
grid step must be bit-identical to the single-chain kernel, across group
widths, alphabets and per-group tables.  (kernels/rans_decode.py)"""

import numpy as np
import pytest

from range_coder_rust_tpu import rans_codec
from range_coder_rust_tpu.models.table import table_from_data_pow2


def _zipf(n, a=256, seed=3, alpha=1.2):
    rng = np.random.default_rng(seed)
    ranks = np.arange(1, a + 1)
    p = 1.0 / ranks**alpha
    p /= p.sum()
    return rng.choice(a, size=n, p=p).astype(np.int32)


def _stage(payloads, t_c, L, g):
    import jax
    import jax.numpy as jnp

    from range_coder_rust_tpu.kernels.vreg import prep_cum_vreg

    parsed = [rans_codec._parse_payload(p, L, g) for p in payloads]
    sizes = np.stack([s for s, _, _ in parsed])
    region = b"".join(bytes(r) for _, _, r in parsed)
    rows_np, ridx, starts, rpad = rans_codec._stage_stream_windows(
        sizes, region, g)
    pre = jnp.asarray(rans_codec._states_to_words(
        [p6 for _, p6, _ in parsed], g))
    cum_vreg = jnp.asarray(prep_cum_vreg(
        np.concatenate([[0], np.cumsum(t_c)]).astype(np.uint32)))
    padded = jnp.take(jnp.asarray(rows_np), jnp.asarray(ridx),
                      axis=0).reshape(len(payloads), sizes.shape[1],
                                      rpad, 128)
    return padded, jnp.asarray(starts), pre, cum_vreg


@pytest.mark.parametrize(
    "g,L,a,chain_set",
    [(128, 64, 256, (2, 4)), (128, 96, 77, (2, 4)),
     (256, 64, 300, (2,)), (128, 64, 129, (4,))],
)
def test_chains_bit_identical(g, L, a, chain_set):
    from range_coder_rust_tpu.kernels.rans_decode import rans_decode_tiled

    NG = 4
    data = _zipf(NG * g * L, a=a, seed=g + L + a).reshape(NG * g, L)
    t = table_from_data_pow2(data, a, 16)
    payloads = rans_codec.encode_groups(data, t, L, 0, g)
    padded, starts, pre, cum_vreg = _stage(payloads, t.c, L, g)

    base = np.asarray(rans_decode_tiled(
        padded, starts, pre, cum_vreg, block_len=L, a_count=a,
        interpret=True, chains=1))
    np.testing.assert_array_equal(
        base.reshape(NG * g, L), data)  # chains=1 inverts the encoder
    for c in chain_set:
        got = np.asarray(rans_decode_tiled(
            padded, starts, pre, cum_vreg, block_len=L, a_count=a,
            interpret=True, chains=c))
        np.testing.assert_array_equal(got, base)


def test_chains_per_group_tables():
    """Adaptive mode: per-group tables must follow their chains."""
    from range_coder_rust_tpu.kernels.rans_decode import rans_decode_tiled
    import jax.numpy as jnp

    from range_coder_rust_tpu.kernels.vreg import prep_cum_vreg_batch

    g, L, a, NG = 128, 64, 64, 4
    rng = np.random.default_rng(9)
    # deliberately DIFFERENT distributions per group: a shared-table
    # mixup across chains would corrupt the round trip
    data = np.stack([
        rng.integers(0, 8, size=(g, L)),
        rng.integers(8, 64, size=(g, L)),
        rng.integers(0, 64, size=(g, L)),
        rng.integers(30, 34, size=(g, L)),
    ]).astype(np.int32)
    tables = [table_from_data_pow2(data[i], a, 16) for i in range(NG)]
    payloads = rans_codec.encode_groups(
        data.reshape(NG * g, L), tables, L, 0, g)

    parsed = [rans_codec._parse_payload(p, L, g) for p in payloads]
    sizes = np.stack([s for s, _, _ in parsed])
    region = b"".join(bytes(r) for _, _, r in parsed)
    rows_np, ridx, starts, rpad = rans_codec._stage_stream_windows(
        sizes, region, g)
    pre = jnp.asarray(rans_codec._states_to_words(
        [p6 for _, p6, _ in parsed], g))
    cums = np.concatenate(
        [np.zeros((NG, 1), np.uint64),
         np.cumsum(np.stack([t.c for t in tables]), axis=1)],
        axis=1).astype(np.uint32)
    cum_vreg = jnp.asarray(prep_cum_vreg_batch(cums))
    padded = jnp.take(jnp.asarray(rows_np), jnp.asarray(ridx),
                      axis=0).reshape(NG, sizes.shape[1], rpad, 128)

    for c in (1, 2, 4):
        got = np.asarray(rans_decode_tiled(
            padded, jnp.asarray(starts), pre, cum_vreg, block_len=L,
            a_count=a, interpret=True, chains=c))
        np.testing.assert_array_equal(
            got.reshape(NG * g, L), data.reshape(NG * g, L))


def test_pick_chains_divisor_and_budget():
    assert rans_codec._pick_chains(1, 16, 272, 32) == 1
    assert rans_codec._pick_chains(8, 16, 272, 32) == 8
    assert rans_codec._pick_chains(6, 16, 272, 32) == 2
    assert rans_codec._pick_chains(7, 16, 272, 32) == 1
    # huge windows blow the VMEM budget -> fewer chains
    assert rans_codec._pick_chains(8, 16, 40000, 64) == 1
