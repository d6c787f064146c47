"""The rans16 Pallas decode kernel must invert the reference encoder."""

import jax.numpy as jnp
import numpy as np
import pytest

from range_coder_rust_tpu import rans
from range_coder_rust_tpu.kernels.decode_pallas import prep_cum_vreg
from range_coder_rust_tpu.kernels.rans_decode import (
    rans_decode_words,
    stream_bytes_to_words,
)
from range_coder_rust_tpu.models.table import table_from_data_pow2


def _zipf(n, a=256, seed=3, alpha=1.2):
    rng = np.random.default_rng(seed)
    ranks = np.arange(1, a + 1)
    p = 1.0 / ranks**alpha
    p /= p.sum()
    return rng.choice(a, size=n, p=p).astype(np.int32)


def _streams_to_words(streams, slack_rows=18):
    rows = max((len(s) + 511) // 512 for s in streams) + slack_rows
    return jnp.asarray(
        np.stack([stream_bytes_to_words(s, rows) for s in streams])
    )


@pytest.mark.parametrize("NG,L,a,alpha", [(1, 64, 256, 1.2), (2, 128, 77, 0.4)])
def test_rans_decode_kernel(NG, L, a, alpha):
    G = rans.GROUP_LANES
    data = _zipf(NG * G * L, a=a, seed=NG + L, alpha=alpha).reshape(NG, G, L)
    t = table_from_data_pow2(data, a, 16)

    streams = []
    for g in range(NG):
        states, regions, counts = rans.encode_lanes(data[g], t.c, t.cum)
        streams.append(rans.build_group_stream(states, regions, counts))

    words = _streams_to_words(streams)
    out = rans_decode_words(
        words, jnp.asarray(prep_cum_vreg(t.cum)),
        block_len=L, a_count=a, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(out), data)


def test_rans_decode_kernel_multi_tile():
    # L spanning several grid tiles exercises the state/cursor carry
    from range_coder_rust_tpu.kernels.rans_decode import TILE_STEPS

    G = rans.GROUP_LANES
    L = 2 * TILE_STEPS
    data = _zipf(G * L, a=200, seed=9).reshape(1, G, L)
    t = table_from_data_pow2(data, 200, 16)
    states, regions, counts = rans.encode_lanes(data[0], t.c, t.cum)
    stream = rans.build_group_stream(states, regions, counts)
    words = _streams_to_words([stream])
    out = rans_decode_words(
        words, jnp.asarray(prep_cum_vreg(t.cum)),
        block_len=L, a_count=200, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(out), data)
