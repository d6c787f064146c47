"""The rans16 Pallas encode kernel must be byte-exact vs the NumPy spec."""

import jax.numpy as jnp
import numpy as np
import pytest

from range_coder_rust_tpu import rans
from range_coder_rust_tpu.kernels.decode_pallas import prep_cum_vreg
from range_coder_rust_tpu.kernels.encode_pallas import symbols_to_step_major
from range_coder_rust_tpu.kernels.rans_decode import (
    rans_decode_words,
    stream_bytes_to_words,
)
from range_coder_rust_tpu.kernels.rans_encode import (
    pack_expanded,
    rans_encode_tiles,
)
from range_coder_rust_tpu.models.table import table_from_data_pow2


def _zipf(n, a=256, seed=3, alpha=1.2):
    rng = np.random.default_rng(seed)
    ranks = np.arange(1, a + 1)
    p = 1.0 / ranks**alpha
    p /= p.sum()
    return rng.choice(a, size=n, p=p).astype(np.int32)


def kernel_streams(data, t, cap_hw, interpret=True):
    """Run the encode kernel and assemble per-group stream bytes."""
    NG, G, L = data.shape
    sym_t = symbols_to_step_major(jnp.asarray(data.reshape(NG * G, L)))
    pre, exp, cur = rans_encode_tiles(
        sym_t, jnp.asarray(prep_cum_vreg(t.cum)),
        block_len=L, a_count=t.c.shape[0], cap_hw=cap_hw,
        interpret=interpret,
    )
    packed = np.asarray(pack_expanded(exp))
    pre_np = np.asarray(pre)
    cur_np = np.asarray(cur)
    streams = []
    for g in range(NG):
        c = int(cur_np[g, 0])
        assert c >= 0, "capacity overflow"
        pre_bytes = pre_np[g].reshape(-1).astype("<u4").tobytes()
        body = packed[g].reshape(-1).astype("<u4").tobytes()
        streams.append(pre_bytes + body[2 * c : 2 * cap_hw])
    return streams


@pytest.mark.parametrize("NG,L,a,alpha", [(1, 64, 256, 1.2), (2, 128, 77, 0.4)])
def test_encode_kernel_matches_spec(NG, L, a, alpha):
    G = rans.GROUP_LANES
    data = _zipf(NG * G * L, a=a, seed=NG + L, alpha=alpha).reshape(NG, G, L)
    t = table_from_data_pow2(data, a, 16)
    streams = kernel_streams(data, t, cap_hw=L * 1024)
    for g in range(NG):
        states, regions, counts = rans.encode_lanes(data[g], t.c, t.cum)
        want = rans.build_group_stream(states, regions, counts)
        assert streams[g] == want, f"group {g} stream mismatch"


def test_encode_kernel_roundtrip_device_decode():
    G = rans.GROUP_LANES
    L, a = 128, 256
    data = _zipf(G * L, a=a, seed=5).reshape(1, G, L)
    t = table_from_data_pow2(data, a, 16)
    streams = kernel_streams(data, t, cap_hw=L * 1024)
    rows = (len(streams[0]) + 511) // 512 + 18
    words = jnp.asarray(
        np.stack([stream_bytes_to_words(s, rows) for s in streams])
    )
    out = rans_decode_words(
        words, jnp.asarray(prep_cum_vreg(t.cum)),
        block_len=L, a_count=a, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(out), data)


def test_encode_kernel_overflow_detection():
    G = rans.GROUP_LANES
    L = 64
    # uniform data at k=16 with a=256: ~8 bits/sym, far over a tiny capacity
    rng = np.random.default_rng(0)
    data = rng.integers(0, 256, size=(1, G, L)).astype(np.int32)
    t = table_from_data_pow2(data, 256, 16)
    sym_t = symbols_to_step_major(jnp.asarray(data.reshape(G, L)))
    pre, exp, cur = rans_encode_tiles(
        sym_t, jnp.asarray(prep_cum_vreg(t.cum)),
        block_len=L, a_count=256, cap_hw=1024,  # absurdly small
        interpret=True,
    )
    assert int(np.asarray(cur)[0, 0]) < 0
