"""The Pallas encode kernel must reproduce blocks.encode_scan exactly."""

import jax.numpy as jnp
import numpy as np
import pytest

from range_coder_rust_tpu.blocks import encode_scan
from range_coder_rust_tpu.kernels.decode_pallas import prep_cum_vreg
from range_coder_rust_tpu.kernels.encode_pallas import (
    emissions_to_lane_major,
    encode_tiles,
    symbols_to_step_major,
)
from range_coder_rust_tpu.models.table import table_from_data_pow2


@pytest.mark.parametrize("L,k,alphabet,ng", [(64, 12, 64, 1), (128, 16, 256, 2)])
def test_encode_tiles_matches_scan(L, k, alphabet, ng):
    rng = np.random.default_rng(11)
    B = 1024 * ng
    data = rng.integers(0, alphabet, size=(B, L)).astype(np.int32)
    t = table_from_data_pow2(data, alphabet, k)
    c = jnp.asarray(t.c)
    cum = jnp.asarray(t.cum)

    ref = encode_scan(jnp.asarray(data), c, cum, k=k)

    sym_t = symbols_to_step_major(jnp.asarray(data))
    outs = encode_tiles(
        sym_t, jnp.asarray(prep_cum_vreg(t.cum)), k=k, block_len=L,
        interpret=True,
    )
    got = emissions_to_lane_major(*outs)

    names = ["ehi", "elo", "en", "pos", "lengths"]
    for name, a, b in zip(names, got, ref):
        np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b), err_msg=name
        )


def test_multi_tile_state_carry():
    # block_len spanning >1 grid tile exercises the VMEM state carry
    from range_coder_rust_tpu.kernels.encode_pallas import TILE_STEPS

    L = 2 * TILE_STEPS
    rng = np.random.default_rng(5)
    data = rng.integers(0, 16, size=(1024, L)).astype(np.int32)
    t = table_from_data_pow2(data, 16, 10)
    ref = encode_scan(jnp.asarray(data), jnp.asarray(t.c), jnp.asarray(t.cum), k=10)
    sym_t = symbols_to_step_major(jnp.asarray(data))
    outs = encode_tiles(
        sym_t, jnp.asarray(prep_cum_vreg(t.cum)), k=10, block_len=L,
        interpret=True,
    )
    got = emissions_to_lane_major(*outs)
    for a, b in zip(got, ref):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
