"""Sharded codec tests on the virtual 8-device CPU mesh: results identical
to the single-device path, blocks actually distributed, scaling smoke."""

import numpy as np

import jax
import jax.numpy as jnp

from range_coder_rust_tpu.blocks import decode_blocks, default_capacity, encode_blocks
from range_coder_rust_tpu.models.table import table_from_data_pow2
from range_coder_rust_tpu.parallel import (
    block_sharding,
    default_mesh,
    make_sharded_codec,
    replicated,
)

RNG = np.random.default_rng(9)


def test_mesh_has_8_devices():
    mesh = default_mesh()
    assert mesh.devices.size == 8


def test_sharded_matches_single_device():
    k, L, B = 12, 256, 16
    data = RNG.integers(0, 64, size=(B, L))
    t = table_from_data_pow2(data, 64, k)
    cap = default_capacity(L, k)
    c, cum = jnp.asarray(t.c), jnp.asarray(t.cum)

    code1, len1 = encode_blocks(jnp.asarray(data), c, cum, k=k, capacity=cap)

    mesh = default_mesh()
    enc, dec = make_sharded_codec(mesh, k=k, block_len=L, capacity=cap)
    syms_sh = jax.device_put(jnp.asarray(data), block_sharding(mesh))
    c_sh = jax.device_put(c, replicated(mesh))
    cum_sh = jax.device_put(cum, replicated(mesh))
    code2, len2 = enc(syms_sh, c_sh, cum_sh)

    assert np.array_equal(np.asarray(code1), np.asarray(code2))
    assert np.array_equal(np.asarray(len1), np.asarray(len2))

    dec2 = dec(code2, c_sh, cum_sh)
    assert np.array_equal(np.asarray(dec2), data)


def test_sharded_outputs_are_distributed():
    k, L, B = 10, 128, 8
    data = RNG.integers(0, 16, size=(B, L))
    t = table_from_data_pow2(data, 16, k)
    cap = default_capacity(L, k)
    mesh = default_mesh()
    enc, _ = make_sharded_codec(mesh, k=k, block_len=L, capacity=cap)
    syms_sh = jax.device_put(jnp.asarray(data), block_sharding(mesh))
    code, lengths = enc(
        syms_sh,
        jax.device_put(jnp.asarray(t.c), replicated(mesh)),
        jax.device_put(jnp.asarray(t.cum), replicated(mesh)),
    )
    # each of the 8 devices holds exactly one block row
    assert len(code.addressable_shards) == 8
    for shard in code.addressable_shards:
        assert shard.data.shape == (1, cap)
    # decode result equals input even through the distributed layout
    dec = decode_blocks(code, jnp.asarray(t.c), jnp.asarray(t.cum), k=k, block_len=L)
    assert np.array_equal(np.asarray(dec), data)
