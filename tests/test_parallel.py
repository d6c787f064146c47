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


def test_sharded_rans16_matches_single_device():
    """rans16 kernels under shard_map over the 8-device group axis must be
    bit-identical to the single-device kernels (=> byte-identical
    containers); decode must invert them (round-3 verdict item 6)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from range_coder_rust_tpu import rans_codec
    from range_coder_rust_tpu.kernels.rans_encode import barrett_rows
    from range_coder_rust_tpu.kernels.vreg import prep_cum_vreg
    from range_coder_rust_tpu.models.table import table_from_data_pow2
    from range_coder_rust_tpu.parallel import (
        block_sharding, default_mesh, make_sharded_rans16, replicated)

    n_dev = 8
    mesh = default_mesh(jax.devices()[:n_dev])
    from range_coder_rust_tpu import rans
    G, L = rans.GROUP_LANES, 64
    NG = n_dev  # one group per device
    rng = np.random.default_rng(17)
    data = rng.integers(0, 200, size=(NG * G, L)).astype(np.int32)
    t = table_from_data_pow2(data, 256, 16)
    cum_vreg = jnp.asarray(prep_cum_vreg(t.cum))

    enc_aux = jnp.asarray(barrett_rows(t.c))
    enc, dec = make_sharded_rans16(mesh, block_len=L, a_count=256)
    rows_sh = jax.device_put(jnp.asarray(data), block_sharding(mesh))
    cum_sh = jax.device_put(cum_vreg, replicated(mesh))
    aux_sh = jax.device_put(enc_aux, replicated(mesh))
    pre, exp, sizes = enc(rows_sh, cum_sh, aux_sh)

    # bit-parity vs the single-device pipeline
    pre1, exp1, sizes1 = rans_codec._encode_device(
        jnp.asarray(data), cum_vreg, enc_aux, block_len=L, a_count=256,
        interpret=True)
    np.testing.assert_array_equal(np.asarray(sizes), np.asarray(sizes1))
    np.testing.assert_array_equal(np.asarray(pre), np.asarray(pre1))
    np.testing.assert_array_equal(np.asarray(exp), np.asarray(exp1))

    # container byte-parity via the unchanged assembly, then sharded decode
    payloads = rans_codec.encode_groups(data, t, L)
    parsed = [rans_codec._parse_payload(p, L) for p in payloads]
    sizes_np = np.stack([s for s, _, _ in parsed])
    region = b"".join(bytes(r) for _, _, r in parsed)
    flat_sz = sizes_np.reshape(-1)
    H = np.concatenate([[0], np.cumsum(flat_sz)])[:-1]
    a_row = (H >> 8).astype(np.int64)
    b_row = (H + flat_sz + 255) >> 8
    rpad = rans_codec._rpad_for(int((b_row - a_row).max(initial=1)))
    R = -(-max(len(region) // 512, 1) // 8) * 8
    ridx = np.minimum(a_row[:, None] + np.arange(rpad)[None, :],
                      max(R - 1, 0)).astype(np.int32).reshape(-1)
    buf = np.zeros(R * 512, np.uint8)
    buf[: len(region)] = np.frombuffer(region, np.uint8)
    padded = np.asarray(rans_codec._pad_stream(
        jnp.asarray(buf.view("<u4").reshape(R, 128)), jnp.asarray(ridx),
        ng=NG, nt=sizes_np.shape[1], rpad=rpad))
    starts = (H & 255).astype(np.int32).reshape(NG, -1)
    pre8 = np.zeros((NG, G, 8), np.uint8)
    for g, (_, p6, _) in enumerate(parsed):
        pre8[g, :, :6] = np.frombuffer(p6, np.uint8).reshape(G, 6)
    x = pre8.reshape(NG, G * 8).view("<u8")
    words = np.empty((NG, 2 * G), np.uint32)
    words[:, 0::2] = (x & 0xFFFFFFFF).astype(np.uint32)
    words[:, 1::2] = (x >> 32).astype(np.uint32)

    sh = block_sharding(mesh)
    out = dec(
        jax.device_put(jnp.asarray(padded), sh),
        jax.device_put(jnp.asarray(starts), sh),
        jax.device_put(jnp.asarray(words.reshape(NG, 2 * G // 128, 128)), sh),
        cum_sh,
    )
    np.testing.assert_array_equal(
        np.asarray(out).reshape(NG * G, L), data)


def test_sharded_rans16_per_group_tables():
    """Adaptive rans16 sharded: each device carries its own group AND its
    own table (tables ride the group axis); outputs bit-match the
    single-device per-group pipeline."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from range_coder_rust_tpu import rans_codec
    from range_coder_rust_tpu.kernels.rans_encode import barrett_rows
    from range_coder_rust_tpu.kernels.vreg import prep_cum_vreg
    from range_coder_rust_tpu.models.table import table_from_data_pow2
    from range_coder_rust_tpu.parallel import (
        block_sharding, default_mesh, make_sharded_rans16)

    n_dev = 8
    mesh = default_mesh(jax.devices()[:n_dev])
    from range_coder_rust_tpu import rans
    G, L = rans.GROUP_LANES, 64
    NG = n_dev
    rng = np.random.default_rng(23)
    # a different distribution per group
    data = np.concatenate([
        ((g * 13) + rng.integers(0, 40, G * L)) % 256
        for g in range(NG)
    ]).astype(np.int32).reshape(NG * G, L)
    tables = [table_from_data_pow2(data[g * G:(g + 1) * G], 256, 16)
              for g in range(NG)]
    cum_vregs = jnp.asarray(np.stack([prep_cum_vreg(t.cum) for t in tables]))
    eauxs = jnp.asarray(np.stack([barrett_rows(t.c) for t in tables]))

    enc, _ = make_sharded_rans16(
        mesh, block_len=L, a_count=256, per_group_tables=True)
    sh = block_sharding(mesh)
    pre, exp, sizes = enc(
        jax.device_put(jnp.asarray(data), sh),
        jax.device_put(cum_vregs, sh),
        jax.device_put(eauxs, sh),
    )
    pre1, exp1, sizes1 = rans_codec._encode_device(
        jnp.asarray(data), cum_vregs, eauxs, block_len=L, a_count=256,
        interpret=True)
    np.testing.assert_array_equal(np.asarray(sizes), np.asarray(sizes1))
    np.testing.assert_array_equal(np.asarray(exp), np.asarray(exp1))

    # full adaptive container path round-trips the same data
    blob = rans_codec.encode(
        data.reshape(-1), alphabet=256, block_len=L, per_group_tables=True)
    from range_coder_rust_tpu import format as fmt
    np.testing.assert_array_equal(
        rans_codec.decode(fmt.unpack(blob)), data.reshape(-1))
