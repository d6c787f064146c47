"""Interleaved-profile Pallas decode kernel, interpret mode (CPU): must
exactly invert the interleaved encoder output."""

import numpy as np

import jax.numpy as jnp

from range_coder_rust_tpu.blocks import (
    compact_emissions,
    default_capacity,
    encode_scan,
)
from range_coder_rust_tpu.kernels.decode_pallas import (
    G,
    prep_cum_vreg,
    decode_interleaved,
)
from range_coder_rust_tpu.kernels.interleave import interleave_emissions
from range_coder_rust_tpu.models.table import table_from_data_pow2

RNG = np.random.default_rng(31)


def interleaved_roundtrip(data, k, alphabet):
    NG = 1
    L = data.shape[1]
    table = table_from_data_pow2(data, alphabet, k)
    c = jnp.asarray(table.c)
    cum = jnp.asarray(table.cum)
    ehi, elo, en, pos, lengths = encode_scan(jnp.asarray(data), c, cum, k=k)
    cap = default_capacity(L, k)
    planar = compact_emissions(ehi, elo, en, pos, capacity=cap)

    glen_est = 8 * G + int(np.asarray(lengths).sum()) - 8 * G
    sc = (8 * G + G * (cap - 8) + 512 + 16384 + 511) // 512 * 512
    streams, glens = interleave_emissions(
        planar.reshape(NG, G, cap),
        en.reshape(NG, G, L + 1),
        pos.reshape(NG, G, L + 1),
        capacity=sc,
    )
    cum_vreg = jnp.asarray(prep_cum_vreg(table.cum))
    out = decode_interleaved(
        streams, cum_vreg, k=k, block_len=L, a_count=alphabet, interpret=True
    )
    return np.asarray(out).reshape(G, L), int(np.asarray(glens)[0]), glen_est


def test_pallas_decode_interpret_small():
    L, k, alphabet = 16, 12, 40
    data = RNG.integers(0, alphabet, size=(G, L))
    out, glen, _ = interleaved_roundtrip(data, k, alphabet)
    assert np.array_equal(out, data)


def test_pallas_decode_interpret_skewed():
    L, k, alphabet = 24, 16, 256
    probs = np.ones(256)
    probs[0] = 4000.0  # heavy skew: long zero-emission runs + bursts
    probs /= probs.sum()
    data = RNG.choice(256, size=(G, L), p=probs)
    out, glen, _ = interleaved_roundtrip(data, k, alphabet)
    assert np.array_equal(out, data)


def test_pallas_decode_interpret_rare_runs():
    """Lanes full of the rarest symbol maximize per-step emission (worst
    case for the region window)."""
    L, k = 12, 16
    counts = np.concatenate([[100000], np.ones(15)]).astype(np.uint64)
    from range_coder_rust_tpu.models.table import build_table_pow2

    table = build_table_pow2(counts, k)
    data = np.full((G, L), 5, np.int64)  # c == 1 symbol everywhere
    c = jnp.asarray(table.c)
    cum = jnp.asarray(table.cum)
    ehi, elo, en, pos, lengths = encode_scan(jnp.asarray(data), c, cum, k=k)
    cap = default_capacity(L, k)
    planar = compact_emissions(ehi, elo, en, pos, capacity=cap)
    sc = (8 * G + G * (cap - 8) + 512 + 16384 + 511) // 512 * 512
    streams, _ = interleave_emissions(
        planar.reshape(1, G, cap), en.reshape(1, G, L + 1), pos.reshape(1, G, L + 1),
        capacity=sc,
    )
    out = decode_interleaved(
        streams, jnp.asarray(prep_cum_vreg(table.cum)),
        k=k, block_len=L, a_count=16, interpret=True,
    )
    assert np.array_equal(np.asarray(out).reshape(G, L), data)
