"""Interleaved-profile layout tests: the JAX permutation pass must exactly
reproduce the from-spec NumPy reference built from per-lane scalar streams,
and deinterleave must invert it."""

import numpy as np

import jax.numpy as jnp

from range_coder_rust_tpu.blocks import default_capacity, encode_scan
from range_coder_rust_tpu.core.encoder import Encoder
from range_coder_rust_tpu.kernels.interleave import (
    deinterleave_to_planar,
    interleave_emissions,
    interleaved_stream_numpy,
)
from range_coder_rust_tpu.models.freq_table import FreqTable
from range_coder_rust_tpu.models.table import table_from_data_pow2

RNG = np.random.default_rng(123)


def build_group(G, L, k, alphabet=16):
    """Encode G segments with the device scan; return everything the
    interleave needs plus scalar per-lane streams as ground truth."""
    data = RNG.integers(0, alphabet, size=(G, L))
    table = table_from_data_pow2(data, alphabet, k)
    c = jnp.asarray(table.c)
    cum = jnp.asarray(table.cum)
    ehi, elo, en, pos, lengths = encode_scan(jnp.asarray(data), c, cum, k=k)
    cap = default_capacity(L, k)
    from range_coder_rust_tpu.blocks import compact_emissions

    planar = np.asarray(compact_emissions(ehi, elo, en, pos, capacity=cap))
    # scalar ground-truth streams
    ft = FreqTable.from_counts(table.c)
    lane_streams = []
    for g in range(G):
        enc = Encoder()
        for s in data[g]:
            enc.encode(ft, int(s))
        lane_streams.append(enc.finish())
    for g in range(G):
        assert planar[g, : len(lane_streams[g])].tobytes() == lane_streams[g]
    return data, table, planar, np.asarray(en), np.asarray(pos), np.asarray(lengths), lane_streams, cap


def test_interleave_matches_spec_reference():
    G, L, k = 8, 40, 10
    data, table, planar, en, pos, lengths, lane_streams, cap = build_group(G, L, k)
    want = interleaved_stream_numpy(lane_streams, en)

    sc = G * cap
    streams, glens = interleave_emissions(
        jnp.asarray(planar[None]), jnp.asarray(en[None]), jnp.asarray(pos[None]),
        capacity=sc,
    )
    got = np.asarray(streams)[0]
    glen = int(np.asarray(glens)[0])
    assert glen == len(want) == int(lengths.sum())
    assert got[:glen].tobytes() == want


def test_interleave_multi_group():
    G, L, k = 4, 32, 8
    NG = 3
    planars, ens, poss, wants = [], [], [], []
    cap = None
    for _ in range(NG):
        _, _, planar, en, pos, lengths, lane_streams, cap = build_group(G, L, k)
        planars.append(planar)
        ens.append(en)
        poss.append(pos)
        wants.append(interleaved_stream_numpy(lane_streams, en))
    sc = G * cap
    streams, glens = interleave_emissions(
        jnp.asarray(np.stack(planars)), jnp.asarray(np.stack(ens)),
        jnp.asarray(np.stack(poss)), capacity=sc,
    )
    for i in range(NG):
        assert np.asarray(streams)[i][: int(np.asarray(glens)[i])].tobytes() == wants[i]


def test_deinterleave_inverts():
    G, L, k = 8, 40, 10
    _, _, planar, en, pos, lengths, lane_streams, cap = build_group(G, L, k)
    sc = G * cap
    streams, glens = interleave_emissions(
        jnp.asarray(planar[None]), jnp.asarray(en[None]), jnp.asarray(pos[None]),
        capacity=sc,
    )
    back = deinterleave_to_planar(np.asarray(streams)[0], en, cap)
    for g in range(G):
        ln = int(lengths[g])
        assert back[g, :ln].tobytes() == planar[g, :ln].tobytes()
