"""Smoke + timing for the interleaved-profile Pallas decode on the real chip.

Encodes a corpus with the planar scan, permutes to interleaved group
streams, then runs the Mosaic-compiled decode kernel (interpret=False) and
checks the round trip. Prints per-stage timings.

Usage: python scripts/smoke_pallas_tpu.py [MB] [L]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
import jax

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from range_coder_rust_tpu.blocks import default_capacity, encode_scan, compact_emissions
from range_coder_rust_tpu.kernels.decode_pallas import (
    decode_words,
    prep_cum_vreg,
)
from range_coder_rust_tpu.kernels.encode_pallas import (
    emissions_to_lane_major,
    encode_tiles,
    symbols_to_step_major,
)
from range_coder_rust_tpu.kernels.interleave import (
    GROUP_LANES,
    interleave_emissions_words,
)
from range_coder_rust_tpu.models.table import table_from_data_pow2


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    mb = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    L = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    k = 16
    n = mb << 20
    if n % L:
        n = (n // L) * L  # trim so the corpus reshapes into whole blocks
    B = n // L
    G = GROUP_LANES
    assert B % G == 0, f"block count {B} not divisible by group size {G}"
    NG = B // G

    rng = np.random.default_rng(7)
    ranks = np.arange(1, 257)
    probs = 1.0 / ranks**1.2
    probs /= probs.sum()
    data = rng.choice(256, size=n, p=probs).astype(np.int32).reshape(B, L)

    t = table_from_data_pow2(data, 256, k)
    dev = jax.devices()[0]
    log(f"device: {dev}; corpus {mb} MB, {B} blocks x {L}, {NG} groups")

    c = jax.device_put(jnp.asarray(t.c), dev)
    cum = jax.device_put(jnp.asarray(t.cum), dev)
    syms = jax.device_put(jnp.asarray(data), dev)
    cap = default_capacity(L, k)

    # encode (planar scan + compaction)
    t0 = time.time()
    ehi, elo, en, pos, lengths = encode_scan(syms, c, cum, k=k)
    assert int(np.asarray(lengths).max()) <= cap, (
        "block overflowed capacity — raise capacity (api.py doubles it on "
        "overflow; this harness does not)"
    )
    planar = compact_emissions(ehi, elo, en, pos, capacity=cap)
    jax.block_until_ready(planar)
    log(f"encode compile+run: {time.time() - t0:.2f}s")

    # interleave: group and permute.  SC must cover max group length,
    # multiple of 512, plus 16K window slack for the kernel's reads.
    t0 = time.time()
    en_g = en.reshape(NG, G, L + 1)
    pos_g = pos.reshape(NG, G, L + 1)
    planar_g = planar.reshape(NG, G, cap)
    glen_max = int(np.asarray(lengths.reshape(NG, G).sum(axis=1)).max())
    SC = -(-(glen_max + 16 * 1024 + 512) // 512) * 512
    words, glens = interleave_emissions_words(planar_g, en_g, pos_g, capacity=SC)
    jax.block_until_ready(words)
    log(f"interleave compile+run: {time.time() - t0:.2f}s  SC={SC}")

    cum_vreg = jax.device_put(jnp.asarray(prep_cum_vreg(np.asarray(t.cum))), dev)

    # pallas encode kernel: verify it reproduces the XLA scan on hardware
    t0 = time.time()
    sym_t = symbols_to_step_major(syms)
    outs = encode_tiles(sym_t, cum_vreg, k=k, block_len=L)
    got = emissions_to_lane_major(*outs)
    jax.block_until_ready(got)
    log(f"pallas encode compile+first run: {time.time() - t0:.2f}s")
    for name, a, b in zip(
        ["ehi", "elo", "en", "pos", "lengths"], got, (ehi, elo, en, pos, lengths)
    ):
        assert np.array_equal(np.asarray(a), np.asarray(b)), f"{name} mismatch"
    log("pallas encode == encode_scan: OK")

    # pallas decode, compiled
    t0 = time.time()
    out = decode_words(words, cum_vreg, k=k, block_len=L, a_count=256)
    jax.block_until_ready(out)
    log(f"pallas decode compile+first run: {time.time() - t0:.2f}s")

    ok = np.array_equal(np.asarray(out).reshape(B, L), data)
    log(f"round trip: {'OK' if ok else 'FAIL'}")
    if not ok:
        bad = np.flatnonzero(
            (np.asarray(out).reshape(B, L) != data).any(axis=1)
        )
        log(f"bad blocks: {bad[:10]} / {bad.size}")
        sys.exit(1)

    # timed reps.  Axon quirk: after any device->host fetch, every
    # block_until_ready sync costs ~25 ms; dispatches themselves pipeline at
    # real speed.  So: issue REPS dispatches back-to-back, sync ONCE, and
    # measure a second window to subtract the first window's sync tax.
    REPS = 8
    for name, fn in [
        ("encode_scan", lambda: encode_scan(syms, c, cum, k=k)),
        ("pallas_encode", lambda: encode_tiles(
            sym_t, cum_vreg, k=k, block_len=L)),
        ("pallas_encode_e2e", lambda: emissions_to_lane_major(*encode_tiles(
            symbols_to_step_major(syms), cum_vreg, k=k, block_len=L))),
        ("compact", lambda: compact_emissions(
            ehi, elo, en, pos, capacity=cap)),
        ("interleave", lambda: interleave_emissions_words(
            planar_g, en_g, pos_g, capacity=SC)),
        ("pallas_decode", lambda: decode_words(
            words, cum_vreg, k=k, block_len=L, a_count=256)),
    ]:
        jax.block_until_ready(fn())  # drain + sync tax
        best = None
        for _ in range(2):
            t0 = time.time()
            out = [fn() for _ in range(REPS)]
            jax.block_until_ready(out)
            dt = (time.time() - t0) / REPS
            best = dt if best is None else min(best, dt)
        log(f"{name}: {best*1e3:.1f} ms  ({n/1e9/best:.3f} GB/s)")


if __name__ == "__main__":
    main()
