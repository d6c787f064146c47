"""Smoke + timing for the rans16 Pallas kernels on the real chip.

Encodes with the NumPy reference (until the encode kernel lands), decodes
with the Mosaic-compiled kernel, checks the round trip, times it with
sync-amortized reps.  Usage: python scripts/smoke_rans_tpu.py [MB] [L]
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


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    mb = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    L = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    G = rans.GROUP_LANES
    n = (mb << 20) // (G * L) * (G * L)
    NG = n // (G * L)
    assert NG >= 1, "corpus too small for one group"

    rng = np.random.default_rng(7)
    ranks = np.arange(1, 257)
    probs = 1.0 / ranks**1.2
    probs /= probs.sum()
    data = rng.choice(256, size=n, p=probs).astype(np.int32).reshape(NG, G, L)
    t = table_from_data_pow2(data, 256, 16)
    dev = jax.devices()[0]
    log(f"device: {dev}; corpus {n >> 20} MB, {NG} groups x {G} lanes x {L}")

    t0 = time.time()
    streams = []
    for g in range(NG):
        states, regions, counts = rans.encode_lanes(data[g], t.c, t.cum)
        streams.append(rans.build_group_stream(states, regions, counts))
    total = sum(len(s) for s in streams)
    log(f"numpy reference encode: {time.time()-t0:.1f}s, "
        f"{8*total/n:.4f} bits/sym")

    rows = max((len(s) + 511) // 512 for s in streams) + 18
    words = jax.device_put(jnp.asarray(
        np.stack([stream_bytes_to_words(s, rows) for s in streams])), dev)
    cum_vreg = jax.device_put(jnp.asarray(prep_cum_vreg(t.cum)), dev)

    t0 = time.time()
    out = rans_decode_words(words, cum_vreg, block_len=L, a_count=256)
    jax.block_until_ready(out)
    log(f"rans decode compile+first run: {time.time()-t0:.2f}s")
    ok = np.array_equal(np.asarray(out), data)
    log(f"round trip: {'OK' if ok else 'FAIL'}")
    if not ok:
        sys.exit(1)

    # encode kernel: verify byte-exactness vs the numpy spec on hardware
    cap_hw = int(-(-(1.5 * total / NG / 2 + 4096) // 1024) * 1024)
    sym_t = symbols_to_step_major(jnp.asarray(data.reshape(NG * G, L)))
    t0 = time.time()
    pre, exp, cur = rans_encode_tiles(
        sym_t, cum_vreg, block_len=L, a_count=256, cap_hw=cap_hw)
    packed = np.asarray(pack_expanded(exp))
    pre_np, cur_np = np.asarray(pre), np.asarray(cur)
    log(f"rans encode compile+first run: {time.time()-t0:.2f}s (cap_hw={cap_hw})")
    enc_ok = True
    for g in range(NG):
        c = int(cur_np[g, 0])
        assert c >= 0, "capacity overflow"
        got = (pre_np[g].reshape(-1).astype("<u4").tobytes()
               + packed[g].reshape(-1).astype("<u4").tobytes()[2*c:2*cap_hw])
        if got != streams[g]:
            enc_ok = False
            log(f"group {g}: encode kernel stream MISMATCH")
    log(f"rans encode == numpy spec: {'OK' if enc_ok else 'FAIL'}")
    if not enc_ok:
        sys.exit(1)

    REPS = 8
    def timed(name, fn):
        jax.block_until_ready(fn())
        best = None
        for _ in range(2):
            t0 = time.time()
            outs = [fn() for _ in range(REPS)]
            jax.block_until_ready(outs)
            dt = (time.time() - t0) / REPS
            best = dt if best is None else min(best, dt)
        log(f"{name}: {best*1e3:.1f} ms  ({n/1e9/best:.3f} GB/s)")

    timed("rans_decode", lambda: rans_decode_words(
        words, cum_vreg, block_len=L, a_count=256))
    timed("rans_encode", lambda: rans_encode_tiles(
        sym_t, cum_vreg, block_len=L, a_count=256, cap_hw=cap_hw))
    timed("rans_encode_e2e", lambda: pack_expanded(rans_encode_tiles(
        symbols_to_step_major(jnp.asarray(data.reshape(NG * G, L))),
        cum_vreg, block_len=L, a_count=256, cap_hw=cap_hw)[1]))


if __name__ == "__main__":
    main()
