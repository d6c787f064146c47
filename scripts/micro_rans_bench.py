"""Per-stage device timing for the rans16 encode path on the real chip.

Times, with device-resident inputs and sync-amortized reps:
  step_major   — (B, L) -> (NG, L*8, 128) transpose (jitted)
  encode_tiles — the Pallas kernel
  pack         — halfword-expanded -> LE words
  decode       — the Pallas decode kernel
Usage: python scripts/micro_rans_bench.py [MB] [L]
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
from range_coder_rust_tpu.kernels.rans_decode import rans_decode_words
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

    rng = np.random.default_rng(7)
    ranks = np.arange(1, 257)
    probs = 1.0 / ranks**1.2
    probs /= probs.sum()
    data = rng.choice(256, size=n, p=probs).astype(np.int32).reshape(NG * G, L)
    t = table_from_data_pow2(data, 256, 16)
    dev = jax.devices()[0]
    log(f"device: {dev}; corpus {n >> 20} MB, {NG} groups x {G} lanes x {L}")

    syms = jax.device_put(jnp.asarray(data), dev)
    cum_vreg = jax.device_put(jnp.asarray(prep_cum_vreg(t.cum)), dev)

    ent = -(t.c / 65536.0 * np.log2(np.maximum(t.c, 1) / 65536.0)).sum()
    cap_hw = int(-(-(G * L * ent / 16 * 1.3 + 8192) // 1024) * 1024)

    sm = jax.jit(symbols_to_step_major)

    REPS = 8

    def timed(name, fn):
        jax.block_until_ready(fn())
        best = None
        for _ in range(3):
            t0 = time.time()
            outs = [fn() for _ in range(REPS)]
            jax.block_until_ready(outs)
            dt = (time.time() - t0) / REPS
            best = dt if best is None else min(best, dt)
        log(f"{name:16s}: {best*1e3:8.2f} ms  ({n/1e9/best:7.3f} GB/s)")
        return best

    sym_t = sm(syms)
    jax.block_until_ready(sym_t)
    pre, exp, cur = rans_encode_tiles(
        sym_t, cum_vreg, block_len=L, a_count=256, cap_hw=cap_hw)
    jax.block_until_ready((pre, exp, cur))
    assert int(np.asarray(cur).min()) >= 0, "capacity overflow"
    packed = pack_expanded(exp)
    jax.block_until_ready(packed)

    timed("step_major", lambda: sm(syms))
    timed("encode_tiles", lambda: rans_encode_tiles(
        sym_t, cum_vreg, block_len=L, a_count=256, cap_hw=cap_hw))
    timed("pack", lambda: pack_expanded(exp))

    fused = jax.jit(lambda s: pack_expanded(rans_encode_tiles(
        sm(s), cum_vreg, block_len=L, a_count=256, cap_hw=cap_hw)[1]))
    jax.block_until_ready(fused(syms))
    timed("encode_fused", lambda: fused(syms))

    # decode side: build stream words via the spec once
    states, regions, counts = rans.encode_lanes(
        data[:G], t.c, t.cum)
    from range_coder_rust_tpu.kernels.rans_decode import stream_bytes_to_words
    s0 = rans.build_group_stream(states, regions, counts)
    rows = (len(s0) + 511) // 512 + 18
    rows = -(-rows // 8) * 8
    words = jax.device_put(jnp.asarray(np.stack(
        [stream_bytes_to_words(s0, rows)] * NG)), dev)
    timed("decode", lambda: rans_decode_words(
        words, cum_vreg, block_len=L, a_count=256))


if __name__ == "__main__":
    main()
