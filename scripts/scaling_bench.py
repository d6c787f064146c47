"""Weak-scaling curve on the virtual CPU mesh (BASELINE config 4 stand-in).

Real multi-chip hardware is unavailable here, so this measures the SPMD
path on N virtual CPU devices (1 -> 2 -> 4 -> 8), fixed per-device blocks.
The host has few physical cores, so raw time is NOT a hardware scaling
number; the meaningful quantities are

* ``overhead_vs_unsharded``: time of the N-device sharded program vs the
  SAME total work on one device — the cost XLA's partitioning adds
  (collectives, per-shard program overhead).  Near 1.0 = the sharded
  program is as efficient as the unsharded one, i.e. on real chips (where
  each shard has its own compute) weak scaling is communication-free.
* the communication structure: the hot loop has NO collectives by design
  (parallel/dist.py) — partitioning is along the independent block axis.

Writes SCALING_r03.json.  Usage: python scripts/scaling_bench.py
"""

from __future__ import annotations

import json
import os
import sys
import time

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from range_coder_rust_tpu.models.table import table_from_data_pow2
from range_coder_rust_tpu.parallel.dist import default_mesh, make_sharded_codec


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def bench_n(n_dev: int, blocks_per_dev: int, L: int, k: int, reps: int = 3):
    devs = jax.devices()[:n_dev]
    mesh = default_mesh(devs)
    B = blocks_per_dev * n_dev
    rng = np.random.default_rng(42)
    ranks = np.arange(1, 257)
    p = 1.0 / ranks**1.2
    p /= p.sum()
    data = rng.choice(256, size=(B, L), p=p).astype(np.int32)
    t = table_from_data_pow2(data, 256, k)
    cap = -(-(3 * L + 8) // 4) * 4
    enc, dec = make_sharded_codec(mesh, k=k, block_len=L, capacity=cap)
    c, cum = jnp.asarray(t.c), jnp.asarray(t.cum)
    syms = jnp.asarray(data)

    code, lengths = enc(syms, c, cum)
    out = dec(code, c, cum)
    jax.block_until_ready((code, lengths, out))
    assert np.array_equal(np.asarray(out), data), "sharded round trip failed"

    best = None
    for _ in range(reps):
        t0 = time.time()
        code, lengths = enc(syms, c, cum)
        out = dec(code, c, cum)
        jax.block_until_ready((code, lengths, out))
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    return best, B * L


def main():
    L = int(os.environ.get("RC_SCALE_L", "512"))
    k = 16
    bpd = int(os.environ.get("RC_SCALE_BLOCKS", "128"))
    results = {}
    # weak scaling: per-device work fixed
    for n in (1, 2, 4, 8):
        dt, n_sym = bench_n(n, bpd, L, k)
        results[n] = {"time_s": round(dt, 4), "symbols": n_sym,
                      "sym_per_s": round(n_sym / dt)}
        log(f"{n} dev: {dt*1e3:.1f} ms for {n_sym} syms (weak)")
    # same TOTAL work on 1 device vs 8 devices: partitioning overhead
    dt1, n_sym = bench_n(1, bpd * 8, L, k)
    dt8 = results[8]["time_s"]
    overhead = dt8 / dt1
    log(f"8-dev sharded vs 1-dev unsharded, same work: {overhead:.3f}x")
    out = {
        "metric": "weak-scaling (virtual 8-device CPU mesh)",
        "weak_scaling": results,
        "overhead_vs_unsharded_same_work": round(overhead, 4),
        "note": ("virtual devices share this host's cores; on real chips "
                 "the block axis is embarrassingly parallel (no hot-loop "
                 "collectives), so overhead_vs_unsharded ~ 1.0 is the "
                 "scaling-relevant result"),
        "block_len": L,
        "blocks_per_device": bpd,
    }
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "SCALING_r03.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
