"""Real-TPU smoke test for the tiled rans16 kernels (round 3 layout).

Run ON the axon chip (no env overrides):
    python scripts/smoke_rans_tpu.py [MB] [L]

Stages are logged with timestamps so a wedged device is distinguishable
from a slow compile.  Round-trips are asserted, and per-stage device
timings are reported (encode = step-major + kernel + pack/gather fused
dispatches; decode = pad-gather + kernel + finalize).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

t0 = time.time()


def log(msg):
    print(f"[{time.time() - t0:7.1f}s] {msg}", flush=True)


def main():
    mb = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    L = int(sys.argv[2]) if len(sys.argv) > 2 else 4096

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    import numpy as np

    from range_coder_rust_tpu import rans_codec
    from range_coder_rust_tpu.models.table import table_from_data_pow2

    dev = jax.devices()[0]
    n = mb << 20
    G = rans_codec.G
    rows_n = max(G, (n // (G * L)) * G)
    log(f"device {dev}; corpus {mb} MB, {rows_n // G} groups x {G} x {L}")

    rng = np.random.default_rng(0)
    ranks = np.arange(1, 257)
    p = 1.0 / ranks**1.2
    p /= p.sum()
    data = rng.choice(256, size=rows_n * L, p=p).astype(np.int32)
    t = table_from_data_pow2(data, 256, 16)
    rows = data.reshape(rows_n, L)

    log("encode_groups (compile + first run)...")
    t1 = time.time()
    payloads = rans_codec.encode_groups(rows, t, L)
    enc_first = time.time() - t1
    total = sum(len(p) for p in payloads)
    log(f"encode done in {enc_first:.1f}s: {len(payloads)} payloads, "
        f"{total} B, {8 * total / data.size:.4f} bits/sym")

    log("decode_groups (compile + first run)...")
    t1 = time.time()
    out = rans_codec.decode_groups(payloads, t.c, L)
    dec_first = time.time() - t1
    log(f"decode done in {dec_first:.1f}s")
    assert np.array_equal(out, rows), "ROUND TRIP FAILED"
    log("round trip OK")

    log("steady-state (2nd full pass, host+device end to end)...")
    t1 = time.time()
    payloads = rans_codec.encode_groups(rows, t, L)
    enc_t = time.time() - t1
    t1 = time.time()
    out = rans_codec.decode_groups(payloads, t.c, L)
    dec_t = time.time() - t1
    assert np.array_equal(out, rows)
    gb = data.size / 1e9
    log(f"encode {enc_t:.2f}s ({gb / enc_t:.3f} GB/s)  "
        f"decode {dec_t:.2f}s ({gb / dec_t:.3f} GB/s)  "
        f"combined {gb / (enc_t + dec_t):.3f} GB/s (incl transfers)")


if __name__ == "__main__":
    main()
