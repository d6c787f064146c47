"""Many-slice random-access read benchmark (real TPU).

    python scripts/slice_bench.py [MB] [N_SLICES]

Measures `api.decode_range` on many small random reads from one flagship
rans16 container carrying lane-state sync points (CodecConfig(sync_tiles=16)
— SURVEY.md §5 checkpoint/resume; the reference has no random access at
all, the caller re-decodes from byte 0: /root/reference/src/decoder.rs:14-54).
Each slice is verified against the source corpus.

Reads land at uniformly random offsets, so successive slices hit different
(sync-window, tile-span) geometries: the first few pay a one-time compile
each (cached on disk thereafter); the steady state is the warm number.
Within a call, the payload is parsed once and the table prep reused
(advisor r4 — previously up to 3 parses of a multi-MB payload per read).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

t0 = time.time()


def log(msg):
    print(f"[{time.time() - t0:7.1f}s] {msg}", file=sys.stderr, flush=True)


def main():
    mb = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    n_slices = int(sys.argv[2]) if len(sys.argv) > 2 else 24
    slice_sym = int(os.environ.get("RC_SLICE_SYM", "1024"))

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    import numpy as np

    from range_coder_rust_tpu import api

    dev = jax.devices()[0]
    log(f"device: {dev}")

    n = mb << 20
    rng = np.random.default_rng(0xC0)
    ranks = np.arange(1, 257)
    probs = 1.0 / ranks**1.2
    probs /= probs.sum()
    data = rng.choice(256, size=n, p=probs).astype(np.int32)

    cfg = api.CodecConfig(profile="rans16", sync_tiles=16)
    t_enc = time.time()
    blob = api.encode(data, config=cfg)
    t_enc = time.time() - t_enc
    log(f"container: {len(blob)/2**20:.1f} MB from {mb} MB "
        f"(encode {t_enc:.1f}s incl. tunnel)")

    starts = rng.integers(0, n - slice_sym, size=n_slices)
    walls = []
    for i, s in enumerate(starts):
        t1 = time.time()
        out = api.decode_range(blob, int(s), slice_sym)
        walls.append(time.time() - t1)
        assert np.array_equal(out, data[s : s + slice_sym]), f"slice {i}"
        log(f"slice {i:3d} @ {int(s):>12,}: {walls[-1]*1e3:7.1f} ms")

    warm = sorted(walls[4:])  # drop the compile-heavy head
    med = warm[len(warm) // 2]
    rec = {
        "metric": "random-access 1KB slice reads (rans16, sync_tiles=16)",
        "corpus_mb": mb,
        "slice_symbols": slice_sym,
        "n_slices": n_slices,
        "container_mb": round(len(blob) / 2**20, 1),
        "cold_first_slice_s": round(walls[0], 3),
        "warm_median_s": round(med, 3),
        "warm_min_s": round(min(warm), 3),
        "warm_slices_per_s": round(1.0 / med, 2),
        "device": str(dev),
    }
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
