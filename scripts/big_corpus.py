""">= 4 GB chunked-container round trip on the real chip (VERDICT r4
item 4: BASELINE config 4 had no enabler — the single encode call capped
at 2^31 symbols).  Exercises rans_codec._encode_chunked end-to-end
through api.encode/api.decode: slab-appended groups, one container, one
decode, byte equality.

    python scripts/big_corpus.py [GB]    (default 4)

Writes BIGCORPUS_r05.json.  Wall time is tunnel-dominated (~2x corpus
over a 30-90 MB/s link); the JSON records the in-run tunnel accounting
so the number is interpretable.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

t0 = time.time()


def log(msg):
    print(f"[{time.time() - t0:7.1f}s] {msg}", flush=True)


def main():
    gb = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    import numpy as np

    from range_coder_rust_tpu import api, rans_codec

    n = gb << 30
    assert n >= (1 << 31), "below the chunked threshold; use bench.py"
    log(f"device {jax.devices()[0]}; synthesizing {gb} GB corpus")
    # deterministic Zipf-ish bytes, built in 256 MB blocks to bound the
    # generator's working set
    rng = np.random.default_rng(0xB16)
    ranks = np.arange(1, 257)
    p = 1.0 / ranks**1.2
    p /= p.sum()
    data = np.empty(n, np.uint8)
    step = 256 << 20
    for i in range(0, n, step):
        data[i : i + step] = rng.choice(256, size=min(step, n - i), p=p)
    log("corpus built")

    cfg = api.CodecConfig(k=16, block_len=32768, profile="rans16",
                          with_checksums=False)  # CRC of 2.6 GB costs ~6 s
    rans_codec.start_transfer_log()
    t1 = time.time()
    blob = api.encode(data, alphabet=256, config=cfg)
    enc_s = time.time() - t1
    enc_log = rans_codec.stop_transfer_log()
    log(f"encoded: {len(blob)} B ({8 * len(blob) / n:.4f} bits/sym) "
        f"in {enc_s:.0f}s")

    rans_codec.start_transfer_log()
    t1 = time.time()
    out = api.decode(blob)
    dec_s = time.time() - t1
    dec_log = rans_codec.stop_transfer_log()
    log(f"decoded in {dec_s:.0f}s; verifying")
    ok = np.array_equal(out.astype(np.uint8), data)
    log(f"round trip {'OK' if ok else 'FAILED'}")

    def act(recs, d):
        iv = sorted((a, b) for dd, a, b, _ in recs if dd == d)
        tot, ca, cb = 0.0, None, None
        for a, b in iv:
            if cb is None or a > cb:
                tot += (cb - ca) if cb else 0.0
                ca, cb = a, b
            else:
                cb = max(cb, b)
        return tot + ((cb - ca) if cb else 0.0)

    rec = {
        "metric": ">=4GB chunked container round trip",
        "ok": bool(ok),
        "corpus_gb": gb,
        "container_bytes": len(blob),
        "bits_per_symbol": round(8 * len(blob) / n, 4),
        "n_slabs": -(-n // rans_codec._SLAB_SYMBOLS),
        "encode_wall_s": round(enc_s, 1),
        "decode_wall_s": round(dec_s, 1),
        "encode_tunnel_active_s": round(act(enc_log, "h2d")
                                        + act(enc_log, "d2h"), 1),
        "decode_tunnel_active_s": round(act(dec_log, "h2d")
                                        + act(dec_log, "d2h"), 1),
        "device": str(jax.devices()[0]),
    }
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BIGCORPUS_r05.json")
    with open(path, "w") as f:
        json.dump(rec, f, indent=1)
    print(json.dumps(rec))
    if not ok:
        sys.exit(1)


if __name__ == "__main__":
    main()
