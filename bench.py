"""Benchmark: encode+decode throughput of the block-parallel TPU coder.

Prints ONE JSON line:
  {"metric": "encode+decode GB/s/chip", "value": N, "unit": "GB/s",
   "vs_baseline": R, ...}

The reference publishes no numbers (BASELINE.md), so the baseline is
measured here: the C++ scalar golden coder (byte-identical semantics to the
Rust crate) timed on a sample of the same corpus on this host's CPU.
``vs_baseline`` is our GB/s divided by the scalar coder's GB/s.

Corpus: deterministic 64 MB Zipf-ish byte stream (config 2 of BASELINE.md).
Round-trip equality and compressed-size-vs-scalar are asserted, not just
timed.  Runs on whatever jax.devices()[0] is — the real TPU chip under the
driver, CPU elsewhere.

Env knobs: RC_BENCH_MB (corpus size, default 64), RC_BENCH_REPS (timed
repetitions, default 3), RC_BENCH_K (table precision, default 16).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def make_corpus(n_bytes: int, seed: int = 0xC0) -> np.ndarray:
    """Zipf-distributed bytes — skewed like real text/binary mixes."""
    rng = np.random.default_rng(seed)
    ranks = np.arange(1, 257)
    probs = 1.0 / ranks**1.2
    probs /= probs.sum()
    return rng.choice(256, size=n_bytes, p=probs).astype(np.int32)


def main() -> None:
    mb = int(os.environ.get("RC_BENCH_MB", "64"))
    reps = int(os.environ.get("RC_BENCH_REPS", "3"))
    k = int(os.environ.get("RC_BENCH_K", "16"))

    # persistent compile cache: the remote TPU compile service has high and
    # variable latency; cached executables make re-runs start in seconds
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    import jax.numpy as jnp

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from range_coder_rust_tpu.blocks import default_capacity, decode_blocks, encode_blocks
    from range_coder_rust_tpu.models.table import table_from_data_pow2
    from range_coder_rust_tpu.native import golden

    dev = jax.devices()[0]
    log(f"device: {dev} platform={dev.platform}")

    L = int(os.environ.get("RC_BENCH_L", "512"))
    n = mb << 20
    B = n // L
    data = make_corpus(n).reshape(B, L)
    log(f"corpus: {mb} MB, {B} blocks x {L} symbols, k={k}")

    t = table_from_data_pow2(data, 256, k)

    # --- scalar baseline FIRST (C++ golden, reference semantics) -----------
    # measured before any device work: the axon tunnel's host threads
    # otherwise contend for the 2 cores and understate the baseline
    sample = data[: max(1, B // 16)].reshape(-1)  # ~4 MB sample
    t0 = time.time()
    ref_code = golden.encode(sample, t.c, t.cum[:-1], 1 << k)
    ref_enc_t = time.time() - t0
    t0 = time.time()
    ref_dec = golden.decode(ref_code, sample.size, t.c, t.cum[:-1], 1 << k)
    ref_dec_t = time.time() - t0
    assert np.array_equal(ref_dec.astype(np.int64), sample.astype(np.int64))
    base_gbps = sample.size / 1e9 / (ref_enc_t + ref_dec_t)
    log(f"scalar C++ baseline: {base_gbps:.3f} GB/s on {sample.size >> 20} MB sample")

    c = jax.device_put(jnp.asarray(t.c), dev)
    cum = jax.device_put(jnp.asarray(t.cum), dev)
    cap = default_capacity(L, k)
    syms = jax.device_put(jnp.asarray(data), dev)


    # --- compile (untimed) -------------------------------------------------
    t0 = time.time()
    code, lengths = encode_blocks(syms, c, cum, k=k, capacity=cap)
    jax.block_until_ready((code, lengths))
    log(f"encode compile+first run: {time.time() - t0:.1f}s")
    t0 = time.time()
    dec = decode_blocks(code, c, cum, k=k, block_len=L)
    jax.block_until_ready(dec)
    log(f"decode compile+first run: {time.time() - t0:.1f}s")

    # --- correctness -------------------------------------------------------
    assert np.array_equal(np.asarray(dec), data), "round trip failed"
    lengths_np = np.asarray(lengths)
    assert int(lengths_np.max()) <= cap, "capacity overflow"
    compressed = int(lengths_np.sum())
    log(f"compressed: {compressed / 1e6:.2f} MB ({8 * compressed / n:.3f} bits/sym)")

    # --- timed reps --------------------------------------------------------
    enc_times, dec_times = [], []
    for _ in range(reps):
        t0 = time.time()
        code, lengths = encode_blocks(syms, c, cum, k=k, capacity=cap)
        jax.block_until_ready((code, lengths))
        enc_times.append(time.time() - t0)
        t0 = time.time()
        dec = decode_blocks(code, c, cum, k=k, block_len=L)
        jax.block_until_ready(dec)
        dec_times.append(time.time() - t0)
    enc_t = min(enc_times)
    dec_t = min(dec_times)
    gbps = n / 1e9 / (enc_t + dec_t)
    log(f"encode {n / 1e9 / enc_t:.3f} GB/s, decode {n / 1e9 / dec_t:.3f} GB/s, "
        f"combined {gbps:.3f} GB/s")

    # compressed-size parity vs scalar reference on the sample
    ref_bits = 8 * len(ref_code) / sample.size
    our_bits = 8 * compressed / n
    log(f"bits/sym: ours {our_bits:.4f} vs scalar {ref_bits:.4f}")

    print(json.dumps({
        "metric": "encode+decode GB/s/chip",
        "value": round(gbps, 4),
        "unit": "GB/s",
        "vs_baseline": round(gbps / base_gbps, 3),
        "encode_gbps": round(n / 1e9 / enc_t, 4),
        "decode_gbps": round(n / 1e9 / dec_t, 4),
        "corpus_mb": mb,
        "bits_per_symbol": round(our_bits, 4),
        "scalar_bits_per_symbol": round(ref_bits, 4),
        "baseline_gbps_scalar_cpp": round(base_gbps, 4),
        "device": str(dev),
    }))


if __name__ == "__main__":
    main()
