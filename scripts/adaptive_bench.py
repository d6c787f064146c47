"""Adaptive (per-block tables) bench on a mixed corpus — BASELINE config 3.

Corpus: concatenated segments with distinct distributions (text-like Zipf,
near-uniform binary, skewed runs), where per-block tables beat any shared
table.  Times the device two-pass path (adaptive.py) and compares rate
with the shared-table planar path.  Writes ADAPTIVE_r03.json.

Usage: python scripts/adaptive_bench.py   (env: RC_ADAPT_MB, default 64)
"""

from __future__ import annotations

import json
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
from range_coder_rust_tpu.adaptive import (
    block_tables,
    decode_blocks_adaptive,
    encode_scan_adaptive,
)
from range_coder_rust_tpu.blocks import compact_emissions, default_capacity
from range_coder_rust_tpu.models.table import table_from_data_pow2


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def mixed_corpus(n: int, seed: int = 5) -> np.ndarray:
    """Segments of very different statistics, shuffled at 64 KB scale."""
    rng = np.random.default_rng(seed)
    segs = []
    per = 64 << 10
    kinds = ["zipf", "uniform", "skew", "runs"]
    for i in range(n // per):
        kind = kinds[i % 4]
        if kind == "zipf":
            r = np.arange(1, 257)
            p = 1.0 / r**1.3
            p /= p.sum()
            segs.append(rng.choice(256, size=per, p=p))
        elif kind == "uniform":
            segs.append(rng.integers(0, 256, per))
        elif kind == "skew":
            base = rng.integers(0, 200)
            segs.append((base + rng.geometric(0.3, per)) % 256)
        else:
            vals = rng.integers(0, 256, per // 64)
            segs.append(np.repeat(vals, 64))
    return np.concatenate(segs)[:n].astype(np.int32)


def main():
    mb = int(os.environ.get("RC_ADAPT_MB", "64"))
    k = 12  # per-block tables: smaller k = smaller per-block header
    L = 4096
    reps = int(os.environ.get("RC_ADAPT_REPS", "3"))
    n = mb << 20
    data = mixed_corpus(n).reshape(-1, L)
    B = data.shape[0]
    dev = jax.devices()[0]
    log(f"device: {dev}; {mb} MB mixed corpus, {B} blocks x {L}, k={k}")

    cap = default_capacity(L, k)
    # chunked: the scan intermediates cost ~20 B/sym on device, so a
    # whole 256 MB corpus in one call exceeds HBM — process 32 MB chunks
    rows_per_chunk = (32 << 20) // L
    chunks = [
        jax.device_put(jnp.asarray(data[i : i + rows_per_chunk]), dev)
        for i in range(0, B, rows_per_chunk)
    ]
    jax.block_until_ready(chunks)

    def enc_chunk(syms):
        c, cum = block_tables(syms, alphabet=256, k=k)
        ehi, elo, en, pos, lengths = encode_scan_adaptive(syms, c, cum, k=k)
        code = compact_emissions(ehi, elo, en, pos, capacity=cap)
        return code, lengths, c, cum

    t0 = time.time()
    encoded = [enc_chunk(s) for s in chunks]
    jax.block_until_ready([e[:2] for e in encoded])
    log(f"adaptive encode compile+first: {time.time() - t0:.1f}s "
        f"({len(chunks)} chunks)")
    lengths_np = np.concatenate([np.asarray(e[1]) for e in encoded])
    assert int(lengths_np.max()) <= cap

    t0 = time.time()
    decs = [decode_blocks_adaptive(code, c, cum, k=k, block_len=L)
            for code, _, c, cum in encoded]
    jax.block_until_ready(decs)
    log(f"adaptive decode compile+first: {time.time() - t0:.1f}s")
    got = np.concatenate([np.asarray(d) for d in decs])
    assert np.array_equal(got, data), "adaptive round trip failed"

    enc_best = dec_best = None
    for _ in range(reps):
        t0 = time.time()
        outs = [enc_chunk(s) for s in chunks]
        jax.block_until_ready([o[:2] for o in outs])
        dt = time.time() - t0
        enc_best = dt if enc_best is None else min(enc_best, dt)
        t0 = time.time()
        ds = [decode_blocks_adaptive(code, c, cum, k=k, block_len=L)
              for code, _, c, cum in encoded]
        jax.block_until_ready(ds)
        dt = time.time() - t0
        dec_best = dt if dec_best is None else min(dec_best, dt)

    # --- adaptive rans16 (per-group tables, the fast adaptive mode) -----
    from range_coder_rust_tpu import api

    flat = data.reshape(-1)
    r16 = {}
    for Lr in (64, 256):
        cfg = api.CodecConfig(profile="rans16", block_len=Lr,
                              per_group_tables=True)
        e2e_data = flat.astype(np.uint8)
        blob = api.encode(e2e_data, alphabet=256, config=cfg)  # warm
        t0 = time.time()
        blob = api.encode(e2e_data, alphabet=256, config=cfg)
        enc_s = time.time() - t0
        t0 = time.time()
        out = api.decode(blob)
        dec_s = time.time() - t0
        assert np.array_equal(out, flat), "adaptive rans16 round trip failed"
        r16[Lr] = {
            "bits_per_symbol": round(8 * len(blob) / n, 4),
            "group_kb": Lr,  # 1024 lanes * L symbols = L KB groups
            "e2e_encode_s": round(enc_s, 2),
            "e2e_decode_s": round(dec_s, 2),
        }
        log(f"adaptive rans16 L={Lr} (per-{Lr} KB tables): "
            f"{r16[Lr]['bits_per_symbol']} bits/sym, e2e enc {enc_s:.1f}s "
            f"dec {dec_s:.1f}s (tunnel-transfer bound)")

    # rate: adaptive payloads + per-block table headers vs one shared table
    adaptive_bits = 8 * (int(lengths_np.sum()) + B * (256 * 2 + 8)) / n
    ts = table_from_data_pow2(data, 256, 16)
    p = np.bincount(data.reshape(-1), minlength=256) / n
    nz = ts.c > 0
    shared_bits = float(-(p[nz] * np.log2(
        ts.c[nz].astype(float) / 65536.0)).sum())
    gbps = n / 1e9 / (enc_best + dec_best)
    out = {
        "metric": "adaptive encode+decode GB/s/chip (mixed corpus)",
        "value": round(gbps, 4),
        "encode_gbps": round(n / 1e9 / enc_best, 4),
        "decode_gbps": round(n / 1e9 / dec_best, 4),
        "bits_per_symbol_adaptive": round(adaptive_bits, 4),
        "bits_per_symbol_shared_table_bound": round(shared_bits, 4),
        "adaptive_rans16_per_group": r16,
        "corpus_mb": mb,
        "block_len": L,
        "k": k,
        "device": str(dev),
    }
    log(f"adaptive {gbps:.3f} GB/s; {adaptive_bits:.4f} bits/sym vs shared-"
        f"table entropy bound {shared_bits:.4f}")
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "ADAPTIVE_r03.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
