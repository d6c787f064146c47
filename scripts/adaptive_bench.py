"""Adaptive-coding bench on a mixed corpus (BASELINE config: adaptive).

The ADAPTIVE rans16 mode (CodecConfig(per_group_tables=True)) is the
product path: one order-0 table per group of ``GROUP_LANES * L`` symbols,
two-pass (device histogram, then the SAME tiled kernels with group-indexed
table blocks).  This bench times its DEVICE pipeline fetch-forced (see
scripts/encode_ablation.py for why block_until_ready can't be trusted) on
device-resident data, plus real-container bits/sym and e2e seconds.

The planar adaptive path (adaptive.py) is CONFORMANCE-ONLY (demoted in
round 4): its O(L*A) masked sweep per scan step is a correctness
demonstration of per-block tables under the byte-exact planar coder, not
a throughput path — the rans16 mode covers the product use case.

Writes ADAPTIVE_r04.json.  Usage:
    python scripts/adaptive_bench.py     (env: RC_ADAPT_MB, default 256)
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
from range_coder_rust_tpu import api, rans_codec
from range_coder_rust_tpu import format as fmt
from range_coder_rust_tpu.kernels.rans_encode import (
    barrett_rows_batch, pack_and_gather)
from range_coder_rust_tpu.kernels.vreg import prep_cum_vreg_batch
from range_coder_rust_tpu.models.table import build_table_pow2, table_from_data_pow2


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
    mb = int(os.environ.get("RC_ADAPT_MB", "256"))
    L = int(os.environ.get("RC_ADAPT_L", "32"))  # 2048-lane groups -> 64 KB
    reps = int(os.environ.get("RC_ADAPT_REPS", "3"))
    n = mb << 20
    G = int(os.environ.get("RC_ADAPT_G", str(rans_codec.G)))
    data = mixed_corpus(n)
    NG = n // (G * L)
    dev = jax.devices()[0]
    log(f"device: {dev}; {mb} MB mixed corpus, {NG} groups x {G} x {L} "
        f"(adaptive rans16, {G * L >> 10} KB tables)")

    # --- per-group tables: device histogram -> host normalize ----------
    rows = data.reshape(NG * G, L).astype(np.uint8)
    data_dev = jax.device_put(jnp.asarray(data.astype(np.uint8)), dev)
    jax.block_until_ready(data_dev)
    np.asarray(rans_codec._histogram_groups(
        data_dev, alphabet=256, n_groups=NG))  # compile + warm (fetch-forced)
    t0 = time.time()
    counts = np.asarray(rans_codec._histogram_groups(
        data_dev, alphabet=256, n_groups=NG)).astype(np.uint64)
    hist_s = time.time() - t0
    t0 = time.time()
    tables_c = np.stack([build_table_pow2(c, 16).c for c in counts])
    cums = np.concatenate(
        [np.zeros((NG, 1), np.uint64), np.cumsum(tables_c, axis=1)],
        axis=1).astype(np.uint32)
    table_s = time.time() - t0
    log(f"tables: device histogram {hist_s:.2f}s, host normalize {table_s:.2f}s "
        f"({NG} tables)")

    cum_vreg_all = prep_cum_vreg_batch(cums)
    enc_aux_all = barrett_rows_batch(tables_c)

    # --- device-resident batches -------------------------------------
    gpc = rans_codec._groups_per_call(L, G)
    tile, NT = rans_codec._tile_geometry(L, G)
    batches = []
    for s in range(0, NG, gpc):
        e = min(s + gpc, NG)
        batches.append((
            jax.device_put(jnp.asarray(rows[s * G : e * G]), dev),
            jax.device_put(jnp.asarray(cum_vreg_all[s:e]), dev),
            jax.device_put(jnp.asarray(enc_aux_all[s:e]), dev),
            e - s,
        ))
    jax.block_until_ready([b[0] for b in batches])
    log(f"{len(batches)} device batches staged")

    accum = jax.jit(lambda a, z: a + jnp.sum(z))
    perturb = jax.jit(lambda s, z, i: s.at[0, 0].set(
        ((z >> 31) + (i % 200)).astype(s.dtype)))
    acc0 = jax.device_put(jnp.int32(0))

    def enc_dispatch(rows_d, cv, ea):
        pre, exp, sizes = rans_codec._encode_device(
            rows_d, cv, ea, block_len=L, a_count=256, interpret=False,
            group_lanes=G)
        return pre, exp, sizes

    def _enc_row_idx_g(sizes_np, nb, NT, tile, g):
        ri, rows_out, _, _, _ = rans_codec._enc_row_idx(
            sizes_np, nb, NT, tile, g)
        return ri, rows_out

    # warm + build per-batch compaction row indices (reused across reps —
    # they depend only on sizes, identical across reps)
    enc_extra = []
    for rows_d, cv, ea, nb in batches:
        pre, exp, sizes = enc_dispatch(rows_d, cv, ea)
        sizes_np = np.asarray(sizes)
        ri, rows_out = _enc_row_idx_g(sizes_np, nb, NT, tile, G)
        enc_extra.append((jax.device_put(jnp.asarray(ri), dev), rows_out))
    log("encode warmed; row indices staged")

    def enc_full(i, rows_d):
        cv, ea = batches[i][1], batches[i][2]
        pre, exp, sizes = rans_codec._encode_device(
            rows_d, cv, ea, block_len=L, a_count=256, interpret=False,
            group_lanes=G)
        words = pack_and_gather(exp, enc_extra[i][0],
                                rows_out=enc_extra[i][1])
        return words, sizes

    enc_best = None
    for g in range(3):
        t0 = time.time()
        acc = acc0
        for r in range(reps):
            for i, (rows_d, cv, ea, nb) in enumerate(batches):
                words, sizes = enc_full(i, rows_d)
                acc = accum(acc, sizes)
            batches[0] = (perturb(batches[0][0], acc, g * reps + r),
                          *batches[0][1:])
        int(np.asarray(acc))
        dt = (time.time() - t0) / reps
        enc_best = dt if enc_best is None else min(enc_best, dt)
    log(f"adaptive rans16 device encode: {enc_best * 1e3:.1f} ms "
        f"({n / 1e9 / enc_best:.3f} GB/s)")

    # --- decode: real container -> device-resident decode batches ------
    cfg = api.CodecConfig(
        profile="rans16", block_len=L, per_group_tables=True,
        group_lanes=None if G == rans_codec.G else G)
    blob = api.encode(data.astype(np.uint8), alphabet=256, config=cfg)
    bits = 8 * len(blob) / n
    cont = fmt.unpack(blob)
    out = api.decode(blob)
    assert np.array_equal(out, data), "adaptive rans16 round trip failed"
    log(f"container: {bits:.4f} bits/sym (round trip OK)")

    # stage decode uploads ONCE (mirrors bench.py): parse payloads, build
    # stream rows / indices / starts / preambles per batch, then time the
    # fused device chain fetch-forced
    dec_args = []
    for s in range(0, NG, gpc):
        e = min(s + gpc, NG)
        nb = e - s
        parsed = [rans_codec._parse_payload(p, L, G)
                  for p in cont.payloads[s:e]]
        sizes2 = np.stack([sz for sz, _, _ in parsed])
        region = b"".join(bytes(r) for _, _, r in parsed)
        rows_np, ridx, starts, rpad = rans_codec._stage_stream_windows(
            sizes2, region, G)
        wpre = rans_codec._states_to_words([p6 for _, p6, _ in parsed], G)
        dec_args.append((
            jax.device_put(jnp.asarray(rows_np), dev),
            jax.device_put(jnp.asarray(ridx), dev),
            jax.device_put(jnp.asarray(starts), dev),
            jax.device_put(jnp.asarray(wpre), dev),
            jax.device_put(jnp.asarray(cum_vreg_all[s:e]), dev),
            nb, rpad,
        ))
    jax.block_until_ready([a[0] for a in dec_args])

    def dec_step(arg, pre):
        sr_, ridx_, st_, _, cv_, nb, rpad = arg
        return rans_codec._decode_fused(
            sr_, ridx_, st_, pre, cv_, ng=nb, nt=NT, rpad=rpad,
            block_len=L, a_count=256, out_dtype=jnp.uint8,
            interpret=False)

    dec_chains = [rans_codec._pick_chains(a[5], G // 128, a[6], L)
                  for a in dec_args]
    log(f"decode chain interleave per batch: {dec_chains}")

    jax.block_until_ready([dec_step(a, a[3]) for a in dec_args])  # warm
    pperturb = jax.jit(lambda p, z: p.at[0, 0, 0].set(
        p[0, 0, 0] + (z >> 31).astype(jnp.uint32)))
    dec_best = None
    for _g in range(3):
        t0 = time.time()
        acc = acc0
        pre0 = dec_args[0][3]
        for _r in range(reps):
            for i, a in enumerate(dec_args):
                o = dec_step(a, pre0 if i == 0 else a[3])
                acc = accum(acc, o[: 1 << 10].astype(jnp.int32))
            pre0 = pperturb(dec_args[0][3], acc)
        int(np.asarray(acc))
        dt = (time.time() - t0) / reps
        dec_best = dt if dec_best is None else min(dec_best, dt)
    log(f"adaptive rans16 device decode: {dec_best * 1e3:.1f} ms "
        f"({n / 1e9 / dec_best:.3f} GB/s)")

    # e2e (tunnel-inclusive) for the record
    t0 = time.time()
    blob2 = api.encode(data.astype(np.uint8), alphabet=256, config=cfg)
    e2e_enc = time.time() - t0
    t0 = time.time()
    api.decode(blob2)
    e2e_dec = time.time() - t0

    # shared-table bound for the size comparison
    ts = table_from_data_pow2(data, 256, 16)
    p = np.bincount(data, minlength=256) / n
    nz = ts.c > 0
    shared_bits = float(-(p[nz] * np.log2(
        ts.c[nz].astype(float) / 65536.0)).sum())

    gbps = n / 1e9 / (enc_best + dec_best)
    result = {
        "metric": "adaptive rans16 encode+decode GB/s/chip (mixed corpus)",
        "value": round(gbps, 4),
        "encode_gbps_device": round(n / 1e9 / enc_best, 4),
        "decode_gbps_device": round(n / 1e9 / dec_best, 4),
        "bits_per_symbol": round(bits, 4),
        "bits_per_symbol_shared_table_bound": round(shared_bits, 4),
        "group_kb": G * L >> 10,
        "n_groups": NG,
        "table_build_s": {"device_histogram": round(hist_s, 2),
                          "host_normalize": round(table_s, 2)},
        "e2e_encode_s": round(e2e_enc, 2),
        "e2e_decode_s": round(e2e_dec, 2),
        "corpus_mb": mb,
        "block_len": L,
        "group_lanes": G,
        "decode_chains": max(dec_chains),
        "planar_adaptive": "conformance-only (demoted r4); see adaptive.py",
        "device": str(dev),
    }
    log(f"adaptive rans16 combined {gbps:.3f} GB/s, {bits:.4f} bits/sym "
        f"(shared-table bound {shared_bits:.4f})")
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))),
        os.environ.get("RC_ADAPT_OUT", "ADAPTIVE_r05.json"))
    with open(path, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
