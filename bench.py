"""Benchmark: encode+decode throughput of the TPU coder (rans16 flagship).

Prints ONE JSON line:
  {"metric": "encode+decode GB/s/chip", "value": N, "unit": "GB/s",
   "vs_baseline": R, ...}

The reference publishes no numbers (BASELINE.md), so the baseline is
measured here: the C++ scalar golden coder (byte-identical semantics to the
Rust crate) timed on a sample of the same corpus on this host's CPU.
``vs_baseline`` is our GB/s divided by the scalar coder's GB/s.

Profiles:
  rans16 (default) — interleaved word-renormalized rANS, tiled Pallas
    kernels (rans.py, kernels/rans_*.py).  Device numbers time the full
    device pipeline on device-resident data (step-major transform +
    encode kernel + pack/compaction gather; pad gather + decode kernel +
    narrow-dtype finalize); container bits/sym uses the REAL container
    bytes (api.encode).  e2e numbers are bytes-in -> bytes-out through
    api.encode/api.decode including host assembly and the axon-tunnel
    transfers (~0.25 GB/s each way on this box — the tunnel, not the
    chip, bounds e2e here; a locally-attached chip moves the same data
    at PCIe/HBM rates).
  planar — the byte-exact block-parallel range coder (blocks.py).

Corpus: deterministic Zipf-ish byte stream.  Round-trip equality and
compressed-size-vs-scalar are asserted, not just timed.

The e2e section instruments the transfers INSIDE the run
(rans_codec.start_transfer_log): per-direction sustained tunnel rates and
``e2e_vs_floor`` = (sum of per-direction tunnel-active time) / wall — a
MEASURED overlap statement, not a ratio against an isolated best-of-3
probe (VERDICT r4 item 2; the probe rates are still reported for
reference as *_probe fields).

Env knobs: RC_BENCH_MB (corpus MB, default 256 — large enough that the
group count admits the decode chain interleave at the size-winning lane
length), RC_BENCH_REPS (default 3), RC_BENCH_L (lane/block length,
default 32768 rans16 / 512 planar), RC_BENCH_PROFILE (rans16|planar),
RC_BENCH_E2E_MB (end-to-end api slice, default = corpus size).
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


def timed_best(fn, block, reps, groups=3):
    """Best group-average seconds per rep.  Within a group all reps are
    DISPATCHED back-to-back with one final block (each dispatch over the
    axon tunnel costs ~20-30 ms of latency, which block-per-rep timing
    would charge to the device); the best of ``groups`` group-averages
    rides out this VM's noisy-neighbor variance (the pure-CPU baseline
    itself swings ~40% run to run)."""
    best = None
    for _ in range(groups):
        t0 = time.time()
        outs = [fn() for _ in range(reps)]
        block(outs)
        dt = (time.time() - t0) / reps
        best = dt if best is None else min(best, dt)
    return best


def main() -> None:
    profile = os.environ.get("RC_BENCH_PROFILE", "rans16")
    mb = int(os.environ.get("RC_BENCH_MB", "256"))
    reps = int(os.environ.get("RC_BENCH_REPS", "3"))
    k = int(os.environ.get("RC_BENCH_K", "16"))
    e2e_mb = int(os.environ.get("RC_BENCH_E2E_MB", str(mb)))

    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    import jax.numpy as jnp

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from range_coder_rust_tpu import api
    from range_coder_rust_tpu.models.table import table_from_data_pow2
    from range_coder_rust_tpu.native import golden

    dev = jax.devices()[0]
    log(f"device: {dev} platform={dev.platform} profile={profile}")

    # 32768: holds the size win vs the scalar stream (the marginal lane
    # costs ~5 B — docs/hardware_runs.md r5) while giving the decode
    # chain interleave NG = corpus/(G*L) groups to hide latency with
    default_l = "32768" if profile == "rans16" else "512"
    L = int(os.environ.get("RC_BENCH_L", default_l))
    n = mb << 20
    data = make_corpus(n)
    log(f"corpus: {mb} MB, L={L}, k={k}")
    t = table_from_data_pow2(data, 256, k)

    # --- scalar baseline FIRST (C++ golden, reference semantics) -----------
    # measured before any device work: the axon tunnel's host threads
    # otherwise contend for the 2 cores and understate the baseline
    sample = data[: min(n, 4 << 20)]
    t0 = time.time()
    ref_code = golden.encode(sample, t.c, t.cum[:-1], 1 << k)
    ref_enc_t = time.time() - t0
    t0 = time.time()
    ref_dec = golden.decode(ref_code, sample.size, t.c, t.cum[:-1], 1 << k)
    ref_dec_t = time.time() - t0
    assert np.array_equal(ref_dec.astype(np.int64), sample.astype(np.int64))
    base_gbps = sample.size / 1e9 / (ref_enc_t + ref_dec_t)
    ref_bits = 8 * len(ref_code) / sample.size
    log(f"scalar C++ baseline: {base_gbps:.3f} GB/s, {ref_bits:.4f} bits/sym "
        f"on {sample.size >> 20} MB sample")

    if profile == "rans16":
        enc_t, dec_t, cont_bits, compiles = bench_rans16(
            jax, jnp, dev, data, t, L, reps)
    else:
        enc_t, dec_t, cont_bits, compiles = bench_planar(
            jax, jnp, dev, data, t, L, k, reps)

    gbps = n / 1e9 / (enc_t + dec_t)
    log(f"device encode {n / 1e9 / enc_t:.3f} GB/s, decode "
        f"{n / 1e9 / dec_t:.3f} GB/s, combined {gbps:.3f} GB/s")
    log(f"bits/sym (container-inclusive): ours {cont_bits:.4f} vs scalar "
        f"stream {ref_bits:.4f}")

    # --- end-to-end api.encode/decode (bytes in, bytes out) ----------------
    # instrumented: every bulk tunnel transfer inside the run is
    # timestamped (rans_codec transfer log), so overlap is MEASURED
    from range_coder_rust_tpu import rans_codec

    e2e_n = min(n, e2e_mb << 20)
    cfg = api.CodecConfig(k=16, block_len=L, profile=profile) \
        if profile == "rans16" else api.CodecConfig(k=k, block_len=L)
    e2e_data = data[:e2e_n].astype(np.uint8).tobytes()
    blob = api.encode(e2e_data, alphabet=256, config=cfg)  # compile/warm
    runs = []
    for _ in range(2):  # tunnel throughput is erratic; report mean + best
        rans_codec.start_transfer_log()
        t0 = time.time()
        blob = api.encode(e2e_data, alphabet=256, config=cfg)
        enc_wall = time.time() - t0
        enc_log = rans_codec.stop_transfer_log()
        rans_codec.start_transfer_log()
        t0 = time.time()
        rt = api.decode(blob)
        dec_wall = time.time() - t0
        dec_log = rans_codec.stop_transfer_log()
        runs.append((enc_wall, dec_wall, enc_log, dec_log))
    assert np.array_equal(rt, data[:e2e_n]), "api round trip failed"
    best = min(runs, key=lambda r: r[0] + r[1])
    e2e_enc_t, e2e_dec_t, enc_log, dec_log = best
    e2e_enc_mean = sum(r[0] for r in runs) / len(runs)
    e2e_dec_mean = sum(r[1] for r in runs) / len(runs)
    e2e_gbps = e2e_n / 1e9 / (e2e_enc_t + e2e_dec_t)
    e2e_gbps_mean = e2e_n / 1e9 / (e2e_enc_mean + e2e_dec_mean)
    log(f"end-to-end api ({e2e_n >> 20} MB, incl. tunnel transfers + host "
        f"assembly): encode {e2e_n / 1e9 / e2e_enc_t:.3f} GB/s, decode "
        f"{e2e_n / 1e9 / e2e_dec_t:.3f} GB/s, combined {e2e_gbps:.3f} GB/s "
        f"(mean {e2e_gbps_mean:.3f})")

    # --- in-run tunnel floor: measured inside the timed runs above --------
    # active = union of the logged transfer intervals per direction; the
    # floor is the wall the tunnel alone would need with zero overlap
    # between directions, so e2e_vs_floor = tunnel_active / wall is a
    # measured overlap statement (1.0 = the run IS the transfers; > 1.0
    # is possible when the two directions overlap each other)
    stats = _xfer_stats(enc_log + dec_log)
    wall = e2e_enc_t + e2e_dec_t
    floor_s = stats["h2d_active_s"] + stats["d2h_active_s"]
    e2e_vs_floor = floor_s / wall if wall else 0.0
    log(f"in-run tunnel: H2D {stats['h2d_gbps']:.3f} GB/s sustained "
        f"({stats['h2d_mb']:.0f} MB, {stats['h2d_active_s']:.1f}s active), "
        f"D2H {stats['d2h_gbps']:.3f} GB/s "
        f"({stats['d2h_mb']:.0f} MB, {stats['d2h_active_s']:.1f}s active) "
        f"-> e2e at {e2e_vs_floor:.2f}x of in-run floor")

    # isolated best-of-3 probe rates, for reference only (the tunnel
    # swings 3-10x between probe and run — hence the in-run floor above)
    h2d_gbps, d2h_gbps = _tunnel_rates(jax, jnp, dev, rans_codec,
                                       min(e2e_n, 64 << 20))
    comp_n = len(blob)
    probe_floor_s = ((e2e_n + comp_n) / 1e9 / h2d_gbps
                     + (e2e_n + comp_n) / 1e9 / d2h_gbps)
    probe_floor_gbps = e2e_n / 1e9 / probe_floor_s
    log(f"probe tunnel: H2D {h2d_gbps:.3f} GB/s, D2H {d2h_gbps:.3f} GB/s "
        f"-> probe floor {probe_floor_gbps:.4f} GB/s")

    # calibration: cycles per sequential kernel step vs the v5e clock —
    # the per-symbol cost in dependent-latency terms (docs/hardware_runs.md
    # roofline section explains the bounds these sit against)
    clk = 0.94e9  # TPU v5e core clock
    enc_cps = enc_t * clk / max(compiles.get("enc_steps", 1), 1)
    dec_cps = dec_t * clk / max(compiles.get("dec_steps", 1), 1)

    print(json.dumps({
        "metric": "encode+decode GB/s/chip",
        "value": round(gbps, 4),
        "unit": "GB/s",
        "vs_baseline": round(gbps / base_gbps, 3),
        "profile": profile,
        "encode_gbps": round(n / 1e9 / enc_t, 4),
        "decode_gbps": round(n / 1e9 / dec_t, 4),
        "decode_vs_encode": round(enc_t / dec_t, 3),
        "decode_chains": compiles.get("chains", 1),
        "e2e_gbps": round(e2e_gbps, 4),
        "e2e_gbps_mean": round(e2e_gbps_mean, 4),
        "e2e_encode_gbps": round(e2e_n / 1e9 / e2e_enc_t, 4),
        "e2e_decode_gbps": round(e2e_n / 1e9 / e2e_dec_t, 4),
        "e2e_mb": e2e_n >> 20,
        "corpus_mb": mb,
        "lane_len": L,
        "compile_s": compiles,
        "bits_per_symbol_container": round(cont_bits, 4),
        "scalar_bits_per_symbol": round(ref_bits, 4),
        "size_vs_scalar": round(cont_bits / ref_bits, 4),
        "baseline_gbps_scalar_cpp": round(base_gbps, 4),
        "inrun_h2d_gbps": round(stats["h2d_gbps"], 4),
        "inrun_d2h_gbps": round(stats["d2h_gbps"], 4),
        "inrun_tunnel_active_s": round(floor_s, 2),
        "e2e_wall_s": round(wall, 2),
        "e2e_vs_floor": round(e2e_vs_floor, 3),
        "tunnel_h2d_gbps_probe": round(h2d_gbps, 4),
        "tunnel_d2h_gbps_probe": round(d2h_gbps, 4),
        "tunnel_floor_gbps_probe": round(probe_floor_gbps, 4),
        "e2e_vs_floor_probe": round(e2e_gbps / probe_floor_gbps, 3),
        "encode_cycles_per_step": round(enc_cps, 1),
        "decode_cycles_per_step": round(dec_cps, 1),
        "encode_symbols_per_cycle": round(n / (enc_t * clk), 4),
        "decode_symbols_per_cycle": round(n / (dec_t * clk), 4),
        "device": str(dev),
    }))


def _xfer_stats(records):
    """Per-direction sustained rates + active (union) seconds from the
    in-run transfer log [(dir, t0, t1, nbytes), ...]."""
    out = {}
    for d in ("h2d", "d2h"):
        iv = sorted((t0, t1) for dd, t0, t1, _ in records if dd == d)
        nbytes = sum(nb for dd, _, _, nb in records if dd == d)
        active = 0.0
        cur_a = cur_b = None
        for a, b in iv:
            if cur_b is None or a > cur_b:
                if cur_b is not None:
                    active += cur_b - cur_a
                cur_a, cur_b = a, b
            else:
                cur_b = max(cur_b, b)
        if cur_b is not None:
            active += cur_b - cur_a
        out[f"{d}_active_s"] = active
        out[f"{d}_mb"] = nbytes / 1e6
        out[f"{d}_gbps"] = nbytes / 1e9 / active if active else 0.0
    return out


def _tunnel_rates(jax, jnp, dev, rans_codec, nbytes):
    """Best-of-3 raw H2D / D2H GB/s for an ``nbytes`` u8 buffer, using the
    same transfer paths the product uses (device_put up, chunked
    parallel-stream _fetch down)."""
    buf = np.zeros(nbytes, np.uint8)
    h2d = d2h = None
    for _ in range(3):
        t0 = time.time()
        d = jax.block_until_ready(jax.device_put(jnp.asarray(buf), dev))
        dt = time.time() - t0
        h2d = dt if h2d is None else min(h2d, dt)
        t0 = time.time()
        rans_codec._fetch(d)
        dt = time.time() - t0
        d2h = dt if d2h is None else min(d2h, dt)
        buf[0] += 1  # distinct content per rep (dedup-proof)
    return nbytes / 1e9 / h2d, nbytes / 1e9 / d2h


def _cold_compile_s(jax, jnp, rans_codec, L, NT):
    """True cold-compile seconds for the three rans16 programs: point the
    compilation cache at a fresh dir and time .lower().compile() (no
    execution — first-execution timings here conflate multi-minute tunnel
    recovery with compilation)."""
    import tempfile

    old = jax.config.jax_compilation_cache_dir
    tmp = tempfile.mkdtemp(prefix="jaxcache_cold_")
    jax.config.update("jax_compilation_cache_dir", tmp)
    try:
        from range_coder_rust_tpu.kernels.rans_encode import pack_and_gather

        ng = 1
        rows = jax.ShapeDtypeStruct((ng * rans_codec.G, L), jnp.uint8)
        cum = jax.ShapeDtypeStruct((8, 128), jnp.uint32)
        t0 = time.time()
        rans_codec._encode_device.lower(
            rows, cum, block_len=L, a_count=256, interpret=False).compile()
        enc_s = time.time() - t0
        exp = jax.ShapeDtypeStruct((ng, NT, 512, 128), jnp.uint32)
        ridx = jax.ShapeDtypeStruct((90112,), jnp.int32)
        t0 = time.time()
        pack_and_gather.lower(exp, ridx, rows_out=90112).compile()
        pack_s = time.time() - t0
        sr = jax.ShapeDtypeStruct((90112, 128), jnp.uint32)
        rpad = rans_codec._rpad_for(88)
        didx = jax.ShapeDtypeStruct((ng * NT * rpad,), jnp.int32)
        st = jax.ShapeDtypeStruct((ng, NT), jnp.int32)
        pre = jax.ShapeDtypeStruct((ng, 2 * rans_codec.G // 128, 128), jnp.uint32)
        t0 = time.time()
        rans_codec._decode_fused_jit.lower(
            sr, didx, st, pre, cum, ng=ng, nt=NT, rpad=rpad, block_len=L,
            a_count=256, out_dtype=jnp.uint8, interpret=False,
            chains=1).compile()
        dec_s = time.time() - t0
        return {"encode_s": round(enc_s, 1), "pack_s": round(pack_s, 1),
                "decode_s": round(dec_s, 1)}
    finally:
        jax.config.update("jax_compilation_cache_dir", old)


def _enc_row_idx(sizes_np, nb, NT, tile, rans_codec):
    """Delegates to the ONE shared implementation in rans_codec."""
    ri, rows_out, _, _, _ = rans_codec._enc_row_idx(sizes_np, nb, NT, tile)
    return ri, rows_out


def bench_rans16(jax, jnp, dev, data, t, L, reps):
    """Device-resident pipeline timing, rans16 profile (tiled kernels)."""
    from range_coder_rust_tpu import format as fmt
    from range_coder_rust_tpu import rans_codec
    from range_coder_rust_tpu.kernels.vreg import prep_cum_vreg

    G = rans_codec.G
    n = data.size
    # shrink the lane length exactly like the product path does when the
    # corpus cannot fill one group at the requested L
    L = rans_codec._shrink_lane_len(n, L)
    ng = max(1, n // (G * L))
    nfit = ng * G * L
    rows = data[:nfit].reshape(ng * G, L).astype(np.uint8)
    from range_coder_rust_tpu.kernels.rans_encode import barrett_rows

    cum_vreg = jax.device_put(jnp.asarray(prep_cum_vreg(t.cum)), dev)
    enc_aux = jax.device_put(jnp.asarray(barrett_rows(t.c)), dev)
    gpc = rans_codec._groups_per_call(L)
    n_batches = -(-ng // gpc)
    tile, NT = rans_codec._tile_geometry(L)

    t0 = time.time()
    dev_rows = []
    for i in range(n_batches):
        chunk = rows[i * gpc * G : (i + 1) * gpc * G]
        dev_rows.append(jax.device_put(jnp.asarray(chunk), dev))
    jax.block_until_ready(dev_rows)
    log(f"rans16 H2D ({n_batches} batches of <= {gpc} groups as u8): "
        f"{time.time() - t0:.1f}s")

    def enc_step(dev_chunk):
        from range_coder_rust_tpu.kernels.rans_encode import pack_and_gather

        pre, exp, sizes = rans_codec._encode_device(
            dev_chunk, cum_vreg, enc_aux, block_len=L, a_count=256,
            interpret=False)
        sizes_np = np.asarray(sizes)  # sync: the host needs sizes for the
        # compaction row index (tiny D2H + ~n/64K-element numpy)
        row_idx, rows_out = _enc_row_idx(
            sizes_np, dev_chunk.shape[0] // G, NT, tile, rans_codec)
        words = pack_and_gather(exp, jnp.asarray(row_idx), rows_out=rows_out)
        return pre, words, sizes_np

    t0 = time.time()
    res = [enc_step(c) for c in dev_rows]
    jax.block_until_ready([r[1] for r in res])
    enc_compile = time.time() - t0
    log(f"rans16 encode compile+first: {enc_compile:.1f}s "
        f"(ng={ng}, NT={NT})")

    # the steady-state device metric times the fused device chain with the
    # compaction row-index REUSED (it depends only on the sizes, which are
    # identical across reps); the one-per-batch sizes sync + numpy index
    # build is timed separately below and belongs to the e2e metric
    from range_coder_rust_tpu.kernels.rans_encode import pack_and_gather

    enc_row_idx = []
    for dev_chunk in dev_rows:
        _, _, sizes = rans_codec._encode_device(
            dev_chunk, cum_vreg, enc_aux, block_len=L, a_count=256,
            interpret=False)
        t1 = time.time()
        sizes_np = np.asarray(sizes)
        sync_s = time.time() - t1
        t1 = time.time()
        ri, rows_out = _enc_row_idx(sizes_np, dev_chunk.shape[0] // G,
                                    NT, tile, rans_codec)
        idx_s = time.time() - t1
        enc_row_idx.append((jax.device_put(jnp.asarray(ri), dev), rows_out))
    log(f"per-batch host overhead: sizes D2H {sync_s:.2f}s, "
        f"numpy idx {idx_s * 1e3:.0f}ms")

    def enc_fused(dev_chunk, ri, rows_out):
        _, exp, _ = rans_codec._encode_device(
            dev_chunk, cum_vreg, enc_aux, block_len=L, a_count=256,
            interpret=False)
        return pack_and_gather(exp, ri, rows_out=rows_out)

    # real container via the product path (also the size measurement)
    blob = rans_codec.encode(
        data[:nfit].astype(np.uint8), alphabet=256, table=t, block_len=L)
    cont_bits = 8 * len(blob) / nfit
    cont = fmt.unpack(blob)

    # decode timing decodes the real container payloads (parse + upload
    # excluded here — those are the e2e metric's job; this measures the
    # device pipeline: pad gather + kernel + finalize)
    t0 = time.time()
    got = rans_codec.decode_groups(cont.payloads, t.c, L)
    dec_compile = time.time() - t0
    log(f"rans16 decode compile+first (full decode_groups): {dec_compile:.1f}s")
    assert np.array_equal(got, rows.astype(np.int32)), "round trip failed"

    block = jax.block_until_ready
    enc_t = timed_best(
        lambda: [enc_fused(c, ri, ro)
                 for c, (ri, ro) in zip(dev_rows, enc_row_idx)],
        block, reps)

    # device-resident decode: prepare uploads once, time the device stages
    parsed = [rans_codec._parse_payload(p, L) for p in cont.payloads]
    gpc_dec = rans_codec._groups_per_call_dec(L)
    dec_args = []
    for start in range(0, ng, gpc_dec):
        stop = min(start + gpc_dec, ng)
        nb = stop - start
        part = parsed[start:stop]
        sizes = np.stack([s for s, _, _ in part])
        region = b"".join(bytes(r) for _, _, r in part)
        rows_np, ridx, starts, rpad = rans_codec._stage_stream_windows(
            sizes, region, G)
        words = rans_codec._states_to_words(
            [p6 for _, p6, _ in part], G)
        dec_args.append((
            jax.device_put(jnp.asarray(rows_np), dev),
            jax.device_put(jnp.asarray(ridx), dev),
            jax.device_put(jnp.asarray(starts), dev),
            jax.device_put(jnp.asarray(words), dev),
            nb, rpad,
        ))

    def dec_step(arg):
        stream_rows, ridx, starts, pre, nb, rpad = arg
        return rans_codec._decode_fused(
            stream_rows, ridx, starts, pre, cum_vreg,
            ng=nb, nt=NT, rpad=rpad, block_len=L, a_count=256,
            out_dtype=jnp.uint8, interpret=False)

    jax.block_until_ready([dec_step(a) for a in dec_args])  # compile
    dec_t = timed_best(lambda: [dec_step(a) for a in dec_args], block, reps)

    # chain-interleave factors actually used per decode batch (for the
    # JSON + the cycles-per-step calibration)
    chain_list = [rans_codec._pick_chains(
        a[4], rans_codec.G // 128, a[5], L // NT) for a in dec_args]
    dec_steps = sum(a[4] * L // c for a, c in zip(dec_args, chain_list))
    log(f"decode chains per batch: {chain_list}")

    # measured LAST: flipping the compilation-cache dir invalidates jit
    # executable caches, which would force recompiles into timed loops
    cold = _cold_compile_s(jax, jnp, rans_codec, L, NT)
    log(f"cold compile (fresh cache, lower+compile only): {cold}")
    scale = n / nfit
    return enc_t * scale, dec_t * scale, cont_bits, {
        "encode_first_s": round(enc_compile, 1),
        "decode_first_s": round(dec_compile, 1),
        "cold_compile": cold,
        "chains": max(chain_list),
        "enc_steps": ng * L,
        "dec_steps": dec_steps,
    }


def bench_planar(jax, jnp, dev, data, t, L, k, reps):
    """Round-1 planar path timing (kept for comparison/regression)."""
    from range_coder_rust_tpu.blocks import (
        decode_blocks, default_capacity, encode_blocks)

    n = data.size
    B = n // L
    rows = data[: B * L].reshape(B, L)
    c = jax.device_put(jnp.asarray(t.c), dev)
    cum = jax.device_put(jnp.asarray(t.cum), dev)
    cap = default_capacity(L, k)
    syms = jax.device_put(jnp.asarray(rows), dev)

    t0 = time.time()
    code, lengths = encode_blocks(syms, c, cum, k=k, capacity=cap)
    jax.block_until_ready((code, lengths))
    enc_compile = time.time() - t0
    log(f"planar encode compile+first: {enc_compile:.1f}s")
    t0 = time.time()
    dec = decode_blocks(code, c, cum, k=k, block_len=L)
    jax.block_until_ready(dec)
    dec_compile = time.time() - t0
    log(f"planar decode compile+first: {dec_compile:.1f}s")
    assert np.array_equal(np.asarray(dec), rows), "round trip failed"
    lengths_np = np.asarray(lengths)
    assert int(lengths_np.max()) <= cap, "capacity overflow"
    # container-inclusive: payloads + 4B length + 4B CRC per block
    cont_bits = 8 * (int(lengths_np.sum()) + 8 * B) / (B * L)

    block = jax.block_until_ready
    enc_t = timed_best(
        lambda: encode_blocks(syms, c, cum, k=k, capacity=cap), block, reps)
    dec_t = timed_best(
        lambda: decode_blocks(code, c, cum, k=k, block_len=L), block, reps)
    scale = n / (B * L)
    return enc_t * scale, dec_t * scale, cont_bits, {
        "encode_first_s": round(enc_compile, 1),
        "decode_first_s": round(dec_compile, 1),
    }


if __name__ == "__main__":
    main()
