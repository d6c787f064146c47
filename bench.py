"""Benchmark: encode+decode throughput of the TPU coder (rans16 flagship).

Prints ONE JSON line:
  {"metric": "encode+decode GB/s/chip", "value": N, "unit": "GB/s",
   "vs_baseline": R, ...}

The reference publishes no numbers (BASELINE.md), so the baseline is
measured here: the C++ scalar golden coder (byte-identical semantics to the
Rust crate) timed on a sample of the same corpus on this host's CPU.
``vs_baseline`` is our GB/s divided by the scalar coder's GB/s.

Profiles:
  rans16 (default) — interleaved word-renormalized rANS, Pallas kernels
    (rans.py, kernels/rans_*.py).  Device numbers time the jit-fused
    transpose -> encode-kernel -> pack chain and the decode kernel on
    device-resident data; container bits/sym uses the REAL container bytes
    (api.encode), per the round-1 verdict.
  planar — the byte-exact block-parallel range coder (blocks.py).

Corpus: deterministic Zipf-ish byte stream.  Round-trip equality and
compressed-size-vs-scalar are asserted, not just timed.

Env knobs: RC_BENCH_MB (corpus MB, default 64), RC_BENCH_REPS (default 3),
RC_BENCH_L (lane/block length, default 4096 rans16 / 512 planar),
RC_BENCH_PROFILE (rans16|planar), RC_BENCH_E2E_MB (end-to-end api slice,
default 8 — host<->device transfers ride a network tunnel here, so the e2e
number under-reports what a locally-attached chip would do).
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


def timed_best(fn, block, reps):
    best = None
    for _ in range(reps):
        t0 = time.time()
        block(fn())
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    return best


def main() -> None:
    profile = os.environ.get("RC_BENCH_PROFILE", "rans16")
    mb = int(os.environ.get("RC_BENCH_MB", "64"))
    reps = int(os.environ.get("RC_BENCH_REPS", "3"))
    k = int(os.environ.get("RC_BENCH_K", "16"))
    e2e_mb = int(os.environ.get("RC_BENCH_E2E_MB", "8"))

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

    # rans16 default: the geometry repeatedly proven stable on this axon
    # runtime (16 groups x 1024 lanes x 512 steps per invocation,
    # docs/hardware_runs.md).  Larger single invocations and multi-segment
    # chains are built and interpret-verified but have stalled in
    # EXECUTION here; the size-win L=65536 chain stays opt-in via
    # RC_BENCH_L until that is root-caused.
    default_l = "2048" if profile == "rans16" else "512"
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
        enc_t, dec_t, cont_bits = bench_rans16(jax, jnp, dev, data, t, L, reps)
    else:
        enc_t, dec_t, cont_bits = bench_planar(jax, jnp, dev, data, t, L, k, reps)

    gbps = n / 1e9 / (enc_t + dec_t)
    log(f"device encode {n / 1e9 / enc_t:.3f} GB/s, decode "
        f"{n / 1e9 / dec_t:.3f} GB/s, combined {gbps:.3f} GB/s")
    log(f"bits/sym (container-inclusive): ours {cont_bits:.4f} vs scalar "
        f"stream {ref_bits:.4f}")

    # --- end-to-end api.encode/decode (bytes in, bytes out) ----------------
    e2e_n = min(n, e2e_mb << 20)
    cfg = api.CodecConfig(k=16, block_len=L, profile=profile) \
        if profile == "rans16" else api.CodecConfig(k=k, block_len=L)
    e2e_data = data[:e2e_n].astype(np.uint8).tobytes()
    blob = api.encode(e2e_data, alphabet=256, config=cfg)
    t0 = time.time()
    blob = api.encode(e2e_data, alphabet=256, config=cfg)
    e2e_enc_t = time.time() - t0
    t0 = time.time()
    rt = api.decode(blob)
    e2e_dec_t = time.time() - t0
    assert np.array_equal(rt, data[:e2e_n]), "api round trip failed"
    e2e_gbps = e2e_n / 1e9 / (e2e_enc_t + e2e_dec_t)
    log(f"end-to-end api ({e2e_n >> 20} MB, incl. tunnel transfers + host "
        f"assembly): {e2e_gbps:.3f} GB/s")

    print(json.dumps({
        "metric": "encode+decode GB/s/chip",
        "value": round(gbps, 4),
        "unit": "GB/s",
        "vs_baseline": round(gbps / base_gbps, 3),
        "profile": profile,
        "encode_gbps": round(n / 1e9 / enc_t, 4),
        "decode_gbps": round(n / 1e9 / dec_t, 4),
        "e2e_gbps": round(e2e_gbps, 4),
        "corpus_mb": mb,
        "lane_len": L,
        "bits_per_symbol_container": round(cont_bits, 4),
        "scalar_bits_per_symbol": round(ref_bits, 4),
        "size_vs_scalar": round(cont_bits / ref_bits, 4),
        "baseline_gbps_scalar_cpp": round(base_gbps, 4),
        "device": str(dev),
    }))


def bench_rans16(jax, jnp, dev, data, t, L, reps):
    """Device-resident chained encode + decode timing, rans16 profile."""
    from range_coder_rust_tpu import rans_codec
    from range_coder_rust_tpu import format as fmt
    from range_coder_rust_tpu.kernels.decode_pallas import prep_cum_vreg
    from range_coder_rust_tpu.kernels.encode_pallas import symbols_to_step_major
    from range_coder_rust_tpu.kernels.rans_decode import (
        rans_decode_words, stream_bytes_to_words)
    from range_coder_rust_tpu.kernels.rans_encode import (
        pack_expanded, rans_encode_tiles)

    G = rans_codec.G
    n = data.size
    ng = n // (G * L)
    assert ng >= 1, f"corpus too small for one group at L={L}"
    nfit = ng * G * L
    rows = data[:nfit].reshape(ng * G, L)
    NS, seg = rans_codec._segments(L, rans_codec.SEG)
    # groups per kernel invocation: keep each call at the proven ~8 MB
    # working-set shape; larger aggregates have stalled on this runtime
    gpc = max(1, (8 << 20) // (G * L))
    n_batches = -(-ng // gpc)

    cum_vreg = jax.device_put(jnp.asarray(prep_cum_vreg(t.cum)), dev)
    ent = max(rans_codec._entropy_bits(t), 0.05)
    cap_hw = rans_codec._cap_hw_for(seg, ent, 0)

    # one jitted program for ALL segment slices+transposes — per-offset
    # eager slicing would trigger NS separate (slow, remote) XLA compiles
    split_sm = jax.jit(lambda s: [
        symbols_to_step_major(s[:, i * seg : (i + 1) * seg])
        for i in range(NS)])

    def chain_enc(batch_segs):
        """The device encode chain (segment emissions stay on device)."""
        state, outs = None, []
        for s in range(NS - 1, -1, -1):
            pre, exp, cur, state = rans_encode_tiles(
                batch_segs[s], cum_vreg,
                block_len=seg, a_count=256, cap_hw=cap_hw,
                st_in=state, chain=state is not None, return_state=True)
            outs.append((pack_expanded(exp), cur))
        return pre, outs

    def enc_all(batches):
        return [chain_enc(b) for b in batches]

    t0 = time.time()
    dev_syms = []
    for i in range(n_batches):
        chunk = rows[i * gpc * G : (i + 1) * gpc * G]
        dev_syms.append(jax.device_put(jnp.asarray(chunk), dev))
    jax.block_until_ready(dev_syms)
    batches = [jax.block_until_ready(split_sm(s)) for s in dev_syms]
    log(f"rans16 H2D+split ({n_batches} batches of <= {gpc} groups): "
        f"{time.time() - t0:.1f}s")
    t0 = time.time()
    res = enc_all(batches)
    jax.block_until_ready(res)
    for pre, outs in res:
        for _, cur in outs:
            assert int(np.asarray(cur).min()) >= 0, "rans16 capacity overflow"
    log(f"rans16 encode compile+first: {time.time() - t0:.1f}s "
        f"(ng={ng}, NS={NS}, cap_hw={cap_hw})")

    # real container via the product path (also the size measurement)
    blob = rans_codec.encode(data[:nfit], alphabet=256, table=t, block_len=L)
    cont_bits = 8 * len(blob) / nfit
    cont = fmt.unpack(blob)
    parsed = [rans_codec._parse_payload(p, L, rans_codec.SEG)
              for p in cont.payloads]
    word_batches = []  # [batch][segment] -> (<=gpc, wrows, 128) words
    for i in range(n_batches):
        part = parsed[i * gpc : (i + 1) * gpc]
        seg_words = []
        for s in range(NS):
            bufs = [(p + r[s]) if s == 0 else r[s] for p, r in part]
            wrows = max((len(b) + 511) // 512 for b in bufs) + 10
            wrows = -(-wrows // 8) * 8
            seg_words.append(jax.device_put(jnp.asarray(np.stack(
                [stream_bytes_to_words(b, wrows) for b in bufs])), dev))
        word_batches.append(seg_words)

    def chain_dec(seg_words):
        state, parts = None, []
        for s in range(NS):
            dec, state = rans_decode_words(
                seg_words[s], cum_vreg, block_len=seg, a_count=256,
                st_in=state, primed=s == 0, return_state=True)
            parts.append(dec)
        return parts

    def dec_all():
        return [chain_dec(b) for b in word_batches]

    t0 = time.time()
    all_parts = dec_all()
    jax.block_until_ready(all_parts)
    log(f"rans16 decode compile+first: {time.time() - t0:.1f}s")
    got = np.concatenate([
        np.concatenate([np.asarray(p).reshape(-1, seg) for p in parts],
                       axis=1)
        for parts in all_parts], axis=0)
    assert np.array_equal(got, rows), "round trip failed"

    block = jax.block_until_ready
    enc_t = timed_best(
        lambda: enc_all([split_sm(s) for s in dev_syms]), block, reps)
    dec_t = timed_best(dec_all, block, reps)
    # scale device times from the fitted portion to the full corpus
    scale = n / nfit
    return enc_t * scale, dec_t * scale, cont_bits


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
    log(f"planar encode compile+first: {time.time() - t0:.1f}s")
    t0 = time.time()
    dec = decode_blocks(code, c, cum, k=k, block_len=L)
    jax.block_until_ready(dec)
    log(f"planar decode compile+first: {time.time() - t0:.1f}s")
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
    return enc_t * scale, dec_t * scale, cont_bits


if __name__ == "__main__":
    main()
