"""Per-stage device timing for the tiled rans16 pipeline (real TPU).

    python scripts/micro_rans_bench.py [MB] [L]

SUPERSEDED for per-stage analysis by scripts/encode_ablation.py and
scripts/decode_ablation.py: this harness times with block_until_ready,
which on the axon tunnel can return before execution — the early-stage
lines here (step_major, encode_kernel) read absurdly fast and the first
subsequent HOST fetch absorbs their real time.  The fused end-of-chain
numbers remain roughly honest (they get blocked on by later stages).
Kept as a smoke/pipeline driver; trust the fetch-forced ablations for
attribution.
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
    reps = int(os.environ.get("REPS", "5"))

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    import jax.numpy as jnp
    import numpy as np

    from range_coder_rust_tpu import rans_codec
    from range_coder_rust_tpu.kernels.vreg import (
        prep_cum_vreg, symbols_to_step_major)
    from range_coder_rust_tpu.kernels.rans_decode import rans_decode_tiled
    from range_coder_rust_tpu.kernels.rans_encode import (
        pack_and_gather, rans_encode_tiled)
    from range_coder_rust_tpu.models.table import table_from_data_pow2

    G = rans_codec.G
    n = mb << 20
    ng = max(1, n // (G * L))
    rng = np.random.default_rng(0)
    ranks = np.arange(1, 257)
    p = 1.0 / ranks**1.2
    p /= p.sum()
    data = rng.choice(256, size=ng * G * L, p=p).astype(np.int32)
    t = table_from_data_pow2(data, 256, 16)
    gb = data.size / 1e9
    log(f"device {jax.devices()[0]}; {ng} groups x {G} x {L} ({gb:.3f} GB)")

    cum_vreg = jnp.asarray(prep_cum_vreg(t.cum))
    rows_u8 = jax.device_put(jnp.asarray(
        data.reshape(ng * G, L).astype(np.uint8)))
    jax.block_until_ready(rows_u8)

    def timed(name, fn):
        out = jax.block_until_ready(fn())  # compile + warm
        t1 = time.time()
        for _ in range(reps):
            out = fn()
        jax.block_until_ready(out)
        dt = (time.time() - t1) / reps
        log(f"{name:16s}: {dt * 1e3:8.2f} ms  ({gb / dt:7.3f} GB/s)")
        return out

    sm = jax.jit(lambda r: symbols_to_step_major(r.astype(jnp.int32)))
    sym = timed("step_major", lambda: sm(rows_u8))

    enc = lambda s: rans_encode_tiled(
        s, cum_vreg, block_len=L, a_count=256)
    pre, exp, sizes = timed("encode_kernel", lambda: enc(sym))

    # host-side compaction index (from sizes) — time it separately
    tile, NT = rans_codec._tile_geometry(L)
    t1 = time.time()
    sizes_np = np.asarray(sizes)
    row_idx, _, _, counts, _ = rans_codec._enc_row_idx(
        sizes_np, ng, NT, tile)
    total = int(counts.sum())
    log(f"host idx calc   : {(time.time() - t1) * 1e3:8.2f} ms "
        f"({total} rows)")
    ridx_dev = jax.device_put(jnp.asarray(row_idx))

    words = timed("pack_gather", lambda: pack_and_gather(
        exp, ridx_dev, rows_out=row_idx.size))

    fused_enc = jax.jit(lambda r, ri: pack_and_gather(
        rans_encode_tiled(sm.__wrapped__(r), cum_vreg, block_len=L,
                          a_count=256)[1], ri, rows_out=row_idx.size))
    timed("encode_fused", lambda: fused_enc(rows_u8, ridx_dev))

    # decode stages from the real payloads
    payloads = rans_codec.encode_groups(
        np.asarray(rows_u8).astype(np.int32), t, L)
    parsed = [rans_codec._parse_payload(pp, L) for pp in payloads]
    sizes2 = np.stack([s for s, _, _ in parsed])
    region = b"".join(bytes(r) for _, _, r in parsed)
    flat_sz = sizes2.reshape(-1)
    H = np.concatenate([[0], np.cumsum(flat_sz)])[:-1]
    a_row = (H >> 8).astype(np.int64)
    b_row = (H + flat_sz + 255) >> 8
    rpad = rans_codec._rpad_for(int((b_row - a_row).max(initial=1)))
    R = -(-max(-(-len(region) // 512), 1) // 8) * 8
    ridx = np.minimum(a_row[:, None] + np.arange(rpad)[None, :],
                      max(R - 1, 0)).astype(np.int32).reshape(-1)
    starts = (H & 255).astype(np.int32).reshape(ng, NT)
    buf = np.zeros(R * 512, np.uint8)
    buf[: len(region)] = np.frombuffer(region, np.uint8)
    pre8 = np.zeros((ng, G, 8), np.uint8)
    for g, (_, p6, _) in enumerate(parsed):
        pre8[g, :, :6] = np.frombuffer(p6, np.uint8).reshape(G, 6)
    x = pre8.reshape(ng, G * 8).view("<u8")
    wpre = np.empty((ng, 2 * G), np.uint32)
    wpre[:, 0::2] = (x & 0xFFFFFFFF).astype(np.uint32)
    wpre[:, 1::2] = (x >> 32).astype(np.uint32)

    stream_rows = jax.device_put(jnp.asarray(buf.view("<u4").reshape(R, 128)))
    ridx_d = jax.device_put(jnp.asarray(ridx))
    starts_d = jax.device_put(jnp.asarray(starts))
    pre_d = jax.device_put(jnp.asarray(wpre.reshape(ng, 2 * G // 128, 128)))
    jax.block_until_ready([stream_rows, ridx_d, starts_d, pre_d])

    padded = timed("pad_gather", lambda: rans_codec._pad_stream(
        stream_rows, ridx_d, ng=ng, nt=NT, rpad=rpad))
    sym_out = timed("decode_kernel", lambda: rans_decode_tiled(
        padded, starts_d, pre_d, cum_vreg, block_len=L, a_count=256))
    timed("finalize_u8", lambda: rans_codec._finalize(
        sym_out, out_dtype=jnp.uint8))

    fused_dec = jax.jit(lambda sr, ri, st, pr: rans_codec._finalize(
        rans_decode_tiled(
            rans_codec._pad_stream.__wrapped__(sr, ri, ng=ng, nt=NT,
                                               rpad=rpad),
            st, pr, cum_vreg, block_len=L, a_count=256),
        out_dtype=jnp.uint8))
    out = timed("decode_fused", lambda: fused_dec(
        stream_rows, ridx_d, starts_d, pre_d))
    assert np.array_equal(
        np.asarray(out).reshape(ng * G, L),
        data.reshape(ng * G, L).astype(np.uint8)), "round trip failed"
    log("round trip OK")


if __name__ == "__main__":
    main()
