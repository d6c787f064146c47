"""Per-stage ablation of the rans16 DECODE kernel (real TPU).

    python scripts/decode_ablation.py [MB] [L]

Fetch-forced timing (see scripts/encode_ablation.py for why
block_until_ready alone cannot be trusted on this tunnel).  Variants each
remove one stage (outputs garbage; timing only):

    none     — full decode kernel
    noprobes — skip the 2 scalar + 2 gather dependent probe levels
    nosearch — skip the whole symbol search + cum/c extraction
    noprefix — constant refill ranks instead of the MXU lane prefix
    norefill — skip the stream window gather
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
    mb = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    L = int(sys.argv[2]) if len(sys.argv) > 2 else 65536
    reps = int(os.environ.get("REPS", "5"))

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    import jax.numpy as jnp
    import numpy as np

    from range_coder_rust_tpu import rans_codec
    from range_coder_rust_tpu.kernels.vreg import prep_cum_vreg
    from range_coder_rust_tpu.kernels.rans_decode import rans_decode_tiled
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
    payloads = rans_codec.encode_groups(data.reshape(ng * G, L), t, L)
    tile, NT = rans_codec._tile_geometry(L)
    parsed = [rans_codec._parse_payload(pp, L) for pp in payloads]
    sizes = np.stack([s for s, _, _ in parsed])
    region = b"".join(bytes(r) for _, _, r in parsed)
    rows_np, ridx, starts, rpad = rans_codec._stage_stream_windows(
        sizes, region, G)
    wpre = rans_codec._states_to_words([p6 for _, p6, _ in parsed], G)

    stream_rows = jax.device_put(jnp.asarray(rows_np))
    ridx_d = jax.device_put(jnp.asarray(ridx))
    starts_d = jax.device_put(jnp.asarray(starts))
    pre0 = jax.device_put(jnp.asarray(wpre))
    jax.block_until_ready([stream_rows, ridx_d, starts_d, pre0])
    log("decode inputs staged on device")

    pad = jax.jit(lambda sr, ri: jnp.take(sr, ri, axis=0).reshape(
        ng, NT, rpad, 128))
    padded = jax.block_until_ready(pad(stream_rows, ridx_d))

    # dependency-chained, fetch-forced reps: perturb pre by adding
    # (sum(out) >> 63)-style always-zero-but-opaque values
    accum = jax.jit(lambda a, o: a + jnp.sum(o.astype(jnp.int32)[:128]))
    perturb = jax.jit(lambda p0, z: p0.at[0, 0, 0].set(
        p0[0, 0, 0] + (z >> 31).astype(jnp.uint32)))
    acc0 = jax.device_put(jnp.int32(0))

    def timed(name, fn):
        jax.block_until_ready(fn(pre0))  # compile + warm
        best = None
        for _g in range(3):
            t1 = time.time()
            acc = acc0
            pre = pre0
            for _i in range(reps):
                o = fn(pre)
                acc = accum(acc, o)
                pre = perturb(pre0, acc)
            int(np.asarray(acc))
            dt = (time.time() - t1) / reps
            best = dt if best is None else min(best, dt)
        log(f"{name:12s}: {best * 1e3:8.2f} ms  ({gb / best:7.3f} GB/s)")
        return best

    results = {}
    for abl in ("none", "probes1", "hprefix", "noprobes", "nosearch", "noprefix",
                "norefill"):
        results[abl] = timed(abl, lambda p, a=abl: rans_decode_tiled(
            padded, starts_d, p, cum_vreg, block_len=L, a_count=256,
            ablate=a))

    f = results["none"]
    log("--- attribution (ms of full kernel) ---")
    log(f"probe levels : {(f - results['noprobes']) * 1e3:7.2f}")
    log(f"search total : {(f - results['nosearch']) * 1e3:7.2f}")
    log(f"lane prefix  : {(f - results['noprefix']) * 1e3:7.2f}")
    log(f"window gather: {(f - results['norefill']) * 1e3:7.2f}")


if __name__ == "__main__":
    main()
