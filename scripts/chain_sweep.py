"""Sweep the decode chain-interleave factor x group geometry (real TPU).

    python scripts/chain_sweep.py [MB]

Round 5: the decode kernel's per-step chain is latency-bound (~900
dependent cycles at G=2048 — docs/hardware_runs.md), so the kernel now
interleaves C independent group chains per grid step
(kernels/rans_decode.py).  This sweep measures the decode kernel across
(group_lanes, lane_len, chains) to pick the shipping geometry, and
byte-verifies one round trip per geometry so the hardware path (not just
interpret mode) is checked.

Fetch-forced timing (see scripts/encode_ablation.py for why
block_until_ready alone cannot be trusted on this tunnel).
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

    n = mb << 20
    rng = np.random.default_rng(0)
    ranks = np.arange(1, 257)
    p = 1.0 / ranks**1.2
    p /= p.sum()
    data = rng.choice(256, size=n, p=p).astype(np.int32)
    t = table_from_data_pow2(data, 256, 16)
    cum_vreg = jnp.asarray(prep_cum_vreg(t.cum))
    gb = n / 1e9
    log(f"device {jax.devices()[0]}; corpus {gb:.3f} GB")

    combos = [(2048, 32768), (2048, 8192), (1024, 32768), (1024, 16384),
              (1024, 8192), (512, 16384)]
    env = os.environ.get("COMBOS")
    if env:  # e.g. COMBOS=2048x32768,1024x8192
        combos = [tuple(map(int, c.split("x"))) for c in env.split(",")]

    accum = jax.jit(lambda a, o: a + jnp.sum(o.astype(jnp.int32)[:1, :1, :128]))
    results = []
    for (G, L) in combos:
        ng = n // (G * L)
        if ng < 1:
            continue
        nfit = ng * G * L
        rows = data[:nfit].reshape(ng * G, L)
        payloads = rans_codec.encode_groups(rows, t, L, 0, G)
        parsed = [rans_codec._parse_payload(pp, L, G) for pp in payloads]
        sizes = np.stack([s for s, _, _ in parsed])
        region = b"".join(bytes(r) for _, _, r in parsed)
        rows_np, ridx, starts, rpad = rans_codec._stage_stream_windows(
            sizes, region, G)
        wpre = rans_codec._states_to_words([p6 for _, p6, _ in parsed], G)
        NT = sizes.shape[1]

        stream_rows = jax.device_put(jnp.asarray(rows_np))
        starts_d = jax.device_put(jnp.asarray(starts))
        pre0 = jax.device_put(jnp.asarray(wpre))
        pad = jax.jit(lambda sr, ri: jnp.take(sr, ri, axis=0).reshape(
            ng, NT, rpad, 128), static_argnums=())
        padded = jax.block_until_ready(pad(stream_rows,
                                           jax.device_put(jnp.asarray(ridx))))
        log(f"G={G} L={L}: ng={ng} NT={NT} rpad={rpad} staged")

        perturb = jax.jit(lambda p0, z: p0.at[0, 0, 0].set(
            p0[0, 0, 0] + (z >> 31).astype(jnp.uint32)))
        acc0 = jax.device_put(jnp.int32(0))

        # one round-trip verification per geometry (chains = auto max)
        cmax = 1
        for c in (8, 4, 2):
            if ng % c == 0 and rans_codec._pick_chains(
                    ng, G // 128, rpad, L // NT) >= c:
                cmax = c
                break
        out = rans_decode_tiled(padded, starts_d, pre0, cum_vreg,
                                block_len=L, a_count=256, chains=cmax)
        got = np.asarray(out).reshape(ng * G, L)
        ok = np.array_equal(got, rows)
        log(f"G={G} L={L} chains={cmax}: roundtrip {'OK' if ok else 'FAIL'}")
        if not ok:
            continue

        for chains in (1, 2, 4, 8):
            if ng % chains:
                continue
            try:
                fn = lambda p, c=chains: rans_decode_tiled(
                    padded, starts_d, p, cum_vreg, block_len=L,
                    a_count=256, chains=c)
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
                gbw = nfit / 1e9
                log(f"G={G:5d} L={L:6d} C={chains}: {best * 1e3:8.2f} ms "
                    f"({gbw / best:7.3f} GB/s)")
                results.append((G, L, chains, best * 1e3, gbw / best))
            except Exception as e:
                log(f"G={G} L={L} C={chains}: FAILED {type(e).__name__}: "
                    f"{str(e)[:200]}")

    log("--- summary (GB/s) ---")
    for G, L, c, ms, gbps in sorted(results, key=lambda r: -r[4]):
        log(f"G={G:5d} L={L:6d} C={c}: {ms:8.2f} ms  {gbps:7.3f} GB/s")


if __name__ == "__main__":
    main()
