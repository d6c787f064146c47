"""Per-stage ablation of the rans16 ENCODE kernel (real TPU).

    python scripts/encode_ablation.py [MB] [L]

Times the full encode kernel and five ablated variants (each removes one
stage, keeping the removed stage's inputs live via a cheap accumulator so
Mosaic cannot dead-code the rest).  The deltas attribute kernel time:

    full     - nowrite   = dyn-roll + two blend-window RMW writes
    nowrite  - nocompact = the 10 binary routing rounds
    nocompact- noprefix  = the MXU lane-prefix sum
    noprefix - nodiv     ~ the Barrett divide tree
    nodiv    - nolut     ~ per-step table reads (hoisted gather + slices)
    nolut                ~ renorm + state update + loop overhead

Outputs are garbage for the ablated variants — only timing is meaningful.
Each rep uses a distinct device input (dedup-proof; see memory notes on
axon dispatch dedup).
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
    from range_coder_rust_tpu.kernels.vreg import (
        prep_cum_vreg, symbols_to_step_major)
    from range_coder_rust_tpu.kernels.rans_encode import (
        barrett_rows, rans_encode_tiled)
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
    enc_aux = jnp.asarray(barrett_rows(t.c))
    rows_u8 = jax.device_put(jnp.asarray(
        data.reshape(ng * G, L).astype(np.uint8)))
    jax.block_until_ready(rows_u8)

    sm = jax.jit(lambda r: symbols_to_step_major(r.astype(jnp.int32)))
    sym0 = jax.block_until_ready(sm(rows_u8))

    # Honest timing over the axon tunnel needs BOTH:
    #  * a data dependency chaining rep i+1's input on rep i's output
    #    (the backend dedups identical dispatches; `& 0` folds away, so
    #    use `>> 31` — always 0 for these sizes but opaque to XLA);
    #  * a final HOST FETCH of a value that depends on every rep
    #    (block_until_ready alone returned in ~0.1 ms for a kernel whose
    #    serial step chain alone is > 1 ms — it does not track tunnel
    #    execution; a fetch cannot lie).
    perturb = jax.jit(
        lambda s, z, i: s.at[0, 0, 0].set(
            (z[0, 0] >> 31).astype(jnp.int32) + (i % 200)))
    accum = jax.jit(lambda a, z: a + jnp.sum(z))
    acc0 = jax.device_put(jnp.int32(0))

    def timed(name, fn):
        jax.block_until_ready(fn(sym0))  # compile + warm
        int(np.asarray(accum(acc0, fn(sym0)[2])))
        best = None
        for g in range(3):
            cur = jax.block_until_ready(perturb(sym0, fn(sym0)[2], 997 + g))
            t1 = time.time()
            acc = acc0
            for i in range(reps):
                o = fn(cur)
                acc = accum(acc, o[2])
                cur = perturb(sym0, o[2], g * reps + i + 1)
            int(np.asarray(acc))  # forces every rep to really finish
            dt = (time.time() - t1) / reps
            best = dt if best is None else min(best, dt)
        log(f"{name:12s}: {best * 1e3:8.2f} ms  ({gb / best:7.3f} GB/s)")
        return best

    results = {}
    for abl in ("none", "nowrite", "nocompact", "noprefix", "nodiv",
                "nolut"):
        results[abl] = timed(abl, lambda s, a=abl: rans_encode_tiled(
            s, cum_vreg, enc_aux, block_len=L, a_count=256, ablate=a))

    f = results["none"]
    log("--- attribution (ms of full kernel) ---")
    log(f"blend writes : {(f - results['nowrite']) * 1e3:7.2f}")
    log(f"routing      : {(results['nowrite'] - results['nocompact']) * 1e3:7.2f}")
    log(f"lane prefix  : {(results['nocompact'] - results['noprefix']) * 1e3:7.2f}")
    log(f"barrett div  : {(results['noprefix'] - results['nodiv']) * 1e3:7.2f}")
    log(f"table reads  : {(results['nodiv'] - results['nolut']) * 1e3:7.2f}")
    log(f"state+renorm : {results['nolut'] * 1e3:7.2f}")


if __name__ == "__main__":
    main()
