"""Throwaway microbench: isolate where encode-kernel cycles go on the chip.

Variants: full kernel / no-lookup (synthetic c,cum) / lookup-only /
store-only.  Usage: python scripts/micro_kernel_bench.py [MB]
"""
import functools
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from range_coder_rust_tpu.kernels.decode_pallas import _bcast_rows, _lookup_rows, prep_cum_vreg
from range_coder_rust_tpu.ops.transition import CoderState, init_state, param_update_pow2
from range_coder_rust_tpu.ops.u64 import U64
from range_coder_rust_tpu.models.table import table_from_data_pow2

_U32, _I32 = jnp.uint32, jnp.int32


def make_kernel(mode, k, tile, v):
    static = mode.endswith("_static")
    hint = mode.endswith("_hint")
    mode = mode.split("_")[0]

    def kern(cum_ref, sym_ref, out_ref, st_ref):
        tau = pl.program_id(1)

        @pl.when(tau == 0)
        def _():
            st0 = init_state((v, 8, 128))
            st_ref[0], st_ref[1] = st0.low.hi, st0.low.lo
            st_ref[2], st_ref[3] = st0.rng.hi, st0.rng.lo

        cum_rows = _bcast_rows(cum_ref[:])

        def body(t, carry):
            if static:
                t_rows = t * 8  # python int
            elif hint:
                t_rows = pl.multiple_of(t * 8, 8)
            else:
                t_rows = t * 8
            lhi, llo, rhi, rlo = carry
            st = CoderState(U64(lhi, llo), U64(rhi, rlo))
            sym = sym_ref[:, pl.ds(t_rows, 8), :]
            if mode in ("full", "lookup"):
                cum_s = _lookup_rows(cum_rows, sym)
                cum_n = _lookup_rows(cum_rows, sym + 1)
                cc = cum_n - cum_s
            else:  # synthetic table values, no gathers
                cum_s = (sym.astype(_U32) * _U32(255)) & _U32(0xFFFF)
                cc = (sym.astype(_U32) & _U32(7)) + _U32(1)
            if mode in ("full", "math"):
                st, emit, n = param_update_pow2(st, cc, cum_s, k)
                out_ref[:, pl.ds(t_rows, 8), :] = emit.hi ^ emit.lo ^ n.astype(_U32)
                return (st.low.hi, st.low.lo, st.rng.hi, st.rng.lo)
            else:  # lookup/store only
                out_ref[:, pl.ds(t_rows, 8), :] = cum_s + cc
                return (lhi, llo, rhi, rlo)

        init = (st_ref[0], st_ref[1], st_ref[2], st_ref[3])
        if static:
            st = init
            for tt in range(tile):
                st = body(tt, st)
        else:
            st = jax.lax.fori_loop(0, tile, body, init)
        st_ref[0], st_ref[1], st_ref[2], st_ref[3] = st

    return kern


def run(mode, syms, cum_vreg, k, L, tile, v):
    NG = syms.shape[0]

    @jax.jit
    def go(s, cv):
        return pl.pallas_call(
            make_kernel(mode, k, tile, v),
            grid=(NG // v, L // tile),
            out_shape=jax.ShapeDtypeStruct((NG, L * 8, 128), _U32),
            in_specs=[
                pl.BlockSpec((8, 128), lambda g, t: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((v, tile * 8, 128), lambda g, t: (g, t, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((v, tile * 8, 128), lambda g, t: (g, t, 0), memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((4, v, 8, 128), _U32)],
        )(cv, s)

    out = go(syms, cum_vreg)
    jax.block_until_ready(out)
    chk = int(np.asarray(out[0, :8, :]).sum())  # warmup sanity fetch only:
    # a host fetch between timed reps adds a ~23 ms axon round-trip to the
    # NEXT dispatch, poisoning the measurement
    print(f"  (chk={chk})", file=sys.stderr)
    ts = []
    for _ in range(5):
        t0 = time.time()
        out = go(syms, cum_vreg)
        jax.block_until_ready(out)
        ts.append(time.time() - t0)
    return min(ts)


def main():
    mb = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    L, k = 512, 16
    n = mb << 20
    B = n // L
    NG = B // 1024
    rng = np.random.default_rng(7)
    data = rng.integers(0, 256, size=(B, L)).astype(np.int32)
    t = table_from_data_pow2(data, 256, k)
    s = data.reshape(NG, 8, 128, L).transpose(0, 3, 1, 2).reshape(NG, L * 8, 128)
    syms = jnp.asarray(s)
    cum_vreg = jnp.asarray(prep_cum_vreg(t.cum))
    for v in (1, 4):
        if NG % v:
            continue
        for mode in ("store", "store_static", "store_hint", "full", "full_static"):
            dt = run(mode, syms, cum_vreg, k, L, 64, v)
            print(f"v={v} mode={mode:6s}: {dt*1e3:7.1f} ms  ({n/1e9/dt:.3f} GB/s)",
                  file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()
