"""Primitive microbenchmarks on the live chip, to pick the count-kernel design.

Measures (same methodology as tools/bench_phases.py):
  - XLA scatter-add and gather at 1.6M random u32 indices (hash-table
    feasibility: if scatter is sort-priced, hash counting is pointless);
  - lax.sort along the last axis of [256, 8192] and [1536, 1024] two-lane
    rows (the "radix-partition then row-sort" endgame cost);
  - 2-lane sort at 12.6M elements (ecoli-scale scaling factor);
  - whether Mosaic supports dynamic lane gather (take_along_axis) inside a
    Pallas kernel, and its cost (enables merge-path / stream compaction).
"""

from __future__ import annotations

import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main() -> None:
    from genome_assembly_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np

    N = 16384 * 97  # match bench.py's window count (1.59M)

    dev = jax.devices()[0]
    print(json.dumps({"phase": "env", "device": str(dev), "n": N}), flush=True)
    rng = np.random.default_rng(0)
    hi0 = jax.device_put(
        jnp.asarray(rng.integers(0, 1 << 30, size=N, dtype=np.uint32)), dev
    )
    lo0 = jax.device_put(
        jnp.asarray(rng.integers(0, 1 << 32, size=N, dtype=np.uint32)), dev
    )
    idx0 = jax.device_put(
        jnp.asarray(rng.integers(0, N, size=N, dtype=np.int32)), dev
    )

    def run(name, loop_fn, *args, denom=N):
        try:
            t0 = time.perf_counter()
            float(loop_fn(*args, jnp.int32(1)))
            compile_s = time.perf_counter() - t0

            def timed(iters):
                t0 = time.perf_counter()
                float(loop_fn(*args, jnp.int32(iters)))
                return time.perf_counter() - t0

            d_lo = timed(4)
            d_hi = timed(54)
            per_iter = (d_hi - d_lo) / 50
            if per_iter <= 0:
                per_iter = timed(50) / 50
            print(
                json.dumps(
                    {
                        "phase": name,
                        "per_iter_ms": round(per_iter * 1e3, 3),
                        "elems_per_s": round(denom / per_iter, 1),
                        "compile_s": round(compile_s, 1),
                    }
                ),
                flush=True,
            )
        except Exception as e:  # keep probing the rest
            print(json.dumps({"phase": name, "error": repr(e)[:300]}), flush=True)

    @jax.jit
    def scatter_add_loop(idx, iters):
        def body(i, acc):
            ix = (idx + i) % N
            t = jnp.zeros(N, jnp.uint32).at[ix].add(jnp.uint32(1))
            return acc + jnp.sum(t, dtype=jnp.uint32)
        return jax.lax.fori_loop(jnp.int32(0), iters, body, jnp.uint32(0))

    @jax.jit
    def scatter_min_loop(idx, vals, iters):
        def body(i, acc):
            ix = (idx + i) % N
            t = jnp.full(N, 0xFFFFFFFF, jnp.uint32).at[ix].min(vals ^ i.astype(jnp.uint32))
            return acc + jnp.sum(t, dtype=jnp.uint32)
        return jax.lax.fori_loop(jnp.int32(0), iters, body, jnp.uint32(0))

    @jax.jit
    def gather_loop(idx, vals, iters):
        def body(i, acc):
            ix = (idx + i) % N
            return acc + jnp.sum(vals[ix], dtype=jnp.uint32)
        return jax.lax.fori_loop(jnp.int32(0), iters, body, jnp.uint32(0))

    def rowsort_loop(rows, cols):
        @jax.jit
        def f(hi, lo, iters):
            h2 = hi[: rows * cols].reshape(rows, cols)
            l2 = lo[: rows * cols].reshape(rows, cols)

            def body(i, acc):
                h = h2 ^ i.astype(jnp.uint32)
                l = l2 ^ i.astype(jnp.uint32)
                hs, ls = jax.lax.sort((h, l), dimension=1, num_keys=2)
                return (
                    acc
                    + jnp.sum(hs, dtype=jnp.uint32)
                    + jnp.sum(ls, dtype=jnp.uint32)
                )
            return jax.lax.fori_loop(jnp.int32(0), iters, body, jnp.uint32(0))
        return f

    run("scatter_add_1.6M", scatter_add_loop, idx0)
    run("scatter_min_1.6M", scatter_min_loop, idx0, lo0)
    run("gather_1.6M", gather_loop, idx0, lo0)
    run("rowsort_192x8192", rowsort_loop(192, 8192), hi0, lo0,
        denom=192 * 8192)
    run("rowsort_1536x1024", rowsort_loop(1536, 1024), hi0, lo0,
        denom=1536 * 1024)

    # 12.6M-element 2-lane sort (ecoli-scale scaling factor)
    hi8 = jnp.concatenate([hi0] * 8)
    lo8 = jnp.concatenate([lo0] * 8)

    @jax.jit
    def sort_big_loop(hi, lo, iters):
        def body(i, acc):
            h = hi ^ i.astype(jnp.uint32)
            l = lo ^ i.astype(jnp.uint32)
            hs, ls = jax.lax.sort((h, l), num_keys=2)
            return acc + jnp.sum(hs, dtype=jnp.uint32) + jnp.sum(ls, dtype=jnp.uint32)
        return jax.lax.fori_loop(jnp.int32(0), iters, body, jnp.uint32(0))

    run("sort2_12.6M", sort_big_loop, hi8, lo8, denom=8 * N)

    # --- Pallas dynamic lane gather probe ---
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def gk(x_ref, i_ref, o_ref):
        o_ref[:, :] = jnp.take_along_axis(x_ref[:, :], i_ref[:, :], axis=1)

    def pallas_gather(x, idx):
        return pl.pallas_call(
            gk,
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x, idx)

    for cols in (128, 1024):
        try:
            rows = 256
            x = (hi0[: rows * cols]).reshape(rows, cols)
            gidx = (idx0[: rows * cols].reshape(rows, cols) % cols).astype(jnp.int32)
            out = pallas_gather(x, gidx)
            want = jnp.take_along_axis(x, gidx, axis=1)
            ok = bool(jnp.array_equal(out, want))
            print(
                json.dumps({"phase": f"pallas_lane_gather_c{cols}", "ok": ok}),
                flush=True,
            )
        except Exception as e:
            print(
                json.dumps(
                    {"phase": f"pallas_lane_gather_c{cols}", "error": repr(e)[:300]}
                ),
                flush=True,
            )


if __name__ == "__main__":
    sys.exit(main())
