"""Gather-shape microbench: can pointer jumping pack its 3 gathers into 1?

Measures, at pointer-jump-realistic sizes: 3 separate 1-D gathers vs one
row gather from a [N, 4] table (XLA TPU gathers appear scalar-core bound,
so fewer/wider gather ops may win ~3x on the extension phase).
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

    N = 1 << 21
    dev = jax.devices()[0]
    print(json.dumps({"phase": "env", "device": str(dev), "n": N}), flush=True)
    rng = np.random.default_rng(0)
    idx0 = jax.device_put(jnp.asarray(rng.integers(0, N, N, dtype=np.int32)), dev)
    t1 = jax.device_put(jnp.asarray(rng.integers(0, N, N, dtype=np.int32)), dev)
    t2 = jax.device_put(jnp.asarray(rng.integers(0, N, N, dtype=np.int32)), dev)
    t3 = jax.device_put(jnp.asarray(rng.integers(0, N, N, dtype=np.int32)), dev)
    t4 = jnp.stack([t1, t2, t3, t1], axis=1)  # [N, 4]

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
            d_hi = timed(24)
            per_iter = (d_hi - d_lo) / 20
            if per_iter <= 0:
                per_iter = timed(20) / 20
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
        except Exception as e:
            print(json.dumps({"phase": name, "error": repr(e)[:200]}), flush=True)

    @jax.jit
    def three_gathers(a, b, c, idx, iters):
        def body(i, acc):
            ix = (idx + i) % N
            return acc + jnp.sum(a[ix] + b[ix] + c[ix], dtype=jnp.int32)
        return jax.lax.fori_loop(jnp.int32(0), iters, body, jnp.int32(0))

    @jax.jit
    def row_gather(t4, idx, iters):
        def body(i, acc):
            ix = (idx + i) % N
            rows = t4[ix]
            return acc + jnp.sum(rows, dtype=jnp.int32)
        return jax.lax.fori_loop(jnp.int32(0), iters, body, jnp.int32(0))

    @jax.jit
    def one_gather(a, idx, iters):
        def body(i, acc):
            ix = (idx + i) % N
            return acc + jnp.sum(a[ix], dtype=jnp.int32)
        return jax.lax.fori_loop(jnp.int32(0), iters, body, jnp.int32(0))

    run("gather_1lane", one_gather, t1, idx0)
    run("gather_3x1lane", three_gathers, t1, t2, t3, idx0)
    run("gather_rows4", row_gather, t4, idx0)

    # sorted (near-contiguous) indices: does locality help the gather?
    idx_sorted = jnp.sort(idx0)
    run("gather_1lane_sorted", one_gather, t1, idx_sorted)


if __name__ == "__main__":
    sys.exit(main())
