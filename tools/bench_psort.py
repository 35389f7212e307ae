"""ops/bitonic_pallas.sort_pairs vs lax.sort on the live chip."""

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

    from genome_assembly_tpu.ops import bitonic_pallas as bp

    N = 16384 * 97
    dev = jax.devices()[0]
    print(json.dumps({"phase": "env", "device": str(dev), "n": N}), flush=True)
    rng = np.random.default_rng(0)
    hi0 = jax.device_put(
        jnp.asarray(rng.integers(0, 1 << 30, size=N, dtype=np.uint32)), dev
    )
    lo0 = jax.device_put(
        jnp.asarray(rng.integers(0, 1 << 32, size=N, dtype=np.uint32)), dev
    )

    # correctness on-chip at full size first
    hs, ls = bp.sort_pairs(hi0, lo0)
    ws, wl = jax.lax.sort((hi0, lo0), num_keys=2)
    ok = bool(jnp.array_equal(hs, ws) and jnp.array_equal(ls, wl))
    print(json.dumps({"phase": "correct_full", "ok": ok}), flush=True)
    if not ok:
        d = int(jnp.sum(hs != ws))
        print(json.dumps({"phase": "diag", "hi_mismatches": d}), flush=True)
        return

    def run(name, loop_fn, *args, denom=N):
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

    def psort_loop(cr, w):
        @jax.jit
        def f(hi, lo, iters):
            def body(i, acc):
                h = hi ^ i.astype(jnp.uint32)
                l = lo ^ i.astype(jnp.uint32)
                hs, ls = bp.sort_pairs(h, l, chunk_rows=cr, width=w)
                return (
                    acc + jnp.sum(hs, dtype=jnp.uint32) + jnp.sum(ls, dtype=jnp.uint32)
                )
            return jax.lax.fori_loop(jnp.int32(0), iters, body, jnp.uint32(0))
        return f

    run("psort_128x1024", psort_loop(128, 1024), hi0, lo0)
    run("psort_256x1024", psort_loop(256, 1024), hi0, lo0)
    run("psort_64x1024", psort_loop(64, 1024), hi0, lo0)

    # 12.6M scale
    hi8 = jnp.concatenate([hi0] * 8)
    lo8 = jnp.concatenate([lo0] * 8)
    run("psort_12.6M", psort_loop(128, 1024), hi8, lo8, denom=8 * N)


if __name__ == "__main__":
    sys.exit(main())
