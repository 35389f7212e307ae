"""Compare ops/bitonic.merge_sort_pairs against lax.sort on the live chip."""

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

    from genome_assembly_tpu.ops import bitonic

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
        except Exception as e:
            print(json.dumps({"phase": name, "error": repr(e)[:300]}), flush=True)

    def msort_loop(base, m=1):
        nn = N // m

        @jax.jit
        def f(hi, lo, iters):
            def body(i, acc):
                h = hi[:nn] ^ i.astype(jnp.uint32)
                l = lo[:nn] ^ i.astype(jnp.uint32)
                hs, ls = bitonic.merge_sort_pairs(h, l, base=base)
                return (
                    acc + jnp.sum(hs, dtype=jnp.uint32) + jnp.sum(ls, dtype=jnp.uint32)
                )
            return jax.lax.fori_loop(jnp.int32(0), iters, body, jnp.uint32(0))
        return f

    def flat_loop(m):
        nn = N // m

        @jax.jit
        def f(hi, lo, iters):
            def body(i, acc):
                h = hi[:nn] ^ i.astype(jnp.uint32)
                l = lo[:nn] ^ i.astype(jnp.uint32)
                hs, ls = jax.lax.sort((h, l), num_keys=2)
                return (
                    acc + jnp.sum(hs, dtype=jnp.uint32) + jnp.sum(ls, dtype=jnp.uint32)
                )
            return jax.lax.fori_loop(jnp.int32(0), iters, body, jnp.uint32(0))
        return f

    # correctness probe on-chip first (tiny)
    hs, ls = bitonic.merge_sort_pairs(hi0[:8192], lo0[:8192], base=1024)
    ws, wl = jax.lax.sort((hi0[:8192], lo0[:8192]), num_keys=2)
    print(
        json.dumps(
            {
                "phase": "correct_8192",
                "ok": bool(jnp.array_equal(hs, ws) and jnp.array_equal(ls, wl)),
            }
        ),
        flush=True,
    )

    run("msort_base1024", msort_loop(1024), hi0, lo0)
    run("msort_base4096", msort_loop(4096), hi0, lo0)
    run("msort_base8192", msort_loop(8192), hi0, lo0)
    run("flat_400k", flat_loop(4), hi0, lo0, denom=N // 4)


if __name__ == "__main__":
    sys.exit(main())
