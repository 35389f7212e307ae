"""ops/mergepath_pallas.sort_pairs_mergepath vs lax.sort on the live chip.

Sizes chosen for the regimes that matter:
  - 2^23 (8.4M): the in-core count regime where lax.sort held 304M elem/s
    at 12.6M (NOTES.md perf ledger).
  - 2^26 (67M): the out-of-core batch regime (celegans passes sort >100M
    records; lax.sort degrades toward ~70M elem/s there).

Methodology per NOTES.md: all timing loops inside ONE jit ending in a
scalar readback; inputs perturbed per iteration.
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

    from genome_assembly_tpu.ops.mergepath_pallas import sort_pairs_mergepath

    dev = jax.devices()[0]
    print(json.dumps({"phase": "env", "device": str(dev)}), flush=True)
    rng = np.random.default_rng(0)
    NMAX = 1 << 26
    hi0 = jax.device_put(
        jnp.asarray(rng.integers(0, 1 << 30, size=NMAX, dtype=np.uint32)), dev
    )
    lo0 = jax.device_put(
        jnp.asarray(rng.integers(0, 1 << 32, size=NMAX, dtype=np.uint32)), dev
    )

    # on-chip correctness first, moderate size (2^21 exercises rowsort +
    # local levels + 4 merge-path levels with the default config)
    n_c = 1 << 21
    t0 = time.perf_counter()
    hs, ls = sort_pairs_mergepath(hi0[:n_c], lo0[:n_c])
    ws, wl = jax.lax.sort((hi0[:n_c], lo0[:n_c]), num_keys=2)
    ok = bool(jnp.array_equal(hs, ws) and jnp.array_equal(ls, wl))
    print(
        json.dumps(
            {
                "phase": "correct_2^21",
                "ok": ok,
                "wall_s": round(time.perf_counter() - t0, 1),
            }
        ),
        flush=True,
    )
    if not ok:
        d = int(jnp.sum(hs != ws))
        print(json.dumps({"phase": "diag", "hi_mismatches": d}), flush=True)
        return

    def run(name, loop_fn, n, lo_it, hi_it):
        try:
            t0 = time.perf_counter()
            float(loop_fn(hi0[:n], lo0[:n], jnp.int32(1)))
            compile_s = time.perf_counter() - t0

            def timed(iters):
                t0 = time.perf_counter()
                float(loop_fn(hi0[:n], lo0[:n], jnp.int32(iters)))
                return time.perf_counter() - t0

            d_lo = timed(lo_it)
            d_hi = timed(hi_it)
            per_iter = (d_hi - d_lo) / (hi_it - lo_it)
            if per_iter <= 0:
                per_iter = timed(hi_it - lo_it) / (hi_it - lo_it)
            print(
                json.dumps(
                    {
                        "phase": name,
                        "n": n,
                        "per_iter_ms": round(per_iter * 1e3, 3),
                        "elems_per_s": round(n / per_iter, 1),
                        "compile_s": round(compile_s, 1),
                    }
                ),
                flush=True,
            )
        except Exception as e:
            print(json.dumps({"phase": name, "error": repr(e)[:300]}), flush=True)

    def mpath_loop(**kw):
        @jax.jit
        def f(hi, lo, iters):
            def body(i, acc):
                h = hi ^ i.astype(jnp.uint32)
                l = lo ^ i.astype(jnp.uint32)
                hs, ls = sort_pairs_mergepath(h, l, **kw)
                return (
                    acc + jnp.sum(hs, dtype=jnp.uint32) + jnp.sum(ls, dtype=jnp.uint32)
                )

            return jax.lax.fori_loop(jnp.int32(0), iters, body, jnp.uint32(0))

        return f

    @jax.jit
    def lax_loop(hi, lo, iters):
        def body(i, acc):
            h = hi ^ i.astype(jnp.uint32)
            l = lo ^ i.astype(jnp.uint32)
            hs, ls = jax.lax.sort((h, l), num_keys=2)
            return acc + jnp.sum(hs, dtype=jnp.uint32) + jnp.sum(ls, dtype=jnp.uint32)

        return jax.lax.fori_loop(jnp.int32(0), iters, body, jnp.uint32(0))

    sizes = [(1 << 23, 2, 12), (1 << 26, 1, 4)]
    for n, lo_it, hi_it in sizes:
        run("lax", lax_loop, n, lo_it, hi_it)
        run("mpath", mpath_loop(), n, lo_it, hi_it)


if __name__ == "__main__":
    sys.exit(main())
