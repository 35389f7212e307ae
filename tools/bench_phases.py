"""Phase-split microbenchmark for the fast count pipeline on the live chip.

Times, separately: the minimizer scan, the two-lane count (sort+prune), and
raw lax.sort variants -- to locate the bottleneck before optimizing
(NOTES.md round-2 priority 1: the count is believed sort-bound).

Methodology follows bench.py: every measured loop is ONE jitted fori_loop
ending in a scalar readback (block_until_ready does not sync on the axon
relay), with per-iteration input perturbation so nothing is cached, and
reductions over full outputs so XLA cannot slice computations away.

Writes JSONL lines to stdout, one per phase.  Run alone (never concurrently
with another TPU process).
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

    from genome_assembly_tpu.ops import count as count_ops
    from genome_assembly_tpu.ops import minimizer

    K, M, CUTOFF = 31, 7, 1
    BATCH, LEN = 16384, 128
    n_windows = BATCH * (LEN - K + 1)

    dev = jax.devices()[0]
    print(json.dumps({"phase": "env", "device": str(dev)}), flush=True)
    rng = np.random.default_rng(0)
    codes = jax.device_put(
        jnp.asarray(rng.integers(0, 4, size=(BATCH, LEN), dtype=np.uint8)), dev
    )
    lengths = jax.device_put(jnp.full((BATCH,), LEN, dtype=jnp.int32), dev)

    # fixed record lanes for the count/sort-only phases
    recs0 = jax.jit(
        lambda c, l: minimizer.fast_scan(c, l, k=K, m=M)
    )(codes, lengths)
    hi0 = recs0.kmer_hi.reshape(-1)
    lo0 = recs0.kmer_lo.reshape(-1)

    def run(name, loop_fn, *args, denom=n_windows):
        t0 = time.perf_counter()
        float(loop_fn(*args, jnp.int32(1)))
        compile_s = time.perf_counter() - t0

        def timed(iters):
            t0 = time.perf_counter()
            float(loop_fn(*args, jnp.int32(iters)))
            return time.perf_counter() - t0

        d_lo = timed(4)
        d_hi = timed(104)
        per_iter = (d_hi - d_lo) / 100
        if per_iter <= 0:
            per_iter = timed(100) / 100
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

    @jax.jit
    def scan_loop(codes, lengths, iters):
        def body(i, acc):
            c = codes ^ (i.astype(jnp.uint8) & 3)
            r = minimizer.fast_scan(c, lengths, k=K, m=M)
            s = (
                jnp.sum(r.mmer, dtype=jnp.uint32)
                + jnp.sum(r.kmer_hi, dtype=jnp.uint32)
                + jnp.sum(r.kmer_lo, dtype=jnp.uint32)
            )
            return acc + s
        return jax.lax.fori_loop(jnp.int32(0), iters, body, jnp.uint32(0))

    @jax.jit
    def sort2_loop(hi, lo, iters):
        def body(i, acc):
            h = hi ^ i.astype(jnp.uint32)
            l = lo ^ i.astype(jnp.uint32)
            hs, ls = jax.lax.sort((h, l), num_keys=2)
            return acc + jnp.sum(hs, dtype=jnp.uint32) + jnp.sum(ls, dtype=jnp.uint32)
        return jax.lax.fori_loop(jnp.int32(0), iters, body, jnp.uint32(0))

    @jax.jit
    def sort1_loop(hi, lo, iters):
        def body(i, acc):
            h = hi ^ i.astype(jnp.uint32)
            hs = jax.lax.sort(h)
            return acc + jnp.sum(hs, dtype=jnp.uint32)
        return jax.lax.fori_loop(jnp.int32(0), iters, body, jnp.uint32(0))

    @jax.jit
    def count_loop(hi, lo, iters):
        from genome_assembly_tpu.ops.minimizer import WindowRecords

        def body(i, acc):
            r = WindowRecords(
                mmer=jnp.zeros_like(hi),
                kmer_hi=hi ^ i.astype(jnp.uint32),
                kmer_lo=lo ^ i.astype(jnp.uint32),
                valid=jnp.ones(hi.shape, dtype=bool),
            )
            kc = count_ops.count_keys(r, cutoff=CUTOFF)
            return acc + jnp.sum(kc.keep).astype(jnp.uint32)
        return jax.lax.fori_loop(jnp.int32(0), iters, body, jnp.uint32(0))

    run("fast_scan", scan_loop, codes, lengths)
    run("sort1_u32", sort1_loop, hi0, lo0)
    run("sort2_u32x2", sort2_loop, hi0, lo0)
    run("count_keys", count_loop, hi0, lo0)


if __name__ == "__main__":
    sys.exit(main())
