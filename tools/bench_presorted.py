"""Presorted-runs count experiment (VERDICT round-2 item 2).

Hypothesis under test: per-batch scans could emit sorted, locally
deduplicated (key, count) runs at the FAST small-size sort rate, shrink
the data ~coverage-fold, and finish with cheap merge levels -- moving the
count headline past the monolithic-sort rate.

This harness measures the scheme's LOWER BOUND against the monolithic
count on the same coverage workload, per NOTES.md methodology (loops
inside one jit, scalar readback as the only sync):

  A. monolithic: ONE lax.sort + group/prune over all N records
     (ops/count.count_keys -- the production path).
  B. batch stage only: per-chunk sort + dedup-compact
     (count_keys + kept_keys_sorted per chunk), NO merge.  Every variant
     of the presorted-runs scheme must pay at least this, so
     t_B >= t_A refutes the scheme without building the merge.

Also reported: the measured per-chunk dedup shrink (bounds the merge
volume) and the modeled merge cost at the measured merge-path level rate
(NOTES.md: ~830M elem/s/level), so the writeup's totals are
arithmetic over measured numbers only.

  python tools/bench_presorted.py --records 50e6 --genome 4.6e6 --chunk 2097152
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--records", type=float, default=50e6,
                    help="total window records N")
    ap.add_argument("--genome", type=float, default=4.6e6,
                    help="genome length (sets the coverage duplication)")
    ap.add_argument("--chunk", type=int, default=1 << 21,
                    help="records per presorted run (the fast-sort size)")
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--k", type=int, default=31)
    ap.add_argument("--m", type=int, default=7)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    from genome_assembly_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    from genome_assembly_tpu.ops import count as count_ops
    from genome_assembly_tpu.ops import minimizer

    K, M = args.k, args.m
    LEN = 128
    n_win = LEN - K + 1
    G = int(args.genome)
    rows_total = int(args.records / n_win)
    chunk_rows = max(1, args.chunk // n_win)
    rows_total = (rows_total // chunk_rows) * chunk_rows
    n_chunks = rows_total // chunk_rows
    N = rows_total * n_win
    chunk_records = chunk_rows * n_win

    key = jax.random.PRNGKey(0)
    kg, kr = jax.random.split(key)
    genome = jax.random.randint(kg, (G,), 0, 4, dtype=jnp.int32).astype(jnp.uint8)

    def emit(**kw):
        print(json.dumps(kw), flush=True)

    emit(event="config", records=N, genome=G, chunks=n_chunks,
         chunk_records=chunk_records,
         expected_coverage=round(N / G, 1))

    @jax.jit
    def scan_rows(genome, kb, n_rows_i):
        starts = jax.random.randint(kb, (chunk_rows,), 0, G - LEN, jnp.int32)
        offs = jax.lax.broadcasted_iota(jnp.int32, (chunk_rows, LEN), 1)
        codes = genome[starts[:, None] + offs]
        recs = minimizer.fast_scan(
            codes, jnp.full((chunk_rows,), LEN, jnp.int32), k=K, m=M
        )
        sent = jnp.uint32(0xFFFFFFFF)
        hi = jnp.where(recs.valid, recs.kmer_hi, sent).reshape(-1)
        lo = jnp.where(recs.valid, recs.kmer_lo, sent).reshape(-1)
        return hi, lo

    # materialize the full record set once (untimed)
    his, los = [], []
    for c in range(n_chunks):
        hi, lo = scan_rows(genome, jax.random.fold_in(kr, c), c)
        his.append(hi)
        los.append(lo)
    hi_all = jnp.concatenate(his)
    lo_all = jnp.concatenate(los)
    float(hi_all[-1])

    def records(hi, lo):
        return minimizer.WindowRecords(
            mmer=jnp.zeros((0,), jnp.uint32), kmer_hi=hi, kmer_lo=lo,
            valid=hi != jnp.uint32(0xFFFFFFFF),
        )

    @jax.jit
    def monolithic(hi, lo, iters):
        def body(i, acc):
            h = hi ^ (i.astype(jnp.uint32) & 1)  # defeat caching
            kc = count_ops.count_keys(records(h, lo), cutoff=1)
            return acc + jnp.sum(kc.keep).astype(jnp.uint32)
        return jax.lax.fori_loop(jnp.int32(0), iters, body, jnp.uint32(0))

    @jax.jit
    def batch_stage(hi, lo, iters):
        """Per-chunk sort + dedup-compact: the scheme's mandatory floor."""
        h2 = hi.reshape(n_chunks, chunk_records)
        l2 = lo.reshape(n_chunks, chunk_records)

        def body(i, acc):
            def chunk(c, acc2):
                ch = lax.dynamic_slice_in_dim(h2, c, 1)[0] ^ (
                    i.astype(jnp.uint32) & 1
                )
                cl = lax.dynamic_slice_in_dim(l2, c, 1)[0]
                kc = count_ops.count_keys(records(ch, cl), cutoff=0)
                khi, klo, valid = count_ops.kept_keys_sorted(kc)
                return acc2 + jnp.sum(valid).astype(jnp.uint32)
            return jax.lax.fori_loop(
                jnp.int32(0), jnp.int32(n_chunks), chunk, acc
            )
        return jax.lax.fori_loop(jnp.int32(0), iters, body, jnp.uint32(0))

    from jax import lax

    def timed(fn, iters):
        t0 = time.perf_counter()
        float(fn(hi_all, lo_all, jnp.int32(iters)))
        return time.perf_counter() - t0

    results = {}
    for name, fn in (("monolithic", monolithic), ("batch_stage", batch_stage)):
        timed(fn, 1)  # compile+warm
        lo_t = timed(fn, 1)
        hi_t = timed(fn, 1 + args.iters)
        per = (hi_t - lo_t) / args.iters
        if per <= 0:
            per = timed(fn, args.iters) / args.iters
        results[name] = per
        emit(event=name, wall_s=round(per, 4),
             records_per_s=round(N / per, 1))

    # measured shrink: distinct per chunk / chunk records (merge volume bound)
    kc = count_ops.count_keys(
        records(his[0], los[0]), cutoff=0
    )
    distinct0 = int(jnp.sum(kc.group_start & kc.valid))
    shrink = chunk_records / max(distinct0, 1)
    # merge model: pairwise levels over compacted runs, re-dedup saturating
    # at the genome's distinct count, at the measured level rate
    level_rate = 830e6  # NOTES.md merge-path level throughput
    vol = 0.0
    per_run = distinct0
    runs = n_chunks
    span = chunk_records
    import math

    while runs > 1:
        vol += per_run * runs  # elements flowing through this level
        runs = (runs + 1) // 2
        span *= 2
        per_run = min(2 * per_run, G * (1 - math.exp(-span / G)) + 1)
    t_merge_model = vol / level_rate
    emit(
        event="model",
        chunk_distinct=distinct0,
        chunk_shrink=round(shrink, 2),
        merge_volume=int(vol),
        t_merge_model_s=round(t_merge_model, 4),
        t_scheme_floor_s=round(results["batch_stage"], 4),
        t_scheme_model_s=round(results["batch_stage"] + t_merge_model, 4),
        t_monolithic_s=round(results["monolithic"], 4),
        verdict=(
            "scheme loses: floor alone >= monolithic"
            if results["batch_stage"] >= results["monolithic"]
            else "floor below monolithic; merge decides"
        ),
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
