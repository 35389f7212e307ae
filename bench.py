"""Headline benchmark: canonical k-mers counted per second on one chip.

Measures the fast-mode device pipeline (canonical minimizer scan +
payload-free sort-based count + prune) in steady state on synthetic 100-bp
read batches -- the same work the reference's ingest+count phase does at
~1.25M windows/s on one Xeon core (BASELINE.md, big.txt, gcc -O2) -- plus
the unitig-extension phase (dBG link join + pointer jumping), measured by
differencing a count-only loop from a count+extension loop over the same
perturbed inputs (BASELINE.json's metric string names both phases).

Methodology notes:
- The whole measured loop runs inside ONE jitted fori_loop and ends in a
  scalar that the host reads back: on relayed/tunneled TPU backends,
  ``block_until_ready`` alone does not guarantee execution completed, so
  per-dispatch timing wildly underestimates cost.  The readback forces it.
- Each iteration perturbs the input (xor with the loop index) so no level
  of the stack can cache a previous iteration's result.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N,
   "extension_states_per_s": N, "extension_vs_baseline": N,
   "extension_fixed_states_per_s": N, "extension_fixed_vs_baseline": N}

value/vs_baseline stay the count metric (comparable across rounds);
the extension fields are the second phase of BASELINE.json's metric
string.  vs_baseline is the speedup over the reference C rate for the
matching phase.  The *_fixed fields measure links+jump at a FIXED
ecoli-preset scale (~4.6M-node path graph from a random genome) --
the rate that actually governs end-to-end runs, where the link-join
sort dominates; the differenced micro number above it runs on a
3.2M-state random-read graph and flatters by ~6x (VERDICT r2 weak #4).
"""

from __future__ import annotations

import json
import sys
import time

REFERENCE_WINDOWS_PER_S = 1.25e6  # BASELINE.md big.txt ingest, 1 core -O2
# BASELINE.md big.txt extension: 124,726 post-prune entries x 2 states in
# 18.5 s on one Xeon core (the reference walks each entry in both
# directions; states/s is the scale-free form of its rate)
REFERENCE_EXT_STATES_PER_S = 124726 * 2 / 18.5


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
    rng = np.random.default_rng(0)
    codes = jax.device_put(
        jnp.asarray(rng.integers(0, 4, size=(BATCH, LEN), dtype=np.uint8)), dev
    )
    lengths = jax.device_put(jnp.full((BATCH,), LEN, dtype=jnp.int32), dev)

    @jax.jit
    def bench_loop(codes, lengths, iters):
        def body(i, acc):
            # perturb input per iteration to defeat any result caching
            c = codes ^ (i.astype(jnp.uint8) & 3)
            recs = minimizer.fast_scan(c, lengths, k=K, m=M)
            kc = count_ops.count_keys(recs, cutoff=CUTOFF)
            return acc + jnp.sum(kc.keep).astype(jnp.uint32)
        # bounds must share one dtype (jax >= 0.9 enforces it)
        return jax.lax.fori_loop(jnp.int32(0), iters, body, jnp.uint32(0))

    # Extension phase: same scan, cutoff 0 so every distinct k-mer is a dBG
    # node (random reads share almost nothing, so cutoff 1 would leave an
    # empty graph), then sort-join links + pointer jumping.  Measured as
    # the DIFFERENCE between this loop and an identical loop without the
    # extension stages: the shared stages cancel, isolating links+jump.
    from genome_assembly_tpu.ops import dbg

    def count_stage(i, codes, lengths):
        c = codes ^ (i.astype(jnp.uint8) & 3)
        recs = minimizer.fast_scan(c, lengths, k=K, m=M)
        kc = count_ops.count_keys(recs, cutoff=0)
        return count_ops.kept_keys_sorted(kc)

    @jax.jit
    def base_loop(codes, lengths, iters):
        def body(i, acc):
            khi, klo, valid = count_stage(i, codes, lengths)
            return acc + jnp.sum(valid).astype(jnp.uint32)
        return jax.lax.fori_loop(jnp.int32(0), iters, body, jnp.uint32(0))

    @jax.jit
    def ext_loop(codes, lengths, iters):
        def body(i, acc):
            khi, klo, valid = count_stage(i, codes, lengths)
            links = dbg.build_unitig_links_join(khi, klo, valid, k=K)
            graph = dbg.pointer_jump(links)
            return (
                acc
                + jnp.sum(valid).astype(jnp.uint32)
                + jnp.sum(graph.rank).astype(jnp.uint32)
            )
        return jax.lax.fori_loop(jnp.int32(0), iters, body, jnp.uint32(0))

    def timed(fn, iters: int) -> float:
        t0 = time.perf_counter()
        # pass iters as a traced scalar so every call shares one executable
        float(fn(codes, lengths, jnp.int32(iters)))
        return time.perf_counter() - t0

    timed(bench_loop, 1)  # compile + warm
    # long paired runs so relay dispatch/readback noise (tens of ms) is
    # amortized over 100 iterations and cancels in the difference
    d_lo = timed(bench_loop, 4)
    d_hi = timed(bench_loop, 104)
    per_iter = (d_hi - d_lo) / 100
    if per_iter <= 0:  # pathological noise: amortize a single long run
        per_iter = timed(bench_loop, 100) / 100
    windows_per_s = n_windows / per_iter

    # extension: difference two loops sharing every stage but links+jump
    timed(base_loop, 1)
    timed(ext_loop, 1)
    EXT_ITERS = 20
    base_t = timed(base_loop, EXT_ITERS)
    ext_t = timed(ext_loop, EXT_ITERS)
    ext_per_iter = (ext_t - base_t) / EXT_ITERS
    # 2 states per node; every window of the random batch is distinct
    n_states = 2 * n_windows
    ext_states_per_s = n_states / max(ext_per_iter, 1e-9)

    # Fixed-scale extension (the honest headline): links + jump over an
    # ecoli-preset ~4.6M-node PATH graph -- consecutive genome k-mers, so
    # the jump really runs its doubling rounds (random-read graphs have no
    # long chains and flatter the rate).  Setup (genome -> windows ->
    # dedup) is untimed; the timed loop is exactly the phase run_scale
    # reports as "extension".
    ECOLI_G = 4_600_000
    ROWS = 4096
    stride = LEN - K + 1
    genome = jnp.asarray(
        rng.integers(0, 4, size=(ECOLI_G,), dtype=np.uint8)
    )

    @jax.jit
    def fixed_keys(genome):
        # overlapping rows covering the genome: row r starts at r*stride
        offs = jax.lax.broadcasted_iota(jnp.int32, (ROWS, LEN), 1)
        starts = (jnp.arange(ROWS, dtype=jnp.int32) * stride) % (ECOLI_G - LEN)
        codes = genome[starts[:, None] + offs]
        recs = minimizer.fast_scan(
            codes, jnp.full((ROWS,), LEN, jnp.int32), k=K, m=M
        )
        return recs

    # ~4.49M window slots per pass; 12 passes ~ 54M windows > 4.6M genome
    # (duplicates dedup in the count)
    n_fixed_passes = int(np.ceil(ECOLI_G / (ROWS * stride))) + 1
    sent = jnp.uint32(0xFFFFFFFF)
    fhis, flos = [], []
    for p in range(n_fixed_passes):
        g_roll = jnp.roll(genome, -p * ROWS * stride)
        recs = fixed_keys(g_roll)
        fhis.append(jnp.where(recs.valid, recs.kmer_hi, sent).reshape(-1))
        flos.append(jnp.where(recs.valid, recs.kmer_lo, sent).reshape(-1))
    cat_hi = jnp.concatenate(fhis)
    recs_all = minimizer.WindowRecords(
        mmer=jnp.zeros((0,), jnp.uint32),
        kmer_hi=cat_hi,
        kmer_lo=jnp.concatenate(flos),
        valid=cat_hi != sent,
    )
    kc_f = count_ops.count_keys(recs_all, cutoff=0)
    fkhi, fklo, fvalid = count_ops.kept_keys_sorted(kc_f)
    n_fixed_nodes = int(jnp.sum(fvalid))

    @jax.jit
    def fixed_ext_loop(khi, klo, valid, iters):
        def body(i, acc):
            # perturb the low lane so no stage can reuse a previous
            # iteration's sorted product (graph shape changes slightly per
            # iteration; the phase cost does not)
            klo2 = jnp.where(valid, klo ^ (i.astype(jnp.uint32) & 3), klo)
            links = dbg.build_unitig_links_join(khi, klo2, valid, k=K)
            graph = dbg.pointer_jump(links)
            return acc + jnp.sum(graph.rank).astype(jnp.uint32)
        return jax.lax.fori_loop(jnp.int32(0), iters, body, jnp.uint32(0))

    def timed_f(iters: int) -> float:
        t0 = time.perf_counter()
        float(fixed_ext_loop(fkhi, fklo, fvalid, jnp.int32(iters)))
        return time.perf_counter() - t0

    timed_f(1)  # compile + warm
    f_lo = timed_f(1)
    f_hi = timed_f(5)
    fixed_per_iter = (f_hi - f_lo) / 4
    if fixed_per_iter <= 0:
        fixed_per_iter = timed_f(4) / 4
    fixed_states_per_s = 2 * n_fixed_nodes / fixed_per_iter

    print(
        json.dumps(
            {
                "metric": "canonical_kmers_counted_per_s",
                "value": round(windows_per_s, 1),
                "unit": "kmers/s/chip",
                "vs_baseline": round(windows_per_s / REFERENCE_WINDOWS_PER_S, 2),
                "extension_states_per_s": round(ext_states_per_s, 1),
                "extension_vs_baseline": round(
                    ext_states_per_s / REFERENCE_EXT_STATES_PER_S, 2
                ),
                "extension_fixed_states_per_s": round(fixed_states_per_s, 1),
                "extension_fixed_vs_baseline": round(
                    fixed_states_per_s / REFERENCE_EXT_STATES_PER_S, 2
                ),
                "extension_fixed_nodes": n_fixed_nodes,
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
