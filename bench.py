"""Headline benchmark: canonical k-mers counted per second on one chip.

Measures the fast-mode device pipeline (canonical minimizer scan +
sort-based count + prune) in steady state on synthetic 100-bp reads --
the same work the reference's ingest+count phase does at ~1.25M windows/s
on one Xeon core (BASELINE.md, measured on big.txt with gcc -O2).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

vs_baseline is the speedup over the reference C ingest rate.
"""

from __future__ import annotations

import json
import sys
import time

REFERENCE_WINDOWS_PER_S = 1.25e6  # BASELINE.md big.txt ingest, 1 core -O2


def main() -> None:
    from genome_assembly_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from genome_assembly_tpu.ops import count as count_ops
    from genome_assembly_tpu.ops import minimizer

    K, M, CUTOFF = 31, 7, 1
    BATCH, LEN = 4096, 128
    n_windows = BATCH * (LEN - K + 1)

    dev = jax.devices()[0]
    rng = np.random.default_rng(0)
    codes = jax.device_put(
        jnp.asarray(rng.integers(0, 4, size=(BATCH, LEN), dtype=np.uint8)), dev
    )
    lengths = jax.device_put(jnp.full((BATCH,), LEN, dtype=jnp.int32), dev)
    read_ids = jax.device_put(jnp.arange(BATCH, dtype=jnp.uint32), dev)

    @jax.jit
    def step(codes, lengths, read_ids):
        recs = minimizer.fast_scan(codes, lengths, k=K, m=M)
        counted = count_ops.count_and_prune(recs, read_ids, cutoff=CUTOFF)
        return counted.n_kept

    # compile + warm up
    step(codes, lengths, read_ids).block_until_ready()
    t0 = time.perf_counter()
    step(codes, lengths, read_ids).block_until_ready()
    single = time.perf_counter() - t0
    # pick an iteration count for ~3s of steady-state measurement
    iters = max(3, min(100, int(3.0 / max(single, 1e-4))))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = step(codes, lengths, read_ids)
    out.block_until_ready()
    wall = time.perf_counter() - t0

    windows_per_s = n_windows * iters / wall
    print(
        json.dumps(
            {
                "metric": "canonical_kmers_counted_per_s",
                "value": round(windows_per_s, 1),
                "unit": "kmers/s/chip",
                "vs_baseline": round(windows_per_s / REFERENCE_WINDOWS_PER_S, 2),
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
