"""One process of an N-process (multi-host) distributed count run.

Exercises the REAL multi-host code path -- ``jax.distributed.initialize``,
a global mesh spanning processes, cross-process collectives (gloo on CPU,
ICI/DCN on TPU slices) -- not a single-process simulation.  Each process
holds 4 virtual CPU devices; the minimizer all_to_all and the count run on
the 8-device global mesh exactly as they would across two TPU hosts.

  # terminal 1                      # terminal 2
  python tools/run_multihost.py 0 2 /tmp/mh.json &
  python tools/run_multihost.py 1 2 /dev/null

Process 0 writes a JSON summary (kept-entry count + a content hash over
the sorted kept (mmer, kmer, count) triples) that
tests/test_multihost.py compares against the single-process result.
"""

from __future__ import annotations

import hashlib
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    pid = int(sys.argv[1])
    nproc = int(sys.argv[2])
    out_path = sys.argv[3]
    port = os.environ.get("GA_TPU_MH_PORT", "29581")
    devices_per_proc = 4

    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={devices_per_proc}"
    ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")

    from genome_assembly_tpu.parallel import distributed

    p, n = distributed.init_multi_host(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=nproc,
        process_id=pid,
    )
    assert (p, n) == (pid, nproc)

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P
    import jax.experimental.multihost_utils as mhu

    from genome_assembly_tpu.io import datagen, reads as reads_io
    from genome_assembly_tpu.parallel import shard_count

    mesh = distributed.global_mesh()
    n_shards = len(jax.devices())

    k, m, cutoff = 11, 5, 1
    genome, reads, _ = datagen.generate_coverage_reads(
        genome_len=800, read_len=48, coverage=6, seed=2, with_reverse=True
    )
    (b,) = reads_io.batch_reads(reads, 64)
    b = reads_io.pad_batch(b, n_shards * ((len(reads) + n_shards - 1) // n_shards))

    sharding = NamedSharding(mesh, P("shards"))

    def put(x):
        return jax.device_put(np.asarray(x), sharding)

    sc = shard_count.sharded_count(
        put(b.codes),
        put(b.lengths),
        put(b.read_ids),
        k=k,
        m=m,
        parity=False,
        cutoff=cutoff,
        mesh=mesh,
    )

    def full(x):
        return np.asarray(mhu.process_allgather(x, tiled=True))

    gathered = shard_count.ShardedCount(*[full(x) for x in sc])
    overflow = int(np.sum(gathered.overflow))
    table = shard_count.sharded_to_host_dict(gathered, k, m)
    canon = sorted((mm, kk, len(v)) for (mm, kk), v in table.items())
    digest = hashlib.sha256(json.dumps(canon).encode()).hexdigest()

    if pid == 0:
        with open(out_path, "w") as f:
            json.dump(
                {
                    "processes": n,
                    "devices": n_shards,
                    "overflow": overflow,
                    "entries": len(table),
                    "digest": digest,
                },
                f,
            )
        print(json.dumps({"entries": len(table), "digest": digest}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
