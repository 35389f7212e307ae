"""Full big.txt-configuration parity soak (standalone; ~10+ min of oracle
wall time on slow VMs, so not part of the test suite).

Reproduces BASELINE.md's big-run shape -- 100 kb genome, 50x coverage,
50,000 x 100 bp reads, K=31/M=4 -- and diffs our parity pipeline's unitig
output (exact line order) against a live run of the reference binary.
"""

from __future__ import annotations

import pathlib
import sys
import tempfile
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main() -> int:
    from genome_assembly_tpu.config import PipelineConfig
    from genome_assembly_tpu.io import datagen
    from genome_assembly_tpu.models.pipeline import ParityAssembler
    from tools import oracle

    genome, reads, _ = datagen.generate_coverage_reads(
        genome_len=100_000, read_len=100, coverage=50, seed=7
    )
    print(f"{len(reads)} reads generated", flush=True)
    with tempfile.TemporaryDirectory() as td:
        reads_file = pathlib.Path(td) / "big.txt"
        datagen.write_reads(reads, str(reads_file))

        t0 = time.time()
        binary = oracle.build_oracle(pathlib.Path("/tmp/oracle_build"), k=31, m=4)
        want = oracle.run_oracle(binary, reads_file, "unitigs").splitlines()
        print(f"oracle: {len(want)} unitigs in {time.time()-t0:.0f}s", flush=True)

        cfg = PipelineConfig(k=31, m=4, max_read_len=128, batch_reads=32768)
        asm = ParityAssembler(cfg)
        parsed = asm.load(str(reads_file))
        t0 = time.time()
        lines, stats = asm.assemble(parsed, engine="native")
        print(
            f"ours: {len(lines)} unitigs in {time.time()-t0:.0f}s "
            f"(pre-prune {stats.entries_pre_prune})",
            flush=True,
        )
        if lines == want:
            print("PARITY: exact (order included)")
            return 0
        same_set = sorted(lines) == sorted(want)
        print(f"MISMATCH: multiset equal={same_set}")
        return 1


if __name__ == "__main__":
    sys.exit(main())
