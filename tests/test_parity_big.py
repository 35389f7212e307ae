"""Large-synthetic parity soak vs a live oracle run.

BASELINE.md measured the reference on a 50,000-read synthetic (100 kb
genome, 50x).  This reproduces the same structure end-to-end (exact unitig
output) against a freshly-run oracle at 10k reads -- the largest size the
test VM's oracle wall-time tolerates; tools/run_parity_soak.py runs the
full 50k configuration standalone.
"""

import pathlib
import sys
import tempfile

import pytest

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

from genome_assembly_tpu.config import PipelineConfig
from genome_assembly_tpu.io import datagen
from genome_assembly_tpu.models.pipeline import ParityAssembler


@pytest.mark.slow
@pytest.mark.oracle
def test_big_synthetic_bit_parity():
    from tools import oracle

    genome, reads, _ = datagen.generate_coverage_reads(
        genome_len=50_000, read_len=100, coverage=20, seed=7
    )
    assert len(reads) == 10_000
    with tempfile.TemporaryDirectory() as td:
        reads_file = pathlib.Path(td) / "big.txt"
        datagen.write_reads(reads, str(reads_file))
        binary = oracle.build_oracle(
            pathlib.Path("/tmp/oracle_build"), k=31, m=4
        )
        want = oracle.run_oracle(binary, reads_file, "unitigs").splitlines()

    cfg = PipelineConfig(k=31, m=4, max_read_len=128, batch_reads=32768)
    asm = ParityAssembler(cfg)
    # the oracle read the file through fgets(101): 100-bp lines become
    # 99 bp + an empty read id -- load through the same emulated path
    with tempfile.TemporaryDirectory() as td2:
        reads_file2 = pathlib.Path(td2) / "big.txt"
        datagen.write_reads(reads, str(reads_file2))
        parsed = asm.load(str(reads_file2))
    assert len(parsed) == 20_000
    lines, stats = asm.assemble(parsed, engine="native")
    assert lines == want
