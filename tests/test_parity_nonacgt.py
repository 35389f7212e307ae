"""Exact parity on reads containing non-ACGT bytes (VERDICT r2 missing #1).

The reference accepts any byte: unknown characters (including lowercase
bases) score as 'A' (getval default, binning.c:107-109) but are stored and
printed VERBATIM when the k-mer is not complemented (binning.c:1023-1028).
The device groups by packed codes, so raw-byte keys are recovered by the
exception path (parity/nonacgt.py): spec-scan dirty reads, re-key their
occurrences, split groups by exact stored string.

Layers tested: regrouped pruned table == executable-spec table; python
replay == native replay (override channel); live reference binary ==
assemble() on an N/lowercase-bearing read set.
"""

import numpy as np
import pytest

from genome_assembly_tpu.config import PipelineConfig
from genome_assembly_tpu.models.pipeline import ParityAssembler
from genome_assembly_tpu.parity import model, nonacgt


def _dirty_reads(seed=7, n=40, length=30):
    rng = np.random.default_rng(seed)
    reads = ["".join(rng.choice(list("ACGT"), size=length)) for _ in range(n)]
    # inject junk BEFORE duplicating so dirty k-mers also survive pruning:
    # an N, a lowercase base (reference getval treats it as unknown too),
    # a fully lowercase read, and a stray letter
    reads[0] = reads[0][:5] + "N" + reads[0][6:]
    reads[1] = reads[1][:3] + "n" + reads[1][4:]
    reads[2] = reads[2].lower()
    reads[3] = reads[3][:10] + "X" + reads[3][11:]
    # N adjacent to where a signature window will sit
    reads[4] = "N" + reads[4][1:]
    return reads + reads  # every window occurs twice -> survives cutoff 1


def _cfg(batch=64):
    return PipelineConfig(k=6, m=3, max_read_len=32, batch_reads=batch)


def test_regrouped_table_matches_spec():
    """pruned_table_groups (device count + exception regroup) equals the
    executable spec's table exactly -- keys with raw bytes, counts, and
    descending id order all included."""
    reads = _dirty_reads()
    asm = ParityAssembler(_cfg())
    groups = asm.pruned_table_groups(reads)
    got = {(s, km): list(reversed(ids)) for s, km, ids in groups}
    want = model.count_table(model.scan_reads(reads, 6, 3), 1)
    assert got == want
    # the fixture really exercises raw keys
    assert any(
        not frozenset("ACGT").issuperset(s + km) for s, km in got
    ), "no raw-byte keys in the pruned table; fixture too clean"


def test_regrouped_table_matches_spec_multibatch():
    """Same equality across the multi-batch merge path (streams must stay
    global across batches)."""
    reads = _dirty_reads()
    asm = ParityAssembler(_cfg(batch=16))
    groups = asm.pruned_table_groups(reads)
    got = {(s, km): list(reversed(ids)) for s, km, ids in groups}
    assert got == model.count_table(model.scan_reads(reads, 6, 3), 1)


def test_nonacgt_cross_engine():
    """python replay == native replay (raw-key override channel), for both
    print formats."""
    reads = _dirty_reads()
    asm = ParityAssembler(_cfg())
    py_lines, _ = asm.assemble(reads, engine="python")
    nat_lines, _ = asm.assemble(reads, engine="native")
    assert py_lines == nat_lines
    assert any(not frozenset("ACGT").issuperset(l) for l in py_lines)
    py_v, _ = asm.assemble(reads, engine="python", verbose=True)
    nat_v, _ = asm.assemble(reads, engine="native", verbose=True)
    assert py_v == nat_v


def test_clean_reads_unaffected():
    """A pure-ACGT read set takes the unchanged fast path and the
    exception path agrees with it bit for bit."""
    reads = [r for r in _dirty_reads() if frozenset("ACGT").issuperset(r)]
    asm = ParityAssembler(_cfg())
    clean_lines, _ = asm.assemble(reads, engine="native")
    groups, _ = asm._nonacgt_groups(reads)
    from genome_assembly_tpu.native import replay_native

    forced = replay_native.assemble_groups(groups, 6, 3, 1)
    assert forced == clean_lines


@pytest.mark.oracle
def test_nonacgt_live_oracle():
    """assemble() on an N/lowercase-bearing read set == the reference
    binary's output, line for line including raw bytes."""
    import pathlib
    import sys
    import tempfile

    sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))
    from tools import oracle

    reads = _dirty_reads()
    with tempfile.TemporaryDirectory() as td:
        reads_file = pathlib.Path(td) / "reads.txt"
        reads_file.write_text("".join(r + "\n" for r in reads))
        binary = oracle.build_oracle(
            pathlib.Path("/tmp/oracle_build"), k=6, m=3
        )
        want = oracle.run_oracle(binary, reads_file, "unitigs").splitlines()

    asm = ParityAssembler(_cfg())
    # 30-bp lines are consumed whole by fgets(101): no truncation quirk
    lines, _ = asm.assemble(reads, engine="native")
    assert lines == want
    lines_py, _ = asm.assemble(reads, engine="python")
    assert lines_py == want


def test_dirty_rejected_on_unsupported_paths():
    reads = _dirty_reads()
    asm = ParityAssembler(_cfg())
    with pytest.raises(NotImplementedError):
        asm.pruned_table(reads)


def test_dirty_detection():
    assert not nonacgt.has_non_acgt(["ACGT", ""])
    assert nonacgt.has_non_acgt(["ACGN"])
    assert nonacgt.has_non_acgt(["acgt"])  # lowercase is unknown to getval
