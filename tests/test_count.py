"""Count/prune engine vs the dict-based spec (binning.c:1042-1123 semantics)."""

import numpy as np
import pytest

import jax.numpy as jnp

from genome_assembly_tpu.io import reads as reads_io
from genome_assembly_tpu.ops import count as count_ops
from genome_assembly_tpu.ops import minimizer
from genome_assembly_tpu.parity import model
from genome_assembly_tpu.parity import table as table_ops


def _pipeline_counts(reads, k, m, cutoff, max_len=64):
    (batch,) = reads_io.batch_reads(reads, max_len=max_len)
    recs = minimizer.parity_scan(
        jnp.asarray(batch.codes), jnp.asarray(batch.lengths), k=k, m=m
    )
    counted = count_ops.count_and_prune(
        recs, jnp.asarray(batch.read_ids), cutoff=cutoff
    )
    host = table_ops.extract_groups(counted, pruned=True)
    return counted, table_ops.decode_table(host, k, m)


@pytest.mark.parametrize("k,m,cutoff", [(6, 3, 1), (6, 3, 0), (31, 4, 1), (21, 7, 2)])
def test_count_and_prune_matches_model(k, m, cutoff):
    rng = np.random.default_rng(7)
    # overlapping reads from a small genome so k-mers recur
    genome = "".join(rng.choice(list("ACGT"), size=200))
    reads = [genome[s : s + 48] for s in rng.integers(0, 152, size=60)]
    # duplicate occurrences inside one read: tandem repeat read
    reads.append(("ACGT" * 20)[:48])
    reads.append(("ACGT" * 20)[:48])

    got_counted, got = _pipeline_counts(reads, k, m, cutoff)
    want = model.count_table(model.scan_reads(reads, k, m), cutoff)
    assert got == want

    # entry counters match the spec too
    all_groups = model.count_table(model.scan_reads(reads, k, m), -1)
    assert int(got_counted.n_entries) == len(all_groups)
    assert int(got_counted.n_kept) == len(want)


def test_occurrences_not_distinct_reads():
    """A k-mer appearing twice in ONE read must survive cutoff=1
    (binning.c:1060-1069 head-shift insertion, SURVEY.md 2.1.5)."""
    k, m = 6, 3
    read = "ACGTACGTACGT"  # 6-mers recur within the read
    _, got = _pipeline_counts([read], k, m, 1, max_len=32)
    want = model.count_table(model.scan_reads([read], k, m), 1)
    assert got == want
    assert want, "expected at least one surviving entry"
    for ids in want.values():
        assert len(ids) >= 2
        assert ids == sorted(ids, reverse=True)


def test_read_id_lists_descending_with_duplicates():
    k, m = 6, 3
    reads = ["TTTTTTTT", "TTTTTTTT", "TTTTTTTT"]
    _, got = _pipeline_counts(reads, k, m, 1, max_len=32)
    # every entry's list holds one id per occurrence, descending
    for ids in got.values():
        assert ids == sorted(ids, reverse=True)
    want = model.count_table(model.scan_reads(reads, k, m), 1)
    assert got == want
