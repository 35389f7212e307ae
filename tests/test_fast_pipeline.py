"""Fast-mode end-to-end: reads -> canonical count/prune -> dBG unitigs."""

import numpy as np
import pytest

from genome_assembly_tpu.config import PipelineConfig
from genome_assembly_tpu.io import datagen
from genome_assembly_tpu.models.pipeline import FastAssembler
from test_dbg import brute_force_unitigs, check_exact_coverage, rc, canon, genome_kmers, split_device_output


def test_fast_pipeline_matches_brute_force():
    genome, reads, _ = datagen.generate_coverage_reads(
        genome_len=1500, read_len=60, coverage=10, seed=5, with_reverse=True
    )
    k, m = 11, 5
    cfg = PipelineConfig(
        k=k, m=m, parity=False, max_read_len=64, batch_reads=512
    )
    asm = FastAssembler(cfg)
    unitigs, stats = asm.unitigs(reads)

    # surviving canonical kmer set (count > 1) from first principles
    counts = {}
    for r in reads:
        for x in genome_kmers(r, k):
            c = canon(x)
            counts[c] = counts.get(c, 0) + 1
    kept = {x for x, n in counts.items() if n > 1}

    want_linear, want_cycles = brute_force_unitigs(sorted(kept), k)
    got_linear, got_cycles = split_device_output(unitigs, k, want_cycles)
    assert got_linear == want_linear
    assert got_cycles == want_cycles
    check_exact_coverage(unitigs, sorted(kept), k)
    assert stats.entries_post_prune == len(kept)


def test_fast_pipeline_reconstructs_clean_genome():
    """Error-free high-coverage reads over a genome with mostly unique
    k-mers: the longest unitig should recover a large genome fraction."""
    genome, reads, _ = datagen.generate_coverage_reads(
        genome_len=800, read_len=80, coverage=15, seed=11, with_reverse=True
    )
    k = 21
    cfg = PipelineConfig(k=k, m=7, parity=False, max_read_len=96, batch_reads=256)
    unitigs, _ = FastAssembler(cfg).unitigs(reads)
    longest = max(unitigs, key=len)
    # the longest unitig (either strand) must be a genome substring
    assert longest in genome or rc(longest) in genome
    assert len(longest) > 0.5 * len(genome)


def test_long_sequence_chunking_equals_whole_genome_kmers():
    """A 5kb 'genome' fed as one long sequence must produce exactly the
    unitigs of its k-mer set (every window scanned once via chunking)."""
    rng = np.random.default_rng(21)
    genome = "".join(rng.choice(list("ACGT"), size=5000))
    k = 15
    cfg = PipelineConfig(
        k=k, m=7, parity=False, abundance_cutoff=0,
        max_read_len=128, batch_reads=256,
    )
    unitigs, stats = FastAssembler(cfg).unitigs_from_sequences([genome])
    assert stats.n_windows == len(genome) - k + 1
    got_kmers = set()
    for u in unitigs:
        for x in genome_kmers(u, k):
            got_kmers.add(canon(x))
    want = {canon(x) for x in genome_kmers(genome, k)}
    assert got_kmers == want


def test_fast_pipeline_strand_invariance():
    """Reversing every read must not change the unitig set."""
    genome, reads, _ = datagen.generate_coverage_reads(
        genome_len=600, read_len=50, coverage=8, seed=3
    )
    k, m = 13, 5
    cfg = PipelineConfig(k=k, m=m, parity=False, max_read_len=64, batch_reads=256)
    u1, _ = FastAssembler(cfg).unitigs(reads)
    u2, _ = FastAssembler(cfg).unitigs([rc(r) for r in reads])
    assert sorted(min(u, rc(u)) for u in u1) == sorted(min(u, rc(u)) for u in u2)


def test_fast_assembler_outofcore_path_matches_incore():
    """FastAssembler switches to hash-partitioned multi-pass counting when
    the record set exceeds outofcore_bytes; the unitig set must be
    identical to the in-core path."""
    import dataclasses

    from genome_assembly_tpu.io import datagen

    genome, reads, _ = datagen.generate_coverage_reads(
        genome_len=900, read_len=48, coverage=8, seed=29, with_reverse=True
    )
    cfg = PipelineConfig(k=11, m=5, parity=False, max_read_len=64,
                         batch_reads=128)
    a, sa = FastAssembler(cfg).unitigs(reads)
    tiny = dataclasses.replace(cfg, outofcore_bytes=1 << 12)
    b, sb = FastAssembler(tiny).unitigs(reads)
    assert sorted(a) == sorted(b)
    assert sa.entries_post_prune == sb.entries_post_prune


def test_fast_assembler_outofcore_extension_matches_incore():
    """Beyond-HBM library path end to end: out-of-core counting AND
    out-of-core link building AND the low-memory bulk jump (the in-core
    builder + fused jump OOM at exactly the scale the out-of-core count
    is auto-engaged for).  Unitigs must equal the in-core path's."""
    import dataclasses

    from genome_assembly_tpu.io import datagen

    genome, reads, _ = datagen.generate_coverage_reads(
        genome_len=900, read_len=48, coverage=8, seed=31, with_reverse=True
    )
    cfg = PipelineConfig(k=11, m=5, parity=False, max_read_len=64,
                         batch_reads=128)
    a, sa = FastAssembler(cfg).unitigs(reads)
    tiny = dataclasses.replace(
        cfg,
        outofcore_bytes=1 << 12,  # force partitioned counting
        link_budget_bytes=1 << 10,  # force the out-of-core link join
        bulk_jump_states=8,  # force the low-memory bulk jump
    )
    b, sb = FastAssembler(tiny).unitigs(reads)
    assert sorted(a) == sorted(b)
    assert sa.entries_post_prune == sb.entries_post_prune
    assert sa.entries_post_extension == sb.entries_post_extension
