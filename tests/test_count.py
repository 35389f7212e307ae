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


def test_partitioned_count_equals_direct():
    """Out-of-core multi-pass counting (ops/outofcore.py) == one-shot
    count_keys: same distinct/kept totals and the same kept key set."""
    import jax.numpy as jnp

    from genome_assembly_tpu.ops import count as count_ops
    from genome_assembly_tpu.ops import minimizer, outofcore

    k, m, cutoff = 15, 7, 1
    rng = np.random.default_rng(17)
    genome = rng.integers(0, 4, size=2500, dtype=np.uint8)
    n_batches, batch, L = 3, 64, 64
    starts = rng.integers(0, len(genome) - L, size=(n_batches, batch))
    all_hi, all_lo = [], []

    def batch_keys(b):
        codes = np.stack([genome[s : s + L] for s in starts[b]])
        recs = minimizer.fast_scan(
            jnp.asarray(codes), jnp.full((batch,), L, jnp.int32), k=k, m=m
        )
        sent = jnp.uint32(0xFFFFFFFF)
        hi = jnp.where(recs.valid, recs.kmer_hi, sent).reshape(-1)
        lo = jnp.where(recs.valid, recs.kmer_lo, sent).reshape(-1)
        return hi, lo

    pc = outofcore.partitioned_count(
        batch_keys, n_batches, partitions=4, cutoff=cutoff, kept_cap=4096,
        slack=2.0,
    )
    assert pc.batch_overflows == 0 and not pc.kept_overflow

    for b in range(n_batches):
        hi, lo = batch_keys(b)
        all_hi.append(hi)
        all_lo.append(lo)
    hi = jnp.concatenate(all_hi)
    recs = minimizer.WindowRecords(
        mmer=jnp.zeros((0,), jnp.uint32),
        kmer_hi=hi,
        kmer_lo=jnp.concatenate(all_lo),
        valid=hi != jnp.uint32(0xFFFFFFFF),
    )
    kc = count_ops.count_keys(recs, cutoff=cutoff)
    assert pc.n_distinct == int(np.sum(np.asarray(kc.group_start & kc.valid)))
    assert pc.n_kept == int(np.sum(np.asarray(kc.keep)))
    khi, klo, valid = count_ops.kept_keys_sorted(kc)
    want = {
        (int(a), int(b))
        for a, b, v in zip(np.asarray(khi), np.asarray(klo), np.asarray(valid))
        if v
    }
    got = {
        (int(a), int(b))
        for a, b, v in zip(
            np.asarray(pc.kmer_hi), np.asarray(pc.kmer_lo), np.asarray(pc.valid)
        )
        if v
    }
    assert got == want


def test_partitioned_count_resume(tmp_path):
    """A killed out-of-core run resumes from completed partitions: with all
    partitions checkpointed, batch_keys is never called again."""
    import jax.numpy as jnp

    from genome_assembly_tpu.ops import minimizer, outofcore

    k, m = 15, 7
    rng = np.random.default_rng(23)
    genome = rng.integers(0, 4, size=1200, dtype=np.uint8)
    starts = rng.integers(0, len(genome) - 64, size=(2, 32))
    calls = []

    def batch_keys(b):
        calls.append(b)
        codes = np.stack([genome[s : s + 64] for s in starts[b]])
        recs = minimizer.fast_scan(
            jnp.asarray(codes), jnp.full((32,), 64, jnp.int32), k=k, m=m
        )
        sent = jnp.uint32(0xFFFFFFFF)
        return (
            jnp.where(recs.valid, recs.kmer_hi, sent).reshape(-1),
            jnp.where(recs.valid, recs.kmer_lo, sent).reshape(-1),
        )

    kw = dict(partitions=3, cutoff=0, kept_cap=4096, slack=2.0,
              checkpoint_dir=str(tmp_path))
    a = outofcore.partitioned_count(batch_keys, 2, **kw)
    assert a.batch_overflows == 0
    first_calls = len(calls)
    calls.clear()
    b = outofcore.partitioned_count(batch_keys, 2, **kw)
    assert calls == [0]  # only the shape probe; every partition resumed
    assert (a.n_distinct, a.n_kept) == (b.n_distinct, b.n_kept)
    assert np.array_equal(np.asarray(a.kmer_hi), np.asarray(b.kmer_hi))
    assert np.array_equal(np.asarray(a.kmer_lo), np.asarray(b.kmer_lo))


def test_extract_partition_range_exhaustive():
    """Range extraction (ops/outofcore.extract_partition_range): the union
    over groups equals the real input multiset for several (partitions,
    group_size) shapes, including a key whose 32-bit partition hash is
    exactly 0xFFFFFFFF (the sentinel-adjacent clamp case) and max-hi keys."""
    import jax.numpy as jnp

    from genome_assembly_tpu.ops import outofcore

    rng = np.random.default_rng(41)
    n = 512
    hi = rng.integers(0, 1 << 30, n).astype(np.uint32)
    lo = rng.integers(0, 1 << 32, n).astype(np.uint32)
    hi[:5] = 0x3FFFFFFF
    # hash((0, 4050964655)) == 0xFFFFFFFF: without the 0xFFFFFFFE clamp
    # this record could interleave with the sentinel run and be dropped
    hi[5], lo[5] = 0, 4050964655
    hi[6], lo[6] = 0, 4050964655  # and its duplicate
    hi[40:80] = 0xFFFFFFFF  # invalid/padding slots
    want = sorted(
        (int(a), int(b)) for a, b in zip(hi, lo) if a != 0xFFFFFFFF
    )
    for partitions, group_size in ((1, 1), (4, 4), (5, 2), (7, 16), (64, 5)):
        got = []
        groups = (partitions + group_size - 1) // group_size
        for g in range(groups):
            ghi, glo, ovf = outofcore.extract_partition_range(
                jnp.asarray(hi), jnp.asarray(lo), jnp.uint32(g),
                partitions=partitions, group_size=group_size, cap_bp=n,
            )
            assert not bool(np.any(np.asarray(ovf)))
            for r in range(group_size):
                a = np.asarray(ghi[r])
                b = np.asarray(glo[r])
                got.extend(
                    (int(x), int(y)) for x, y in zip(a, b) if x != 0xFFFFFFFF
                )
        assert sorted(got) == want, (partitions, group_size)


def test_extract_partition_range_overflow_detected():
    """A cap smaller than a partition's true share must raise the overflow
    flag for exactly the partitions that overflow (never silent loss)."""
    import jax.numpy as jnp

    from genome_assembly_tpu.ops import outofcore

    rng = np.random.default_rng(43)
    n = 4096
    hi = rng.integers(0, 1 << 30, n).astype(np.uint32)
    lo = rng.integers(0, 1 << 32, n).astype(np.uint32)
    partitions, group_size = 4, 4
    pid = np.asarray(outofcore.key_partition_range(
        jnp.asarray(hi), jnp.asarray(lo), partitions))
    sizes = np.bincount(pid, minlength=partitions)
    cap = int(sizes.max()) - 7  # guarantee at least the largest overflows
    ghi, glo, ovf = outofcore.extract_partition_range(
        jnp.asarray(hi), jnp.asarray(lo), jnp.uint32(0),
        partitions=partitions, group_size=group_size, cap_bp=cap,
    )
    ovf = np.asarray(ovf)
    for r in range(partitions):
        assert bool(ovf[r]) == (sizes[r] > cap), (r, sizes[r], cap)
        kept = int(np.sum(np.asarray(ghi[r]) != 0xFFFFFFFF))
        assert kept == min(sizes[r], cap)


def test_partitioned_count_group_sizes_match_direct():
    """partitioned_count is invariant to group width and staging sizing:
    every (group_size, partitions) combination returns the same kept key
    set as the in-core count (statistical cap sizing, slack=None)."""
    import jax.numpy as jnp

    from genome_assembly_tpu.ops import count as count_ops
    from genome_assembly_tpu.ops import minimizer, outofcore

    k, m, cutoff = 15, 7, 1
    rng = np.random.default_rng(47)
    genome = rng.integers(0, 4, size=3000, dtype=np.uint8)
    n_batches, batch, L = 4, 48, 64
    starts = rng.integers(0, len(genome) - L, size=(n_batches, batch))

    def batch_keys(b):
        codes = np.stack([genome[s : s + L] for s in starts[b]])
        recs = minimizer.fast_scan(
            jnp.asarray(codes), jnp.full((batch,), L, jnp.int32), k=k, m=m
        )
        sent = jnp.uint32(0xFFFFFFFF)
        return (
            jnp.where(recs.valid, recs.kmer_hi, sent).reshape(-1),
            jnp.where(recs.valid, recs.kmer_lo, sent).reshape(-1),
        )

    hi = jnp.concatenate([batch_keys(b)[0] for b in range(n_batches)])
    lo = jnp.concatenate([batch_keys(b)[1] for b in range(n_batches)])
    recs = minimizer.WindowRecords(
        mmer=jnp.zeros((0,), jnp.uint32), kmer_hi=hi, kmer_lo=lo,
        valid=hi != jnp.uint32(0xFFFFFFFF),
    )
    kc = count_ops.count_keys(recs, cutoff=cutoff)
    khi, klo, valid = count_ops.kept_keys_sorted(kc)
    want = {
        (int(a), int(b))
        for a, b, v in zip(np.asarray(khi), np.asarray(klo), np.asarray(valid))
        if v
    }
    want_counts = (
        int(np.sum(np.asarray(kc.group_start & kc.valid))),
        int(np.sum(np.asarray(kc.keep))),
    )
    for partitions, group_size in ((5, 1), (5, 4), (16, 16), (9, None)):
        pc = outofcore.partitioned_count(
            batch_keys, n_batches, partitions=partitions, cutoff=cutoff,
            kept_cap=65536, group_size=group_size,
        )
        assert pc.batch_overflows == 0 and not pc.kept_overflow
        assert (pc.n_distinct, pc.n_kept) == want_counts
        got = {
            (int(a), int(b))
            for a, b, v in zip(
                np.asarray(pc.kmer_hi), np.asarray(pc.kmer_lo),
                np.asarray(pc.valid),
            )
            if v
        }
        assert got == want, (partitions, group_size)


def test_partitioned_count_resume_across_group_retune(tmp_path):
    """Partition checkpoints depend only on (partitions, cutoff, dataset):
    a resume with a DIFFERENT group width reuses them (only the shape probe
    re-runs), and a partition saved with recorded overflow is recounted."""
    import jax.numpy as jnp

    from genome_assembly_tpu.ops import minimizer, outofcore

    k, m = 15, 7
    rng = np.random.default_rng(53)
    genome = rng.integers(0, 4, size=1500, dtype=np.uint8)
    starts = rng.integers(0, len(genome) - 64, size=(2, 32))
    calls = []

    def batch_keys(b):
        calls.append(b)
        codes = np.stack([genome[s : s + 64] for s in starts[b]])
        recs = minimizer.fast_scan(
            jnp.asarray(codes), jnp.full((32,), 64, jnp.int32), k=k, m=m
        )
        sent = jnp.uint32(0xFFFFFFFF)
        return (
            jnp.where(recs.valid, recs.kmer_hi, sent).reshape(-1),
            jnp.where(recs.valid, recs.kmer_lo, sent).reshape(-1),
        )

    kw = dict(partitions=6, cutoff=0, kept_cap=8192,
              checkpoint_dir=str(tmp_path))
    a = outofcore.partitioned_count(batch_keys, 2, group_size=2, **kw)
    assert a.batch_overflows == 0
    calls.clear()
    b = outofcore.partitioned_count(batch_keys, 2, group_size=5, **kw)
    assert calls == [0]  # group retune: every partition still resumed
    assert (a.n_distinct, a.n_kept) == (b.n_distinct, b.n_kept)
    got_a = sorted(zip(np.asarray(a.kmer_hi).tolist(),
                       np.asarray(a.kmer_lo).tolist()))
    got_b = sorted(zip(np.asarray(b.kmer_hi).tolist(),
                       np.asarray(b.kmer_lo).tolist()))
    assert got_a == got_b

    # force an overflow into one partition's checkpoint, then resume with
    # sane caps: the poisoned partition must be recounted, not reused
    import shutil

    poisoned = tmp_path / "poison"
    poisoned.mkdir()
    shutil.copy(tmp_path / "meta.json", poisoned / "meta.json")
    c = outofcore.partitioned_count(
        batch_keys, 2, slack=0.05, group_size=3,
        partitions=6, cutoff=0, kept_cap=8192,
        checkpoint_dir=str(poisoned),
    )
    assert c.batch_overflows > 0  # tiny caps overflowed somewhere
    calls.clear()
    d = outofcore.partitioned_count(
        batch_keys, 2, group_size=3,
        partitions=6, cutoff=0, kept_cap=8192,
        checkpoint_dir=str(poisoned),
    )
    assert d.batch_overflows == 0
    assert len(calls) > 1  # overflowed partitions really re-ran
    assert (d.n_distinct, d.n_kept) == (a.n_distinct, a.n_kept)


def test_extract_partition_range3_exhaustive():
    """Payload-carrying range extraction: union over groups equals the
    input multiset (keys AND payloads), including the hash-0xFFFFFFFF
    clamp key, across (partitions, group_size) shapes."""
    import jax.numpy as jnp

    from genome_assembly_tpu.ops import outofcore

    rng = np.random.default_rng(59)
    n = 512
    hi = rng.integers(0, 1 << 30, n).astype(np.uint32)
    lo = rng.integers(0, 1 << 32, n).astype(np.uint32)
    pay = rng.integers(0, 1 << 31, n).astype(np.uint32)
    hi[3], lo[3] = 0, 4050964655  # hash == 0xFFFFFFFF
    hi[50:90] = 0xFFFFFFFF
    want = sorted(
        (int(a), int(b), int(c))
        for a, b, c in zip(hi, lo, pay) if a != 0xFFFFFFFF
    )
    for partitions, group_size in ((1, 1), (5, 2), (11, 16), (64, 6)):
        got = []
        groups = (partitions + group_size - 1) // group_size
        for g in range(groups):
            ghi, glo, gpay, ovf = outofcore.extract_partition_range3(
                jnp.asarray(hi), jnp.asarray(lo), jnp.asarray(pay),
                jnp.uint32(g), partitions=partitions,
                group_size=group_size, cap_bp=n,
            )
            assert not bool(np.any(np.asarray(ovf)))
            for r in range(group_size):
                a, b, c = (np.asarray(x[r]) for x in (ghi, glo, gpay))
                got.extend(
                    (int(x), int(y), int(z))
                    for x, y, z in zip(a, b, c) if x != 0xFFFFFFFF
                )
        assert sorted(got) == want, (partitions, group_size)


def test_partitioned_count_super_matches_direct():
    """Super-k-mer out-of-core counting (minimizer-partitioned compressed
    staging, ops/superkmer.py) returns exactly the direct count's
    distinct/kept totals and kept key set, across partition/group shapes,
    including reads with short lengths and long single-minimizer runs."""
    import jax.numpy as jnp

    from genome_assembly_tpu.ops import count as count_ops
    from genome_assembly_tpu.ops import minimizer, outofcore, superkmer

    k, m, cutoff = 31, 7, 1
    rng = np.random.default_rng(61)
    genome = rng.integers(0, 4, size=4000, dtype=np.uint8)
    genome[100:300] = 3  # a poly-A region: long minimizer runs, split paths
    n_batches, batch, L = 4, 64, 128
    starts = rng.integers(0, len(genome) - L, size=(n_batches, batch))
    lengths = rng.integers(k, L + 1, size=(n_batches, batch)).astype(np.int32)

    def codes_of(b):
        return (
            jnp.asarray(np.stack([genome[s : s + L] for s in starts[b]])),
            jnp.asarray(lengths[b]),
        )

    def batch_super(b):
        c, le = codes_of(b)
        return superkmer.super_records(c, le, k=k, m=m)

    his, los = [], []
    for b in range(n_batches):
        c, le = codes_of(b)
        recs = minimizer.fast_scan(c, le, k=k, m=m)
        sent = jnp.uint32(0xFFFFFFFF)
        his.append(jnp.where(recs.valid, recs.kmer_hi, sent).reshape(-1))
        los.append(jnp.where(recs.valid, recs.kmer_lo, sent).reshape(-1))
    hi = jnp.concatenate(his)
    recs_all = minimizer.WindowRecords(
        mmer=jnp.zeros((0,), jnp.uint32), kmer_hi=hi,
        kmer_lo=jnp.concatenate(los), valid=hi != jnp.uint32(0xFFFFFFFF),
    )
    kc = count_ops.count_keys(recs_all, cutoff=cutoff)
    khi, klo, valid = count_ops.kept_keys_sorted(kc)
    want = {
        (int(a), int(b2))
        for a, b2, v in zip(np.asarray(khi), np.asarray(klo), np.asarray(valid))
        if v
    }
    want_counts = (
        int(np.sum(np.asarray(kc.group_start & kc.valid))),
        int(np.sum(np.asarray(kc.keep))),
    )

    for partitions, group_size in ((0, None), (6, 2), (6, 64), (17, 5)):
        pc = outofcore.partitioned_count_super(
            batch_super, n_batches, k=k, m=m, partitions=partitions,
            cutoff=cutoff, kept_cap=65536, group_size=group_size,
            expand_chunk=512,
        )
        assert pc.batch_overflows == 0 and not pc.kept_overflow
        assert (pc.n_distinct, pc.n_kept) == want_counts, (
            partitions, group_size, pc.n_distinct, pc.n_kept)
        got = {
            (int(a), int(b2))
            for a, b2, v in zip(
                np.asarray(pc.kmer_hi), np.asarray(pc.kmer_lo),
                np.asarray(pc.valid),
            )
            if v
        }
        assert got == want, (partitions, group_size)


def test_partitioned_count_super_resume(tmp_path):
    """Super-mode partition checkpoints resume across group retunes."""
    import jax.numpy as jnp

    from genome_assembly_tpu.ops import outofcore, superkmer

    k, m = 15, 7
    rng = np.random.default_rng(67)
    genome = rng.integers(0, 4, size=1500, dtype=np.uint8)
    starts = rng.integers(0, len(genome) - 64, size=(2, 32))
    calls = []

    def batch_super(b):
        calls.append(b)
        codes = np.stack([genome[s : s + 64] for s in starts[b]])
        return superkmer.super_records(
            jnp.asarray(codes), jnp.full((32,), 64, jnp.int32), k=k, m=m
        )

    kw = dict(k=k, m=m, partitions=5, cutoff=0, kept_cap=8192,
              expand_chunk=256, checkpoint_dir=str(tmp_path))
    a = outofcore.partitioned_count_super(batch_super, 2, group_size=2, **kw)
    assert a.batch_overflows == 0
    calls.clear()
    b = outofcore.partitioned_count_super(batch_super, 2, group_size=4, **kw)
    assert calls == [0]  # probe only: every partition resumed
    assert (a.n_distinct, a.n_kept) == (b.n_distinct, b.n_kept)
    got_a = sorted(zip(np.asarray(a.kmer_hi).tolist(),
                       np.asarray(a.kmer_lo).tolist()))
    got_b = sorted(zip(np.asarray(b.kmer_hi).tolist(),
                       np.asarray(b.kmer_lo).tolist()))
    assert got_a == got_b


def test_count_self_heals_statistical_cap_overflow():
    """Records concentrated on ONE key blow the statistical per-partition
    staging cap (mean + 8 sigma assumes hash-spread keys); the count must
    re-extract that partition with an escalated cap
    (outofcore._reextract_partition2) and still return exact results --
    not assert, not silently undercount.  Counterpart of the link
    builders' self-heal test (chr1-scale failure mode)."""
    import jax.numpy as jnp

    from genome_assembly_tpu.ops import count as count_ops
    from genome_assembly_tpu.ops import outofcore
    from genome_assembly_tpu.ops.minimizer import WindowRecords

    rng = np.random.default_rng(41)
    slots, batches = 4096, 2
    rand_his = rng.integers(0, 1 << 20, size=(batches, slots // 2)).astype(np.uint32)
    rand_los = rng.integers(0, 1 << 30, size=(batches, slots // 2)).astype(np.uint32)

    def batch_keys(b):
        hi = np.concatenate([np.full(slots // 2, 7, np.uint32), rand_his[b]])
        lo = np.concatenate([np.full(slots // 2, 9, np.uint32), rand_los[b]])
        return jnp.asarray(hi), jnp.asarray(lo)

    pc = outofcore.partitioned_count(
        batch_keys, batches, partitions=4, cutoff=1, kept_cap=1 << 14,
    )
    assert pc.batch_overflows == 0  # healed, not surfaced

    hi_all = jnp.concatenate([batch_keys(b)[0] for b in range(batches)])
    lo_all = jnp.concatenate([batch_keys(b)[1] for b in range(batches)])
    recs = WindowRecords(
        mmer=jnp.zeros((0,), jnp.uint32), kmer_hi=hi_all, kmer_lo=lo_all,
        valid=hi_all != jnp.uint32(0xFFFFFFFF),
    )
    kc = count_ops.count_keys(recs, cutoff=1)
    want_distinct = int(jnp.sum(kc.group_start & kc.valid))
    want_kept = int(jnp.sum(kc.keep))
    assert (pc.n_distinct, pc.n_kept) == (want_distinct, want_kept)
    khi, klo, _ = count_ops.kept_keys_sorted(kc)
    want = sorted(zip(
        np.asarray(khi[:want_kept]).tolist(), np.asarray(klo[:want_kept]).tolist()
    ))
    got = sorted(zip(
        np.asarray(pc.kmer_hi).tolist(), np.asarray(pc.kmer_lo).tolist()
    ))
    assert got == want


def test_super_count_self_heals_probe_cap_overflow():
    """partitioned_count_super's record cap comes from the PROBE batch's
    per-partition histogram; a later batch concentrated on one minimizer
    (poly-A reads) blows it.  The count must re-extract that partition
    with an escalated cap (outofcore._reextract_partition_super) and
    still match the direct count exactly."""
    import jax.numpy as jnp

    from genome_assembly_tpu.ops import count as count_ops
    from genome_assembly_tpu.ops import minimizer, outofcore, superkmer

    k, m, cutoff = 31, 7, 0
    rng = np.random.default_rng(67)
    batch, L = 64, 128
    codes = [
        jnp.asarray(rng.integers(0, 4, size=(batch, L), dtype=np.uint8)),
        # poly-A: every window shares ONE minimizer -> one partition
        # receives ~the whole batch, far past the probe batch's peak
        jnp.asarray(np.full((batch, L), 3, dtype=np.uint8)),
    ]
    lengths = jnp.full((batch,), L, dtype=jnp.int32)

    def batch_super(b):
        return superkmer.super_records(codes[b], lengths, k=k, m=m)

    # many partitions -> tiny probe-histogram peak -> tiny cap; the poly-A
    # batch then lands ~4 records/read on ONE partition, far past it
    pc = outofcore.partitioned_count_super(
        batch_super, 2, k=k, m=m, partitions=64,
        cutoff=cutoff, kept_cap=65536, group_size=8, expand_chunk=512,
    )
    assert pc.batch_overflows == 0  # healed, not surfaced

    his, los = [], []
    for b in range(2):
        recs = minimizer.fast_scan(codes[b], lengths, k=k, m=m)
        sent = jnp.uint32(0xFFFFFFFF)
        his.append(jnp.where(recs.valid, recs.kmer_hi, sent).reshape(-1))
        los.append(jnp.where(recs.valid, recs.kmer_lo, sent).reshape(-1))
    hi = jnp.concatenate(his)
    recs_all = minimizer.WindowRecords(
        mmer=jnp.zeros((0,), jnp.uint32), kmer_hi=hi,
        kmer_lo=jnp.concatenate(los), valid=hi != jnp.uint32(0xFFFFFFFF),
    )
    kc = count_ops.count_keys(recs_all, cutoff=cutoff)
    want_counts = (
        int(np.sum(np.asarray(kc.group_start & kc.valid))),
        int(np.sum(np.asarray(kc.keep))),
    )
    assert (pc.n_distinct, pc.n_kept) == want_counts
    khi, klo, valid = count_ops.kept_keys_sorted(kc)
    want = {
        (int(a), int(b2))
        for a, b2, v in zip(np.asarray(khi), np.asarray(klo), np.asarray(valid))
        if v
    }
    got = {
        (int(a), int(b2))
        for a, b2, v in zip(
            np.asarray(pc.kmer_hi), np.asarray(pc.kmer_lo), np.asarray(pc.valid)
        )
        if v
    }
    assert got == want


def test_partitioned_count_scan_chunk_matches_per_batch():
    """scan_chunk > 1 (lax.scan-fused multi-batch dispatch) returns
    bit-identical results to the per-batch dispatch loop, for a full
    chunk, a chunk with a tail, and a chunk larger than n_batches."""
    from genome_assembly_tpu.ops import minimizer, outofcore

    k, m = 15, 7
    rng = np.random.default_rng(31)
    genome = jnp.asarray(rng.integers(0, 4, size=3000, dtype=np.uint8))
    n_batches, batch, L = 5, 48, 64
    starts = jnp.asarray(
        rng.integers(0, 3000 - L, size=(n_batches, batch), dtype=np.int32)
    )

    def batch_keys(b):  # traceable: b may be a traced index
        s = starts[b]
        offs = jnp.arange(L, dtype=jnp.int32)
        codes = genome[s[:, None] + offs[None, :]]
        recs = minimizer.fast_scan(
            codes, jnp.full((batch,), L, jnp.int32), k=k, m=m
        )
        sent = jnp.uint32(0xFFFFFFFF)
        return (
            jnp.where(recs.valid, recs.kmer_hi, sent).reshape(-1),
            jnp.where(recs.valid, recs.kmer_lo, sent).reshape(-1),
        )

    kw = dict(partitions=3, cutoff=1, kept_cap=4096, slack=2.0)
    base = outofcore.partitioned_count(batch_keys, n_batches, **kw)
    assert base.batch_overflows == 0
    for chunk in (2, 8):  # 2 -> chunks [2,2,1]; 8 -> clamped to 5
        fused = outofcore.partitioned_count(
            batch_keys, n_batches, scan_chunk=chunk, **kw
        )
        assert fused.batch_overflows == 0
        assert (fused.n_distinct, fused.n_kept) == (
            base.n_distinct, base.n_kept,
        )
        np.testing.assert_array_equal(
            np.asarray(base.kmer_hi), np.asarray(fused.kmer_hi)
        )
        np.testing.assert_array_equal(
            np.asarray(base.kmer_lo), np.asarray(fused.kmer_lo)
        )


def test_partitioned_count_super_scan_chunk_matches_per_batch():
    """Super-record scan_chunk fusion is bit-identical to the per-batch
    dispatch loop (6-lane staging stacked by lax.scan)."""
    from genome_assembly_tpu.ops import outofcore, superkmer

    k, m = 31, 7
    rng = np.random.default_rng(67)
    genome = jnp.asarray(rng.integers(0, 4, size=4000, dtype=np.uint8))
    n_batches, batch, L = 5, 48, 128
    starts = jnp.asarray(
        rng.integers(0, 4000 - L, size=(n_batches, batch), dtype=np.int32)
    )
    lengths = jnp.asarray(
        rng.integers(k, L + 1, size=(n_batches, batch)).astype(np.int32)
    )

    def batch_super(b):  # traceable
        s = starts[b]
        offs = jnp.arange(L, dtype=jnp.int32)
        codes = genome[s[:, None] + offs[None, :]]
        return superkmer.super_records(codes, lengths[b], k=k, m=m)

    kw = dict(k=k, m=m, partitions=6, cutoff=1, kept_cap=65536,
              group_size=2)
    base = outofcore.partitioned_count_super(batch_super, n_batches, **kw)
    assert base.batch_overflows == 0
    # one fused shape (chunks [2,2,1] covers the tail path); the clamp
    # case is covered by the cheaper 2-lane test above -- each extra
    # chunk size is a full scan-of-super_records CPU compile (~minutes)
    for chunk in (2,):
        fused = outofcore.partitioned_count_super(
            batch_super, n_batches, scan_chunk=chunk, **kw
        )
        assert fused.batch_overflows == 0
        assert (fused.n_distinct, fused.n_kept) == (
            base.n_distinct, base.n_kept,
        )
        np.testing.assert_array_equal(
            np.asarray(base.kmer_hi), np.asarray(fused.kmer_hi)
        )
        np.testing.assert_array_equal(
            np.asarray(base.kmer_lo), np.asarray(fused.kmer_lo)
        )


def test_partitioned_count_multihost_ranges(tmp_path):
    """SCALE.md section 2's "an N-host slice divides the passes" made
    executable: two workers count DISJOINT partition ranges
    (only_partitions) into one shared checkpoint dir, then a rangeless
    merge call reproduces the full run bit-for-bit with ZERO re-scans
    (batch_keys is called only for the probe)."""
    import jax.numpy as jnp

    from genome_assembly_tpu.ops import minimizer, outofcore

    k, m, cutoff = 15, 7, 1
    rng = np.random.default_rng(23)
    genome = rng.integers(0, 4, size=2500, dtype=np.uint8)
    n_batches, batch, L = 3, 64, 64
    starts = rng.integers(0, len(genome) - L, size=(n_batches, batch))
    calls = {"n": 0}

    def batch_keys(b):
        calls["n"] += 1
        codes = np.stack([genome[s : s + L] for s in starts[b]])
        recs = minimizer.fast_scan(
            jnp.asarray(codes), jnp.full((batch,), L, jnp.int32), k=k, m=m
        )
        sent = jnp.uint32(0xFFFFFFFF)
        hi = jnp.where(recs.valid, recs.kmer_hi, sent).reshape(-1)
        lo = jnp.where(recs.valid, recs.kmer_lo, sent).reshape(-1)
        return hi, lo

    kw = dict(
        partitions=6, cutoff=cutoff, kept_cap=8192, slack=2.0,
        group_size=2, return_host=True,
    )
    full = outofcore.partitioned_count(batch_keys, n_batches, **kw)
    assert full.batch_overflows == 0

    ck = str(tmp_path / "shared")
    # "host" A counts partitions [0, 3), "host" B counts [3, 6)
    a = outofcore.partitioned_count(
        batch_keys, n_batches, checkpoint_dir=ck,
        only_partitions=(0, 3), **kw,
    )
    b = outofcore.partitioned_count(
        batch_keys, n_batches, checkpoint_dir=ck,
        only_partitions=(3, 6), **kw,
    )
    assert a.n_kept + b.n_kept == full.n_kept
    assert a.n_distinct + b.n_distinct == full.n_distinct

    calls["n"] = 0
    merged = outofcore.partitioned_count(
        batch_keys, n_batches, checkpoint_dir=ck, **kw
    )
    assert calls["n"] == 1, "merge re-scanned instead of loading"
    assert merged.n_kept == full.n_kept
    assert merged.n_distinct == full.n_distinct
    assert set(zip(np.asarray(merged.kmer_hi), np.asarray(merged.kmer_lo))) \
        == set(zip(np.asarray(full.kmer_hi), np.asarray(full.kmer_lo)))

    # a worker without a checkpoint dir must refuse the range
    import pytest as _pytest

    with _pytest.raises(ValueError):
        outofcore.partitioned_count(
            batch_keys, n_batches, only_partitions=(0, 3), **kw
        )


def test_partitioned_count_super_multihost_ranges(tmp_path):
    """only_partitions on the SUPER count: disjoint worker ranges into a
    shared dir + rangeless merge == the undivided run (config 5's
    division story covers the super scheme too)."""
    import jax.numpy as jnp

    from genome_assembly_tpu.ops import outofcore, superkmer

    k, m, cutoff = 31, 7, 1
    rng = np.random.default_rng(61)
    genome = rng.integers(0, 4, size=4000, dtype=np.uint8)
    genome[100:300] = 3
    n_batches, batch, L = 4, 64, 128
    starts = rng.integers(0, len(genome) - L, size=(n_batches, batch))
    lengths = rng.integers(k, L + 1, size=(n_batches, batch)).astype(np.int32)

    def batch_super(b):
        codes = jnp.asarray(np.stack([genome[s : s + L] for s in starts[b]]))
        return superkmer.super_records(codes, jnp.asarray(lengths[b]), k=k, m=m)

    kw = dict(
        k=k, m=m, partitions=9, cutoff=cutoff, kept_cap=65536,
        group_size=4, expand_chunk=512, return_host=True,
    )
    full = outofcore.partitioned_count_super(batch_super, n_batches, **kw)
    assert full.batch_overflows == 0

    ck = str(tmp_path / "shared")
    a = outofcore.partitioned_count_super(
        batch_super, n_batches, checkpoint_dir=ck,
        only_partitions=(0, 5), **kw,
    )
    b = outofcore.partitioned_count_super(
        batch_super, n_batches, checkpoint_dir=ck,
        only_partitions=(5, 9), **kw,
    )
    assert a.n_kept + b.n_kept == full.n_kept
    merged = outofcore.partitioned_count_super(
        batch_super, n_batches, checkpoint_dir=ck, **kw
    )
    assert merged.n_kept == full.n_kept
    assert merged.n_distinct == full.n_distinct
    assert set(zip(np.asarray(merged.kmer_hi), np.asarray(merged.kmer_lo))) \
        == set(zip(np.asarray(full.kmer_hi), np.asarray(full.kmer_lo)))


def test_partitioned_count_super_ragged_groups_match_direct():
    """group_size=None engages the RAGGED group planner (per-partition
    probe caps, pow2-bucketed widths/caps): hot minimizer partitions
    isolate into narrow groups while cold runs group wide.  The counts
    must equal the direct count exactly, and the fixture must actually
    produce heterogeneous group shapes."""
    import jax.numpy as jnp

    from genome_assembly_tpu.ops import count as count_ops
    from genome_assembly_tpu.ops import minimizer, outofcore, superkmer

    k, m, cutoff = 31, 7, 0
    rng = np.random.default_rng(91)
    batch, L, n_batches = 96, 128, 3
    genome = rng.integers(0, 4, size=6000, dtype=np.uint8)
    genome[500:1500] = 3  # hot poly-A minimizer: heavy partition skew
    starts = rng.integers(0, len(genome) - L, size=(n_batches, batch))
    lengths = jnp.full((batch,), L, dtype=jnp.int32)

    codes_all = jnp.asarray(np.stack([
        np.stack([genome[s: s + L] for s in starts[b]])
        for b in range(n_batches)
    ]))

    def codes_of(b):
        # traceable (b may be a scan tracer under scan_chunk > 1)
        return codes_all[b]

    def batch_super(b):
        return superkmer.super_records(codes_of(b), lengths, k=k, m=m)

    # tiny budget so cold partitions NEED wide groups to finish in few
    # passes while the hot partition's pow2 cap forces a narrow group.
    # scan_chunk=3 additionally engages the dispatch-level compaction
    # (retention cap < n_scan * cap), which must not change any result.
    pcs = [
        outofcore.partitioned_count_super(
            batch_super, n_batches, k=k, m=m, partitions=48, cutoff=cutoff,
            kept_cap=1 << 16, expand_chunk=512,
            group_budget_bytes=n_batches * 24 * 4096, scan_chunk=sc,
        )
        for sc in (1, 3)
    ]
    for pc in pcs:
        assert pc.batch_overflows == 0 and not pc.kept_overflow
    pc = pcs[0]

    his, los = [], []
    for b in range(n_batches):
        recs = minimizer.fast_scan(codes_of(b), lengths, k=k, m=m)
        sent = jnp.uint32(0xFFFFFFFF)
        his.append(jnp.where(recs.valid, recs.kmer_hi, sent).reshape(-1))
        los.append(jnp.where(recs.valid, recs.kmer_lo, sent).reshape(-1))
    hi = jnp.concatenate(his)
    recs_all = minimizer.WindowRecords(
        mmer=jnp.zeros((0,), jnp.uint32), kmer_hi=hi,
        kmer_lo=jnp.concatenate(los), valid=hi != jnp.uint32(0xFFFFFFFF),
    )
    kc = count_ops.count_keys(recs_all, cutoff=cutoff)
    assert (pc.n_distinct, pc.n_kept) == (
        int(np.sum(np.asarray(kc.group_start & kc.valid))),
        int(np.sum(np.asarray(kc.keep))),
    )
    khi, klo, valid = count_ops.kept_keys_sorted(kc)
    want = {
        (int(a), int(b2))
        for a, b2, v in zip(np.asarray(khi), np.asarray(klo), np.asarray(valid))
        if v
    }
    for pc in pcs:
        got = {
            (int(a), int(b2))
            for a, b2, v in zip(
                np.asarray(pc.kmer_hi), np.asarray(pc.kmer_lo),
                np.asarray(pc.valid),
            )
            if v
        }
        assert got == want


def test_super_count_hot_partition_subrange_path(monkeypatch):
    """A partition whose expanded windows exceed SUB_COUNT_SLOTS counts
    per key-hash subrange (bounded memory instead of the S_CAP-strided
    whole-partition expansion that RESOURCE_EXHAUSTED the 3 Gbp hot
    minimizer partition).  Forced small threshold; results must equal
    the direct count exactly, including the overflow-escalation path."""
    import jax.numpy as jnp

    from genome_assembly_tpu.ops import count as count_ops
    from genome_assembly_tpu.ops import minimizer, outofcore, superkmer

    k, m, cutoff = 31, 7, 0
    rng = np.random.default_rng(97)
    batch, L, n_batches = 64, 128, 2
    codes = [
        jnp.asarray(rng.integers(0, 4, size=(batch, L), dtype=np.uint8)),
        # poly-A block: ONE minimizer partition holds most records
        jnp.asarray(np.full((batch, L), 3, dtype=np.uint8)),
    ]
    lengths = jnp.full((batch,), L, dtype=jnp.int32)

    def batch_super(b):
        return superkmer.super_records(codes[b], lengths, k=k, m=m)

    # force EVERY partition through the subrange path
    monkeypatch.setattr(outofcore, "SUB_COUNT_SLOTS", 4096)
    pc = outofcore.partitioned_count_super(
        batch_super, n_batches, k=k, m=m, partitions=6, cutoff=cutoff,
        kept_cap=1 << 16, group_size=3, expand_chunk=256,
    )
    assert pc.batch_overflows == 0 and not pc.kept_overflow

    his, los = [], []
    for b in range(n_batches):
        recs = minimizer.fast_scan(codes[b], lengths, k=k, m=m)
        sent = jnp.uint32(0xFFFFFFFF)
        his.append(jnp.where(recs.valid, recs.kmer_hi, sent).reshape(-1))
        los.append(jnp.where(recs.valid, recs.kmer_lo, sent).reshape(-1))
    hi = jnp.concatenate(his)
    recs_all = minimizer.WindowRecords(
        mmer=jnp.zeros((0,), jnp.uint32), kmer_hi=hi,
        kmer_lo=jnp.concatenate(los), valid=hi != jnp.uint32(0xFFFFFFFF),
    )
    kc = count_ops.count_keys(recs_all, cutoff=cutoff)
    assert (pc.n_distinct, pc.n_kept) == (
        int(np.sum(np.asarray(kc.group_start & kc.valid))),
        int(np.sum(np.asarray(kc.keep))),
    )
    khi, klo, valid = count_ops.kept_keys_sorted(kc)
    want = {
        (int(a), int(b2))
        for a, b2, v in zip(np.asarray(khi), np.asarray(klo), np.asarray(valid))
        if v
    }
    got = {
        (int(a), int(b2))
        for a, b2, v in zip(
            np.asarray(pc.kmer_hi), np.asarray(pc.kmer_lo), np.asarray(pc.valid)
        )
        if v
    }
    assert got == want
