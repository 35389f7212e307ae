"""Out-of-core counting: hash-partitioned multi-pass for beyond-HBM inputs.

A chromosome-scale run's window records exceed HBM (celegans preset: 2.9G
records x 8 B = 23 GB on a 16 GB chip), but the RECORD STREAM is cheap to
regenerate -- the scan runs at 13.7G windows/s and reads re-stream from
disk or from the on-device read simulator.  So, KMC-style (PAPERS.md):

  pass g of ceil(P/3):  re-scan every batch once, extracting THREE
  partitions per scan (a 2-bit partition tag folded into the key lane's
  spare top bits makes one batch sort lay all three out as contiguous
  runs), then count each partition entirely in HBM.

All of a key's duplicates share its hash, so per-partition counts are
complete and partitions are disjoint: the union of per-partition kept keys
IS the global pruned k-mer set (unordered across partitions; the sort-join
dBG builder does not need global order).

Device memory per pass: n_batches x cap_bp slots where cap_bp =
batch_slots/P x slack; compaction slack overflow is detected exactly
(the slice boundary still holding a real record), never silent.

Reference contrast: the reference would simply exhaust RAM (~1 kB per
occurrence, SURVEY.md section 6); no out-of-core path exists there.
"""

from __future__ import annotations

import functools
from typing import Callable, NamedTuple, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from genome_assembly_tpu.ops import count as count_ops
from genome_assembly_tpu.ops.minimizer import WindowRecords

from genome_assembly_tpu.common import (
    HASH_A as _HASH_A,
    HASH_B as _HASH_B,
    SENTINEL,
)


def key_partition(hi: jnp.ndarray, lo: jnp.ndarray, partitions: int) -> jnp.ndarray:
    """Uniform partition id from both key lanes (same family as
    parallel/part_dbg ownership hashing)."""
    h = (hi * _HASH_A) ^ (lo * _HASH_B)
    return ((h >> 9) % jnp.uint32(partitions)).astype(jnp.uint32)


GROUP = 3  # partitions extracted per scan: the tag rides in the key lane's
# spare top bits (k <= 31 => hi < 2^30).  NOT 4: tag 3 with hi=0x3FFFFFFF
# (a poly-A prefix at k=31) would collide with the SENTINEL encoding;
# tags 0..2 keep every real composite < 0xC0000000, strictly below any
# sentinel, so membership tests are unambiguous for every k <= 31.


@functools.partial(jax.jit, static_argnames=("partitions", "cap_bp"))
def extract_partition_group(
    hi: jnp.ndarray, lo: jnp.ndarray, group: jnp.ndarray, *,
    partitions: int, cap_bp: int
):
    """Extract partitions [group*GROUP, (group+1)*GROUP) from one batch.

    hi/lo: flat key lanes (SENTINEL = invalid).  group: traced scalar (one
    executable serves every pass).  The in-group partition index is folded
    into bits 30..31 of the hi lane; a single 2-lane sort then lays the
    GROUP partitions out as contiguous runs with all non-group records at
    the end, and each run's fixed-size slice starts at a searchsorted
    boundary.  Returns (hi [GROUP, cap_bp], lo [GROUP, cap_bp],
    overflows [GROUP]) with non-members masked back to SENTINEL.
    """
    pid = key_partition(hi, lo, partitions).astype(jnp.int32)
    rel = pid - group.astype(jnp.int32) * GROUP
    keep = (rel >= 0) & (rel < GROUP) & (hi != SENTINEL)
    rel_u = jnp.where(keep, rel, 0).astype(jnp.uint32)
    comp = jnp.where(keep, (rel_u << 30) | hi, SENTINEL)
    lo_m = jnp.where(keep, lo, SENTINEL)
    comp_s, lo_s = lax.sort((comp, lo_m), num_keys=2)
    n = comp_s.shape[0]
    bounds = jnp.searchsorted(
        comp_s, jnp.arange(GROUP, dtype=jnp.uint32) << 30, side="left"
    ).astype(jnp.int32)
    his, los, ovfs = [], [], []
    for r in range(GROUP):
        start = jnp.clip(bounds[r], 0, n - cap_bp) if cap_bp <= n else 0
        chi = lax.dynamic_slice_in_dim(comp_s, start, cap_bp)
        clo = lax.dynamic_slice_in_dim(lo_s, start, cap_bp)
        member = (chi >> 30) == r  # sentinels decode to tag 3 > any r
        # slice tails may hold the next run's records; mask them out
        his.append(jnp.where(member, chi & jnp.uint32((1 << 30) - 1), SENTINEL))
        los.append(jnp.where(member, clo, SENTINEL))
        # overflow: the run extends past the slice (the record at
        # bounds[r] + cap_bp still belongs to r)
        probe = jnp.clip(bounds[r] + cap_bp, 0, n - 1)
        ovfs.append(
            ((comp_s[probe] >> 30) == r) & (bounds[r] + cap_bp < n)
        )
    return jnp.stack(his), jnp.stack(los), jnp.stack(ovfs)


@functools.partial(jax.jit, static_argnames=("partitions", "cap_bp"))
def extract_partition_group3(
    hi: jnp.ndarray, lo: jnp.ndarray, pay: jnp.ndarray, group: jnp.ndarray, *,
    partitions: int, cap_bp: int
):
    """Payload-carrying variant of :func:`extract_partition_group`.

    Same tag-folding compaction over (hi, lo) keys, with a third uint32
    payload lane riding through the sort (the out-of-core LINK builder's
    records carry side|state ids).  Key hi lanes must stay < 2^30 -- true
    for both k-mer keys (k <= 31) and the (k-1)-mer boundary keys.
    Returns (hi [GROUP, cap_bp], lo, pay, overflows [GROUP]); non-members
    are masked back to SENTINEL in all three lanes.
    """
    pid = key_partition(hi, lo, partitions).astype(jnp.int32)
    rel = pid - group.astype(jnp.int32) * GROUP
    keep = (rel >= 0) & (rel < GROUP) & (hi != SENTINEL)
    rel_u = jnp.where(keep, rel, 0).astype(jnp.uint32)
    comp = jnp.where(keep, (rel_u << 30) | hi, SENTINEL)
    lo_m = jnp.where(keep, lo, SENTINEL)
    pay_m = jnp.where(keep, pay, SENTINEL)
    comp_s, lo_s, pay_s = lax.sort((comp, lo_m, pay_m), num_keys=2)
    n = comp_s.shape[0]
    bounds = jnp.searchsorted(
        comp_s, jnp.arange(GROUP, dtype=jnp.uint32) << 30, side="left"
    ).astype(jnp.int32)
    his, los, pays, ovfs = [], [], [], []
    for r in range(GROUP):
        start = jnp.clip(bounds[r], 0, n - cap_bp) if cap_bp <= n else 0
        chi = lax.dynamic_slice_in_dim(comp_s, start, cap_bp)
        clo = lax.dynamic_slice_in_dim(lo_s, start, cap_bp)
        cpay = lax.dynamic_slice_in_dim(pay_s, start, cap_bp)
        member = (chi >> 30) == r
        his.append(jnp.where(member, chi & jnp.uint32((1 << 30) - 1), SENTINEL))
        los.append(jnp.where(member, clo, SENTINEL))
        pays.append(jnp.where(member, cpay, SENTINEL))
        probe = jnp.clip(bounds[r] + cap_bp, 0, n - 1)
        ovfs.append(((comp_s[probe] >> 30) == r) & (bounds[r] + cap_bp < n))
    return jnp.stack(his), jnp.stack(los), jnp.stack(pays), jnp.stack(ovfs)


class PartitionedCount(NamedTuple):
    """Union of per-partition pruned keys (unordered across partitions)."""

    kmer_hi: jnp.ndarray  # [n_kept] kept canonical keys (exact size: each
    kmer_lo: jnp.ndarray  # partition is trimmed to its true kept count)
    valid: jnp.ndarray
    n_distinct: int
    n_kept: int
    batch_overflows: int  # nonzero => raise slack
    kept_overflow: bool  # total kept keys exceeded kept_cap (global test)


def partitioned_count(
    batch_keys: Callable[[int], Tuple[jnp.ndarray, jnp.ndarray]],
    n_batches: int,
    *,
    partitions: int,
    cutoff: int,
    kept_cap: int,
    slack: float = 1.6,
    pallas_sort: bool = False,
    checkpoint_dir: str | None = None,
) -> PartitionedCount:
    """Count n_batches record batches in ``partitions`` re-scan passes.

    batch_keys(i) -> (hi, lo) flat uint32 key lanes for batch i (invalid =
    SENTINEL); called ceil(P/3) times per batch (each re-scan serves a
    GROUP of 3 partitions), so it should be a cheap jitted regeneration
    (device read simulation, or a re-streamed file read).

    checkpoint_dir: if given, each completed partition's kept keys land in
    ``part_<p>.npz`` there and are skipped on re-run -- a killed
    chromosome-scale job resumes at its last finished pass (the elasticity
    model of SURVEY.md 5.3/5.4: passes are idempotent and independent).

    Each partition's kept keys are trimmed to their TRUE count on the host
    before accumulation (no per-partition padding), so hash skew between
    partitions cannot fake an overflow and the returned arrays are exactly
    n_kept long -- downstream link-building sorts see no dead rows.
    kept_overflow is a single global test (n_kept > kept_cap).
    """
    probe_hi, probe_lo = batch_keys(0)
    batch_slots = int(probe_hi.shape[0])
    cap_bp = min(
        batch_slots,
        int(np.ceil(batch_slots / partitions * slack)) + 1,
    )

    ckpt = None
    if checkpoint_dir is not None:
        import json
        import pathlib

        ckpt = pathlib.Path(checkpoint_dir)
        ckpt.mkdir(parents=True, exist_ok=True)
        # fingerprint: partition checkpoints are only valid for the exact
        # run parameters (a different partition count remaps every key).
        # "format": 2 = trimmed per-partition kept arrays (kept_cap no
        # longer affects partition contents, so it is not fingerprinted).
        fp = {
            "format": 2,
            "partitions": partitions,
            "cutoff": cutoff,
            "slack": slack,
            "n_batches": n_batches,
            "batch_slots": batch_slots,
        }
        meta_path = ckpt / "meta.json"
        if meta_path.exists():
            old = json.loads(meta_path.read_text())
            if old != fp:
                raise ValueError(
                    f"checkpoint_dir {ckpt} was written by a different "
                    f"configuration: {old} != {fp}; use a fresh directory"
                )
        else:
            meta_path.write_text(json.dumps(fp))

    def load_part(p):
        saved = np.load(ckpt / f"part_{p}.npz")
        return (
            saved["khi"],
            saved["klo"],
            int(saved["n_distinct"]),
            int(saved["n_kept"]),
            int(saved["batch_overflows"]),
        )

    khi_parts, klo_parts = [], []
    n_distinct = 0
    n_kept = 0
    batch_overflows = 0
    n_groups = (partitions + GROUP - 1) // GROUP
    for g in range(n_groups):
        group_parts = [
            p for p in range(g * GROUP, min((g + 1) * GROUP, partitions))
        ]
        missing = [
            p
            for p in group_parts
            if ckpt is None or not (ckpt / f"part_{p}.npz").exists()
        ]
        if not missing:
            for p in group_parts:
                khi, klo, nd, nk, bo = load_part(p)
                khi_parts.append(khi)
                klo_parts.append(klo)
                n_distinct += nd
                n_kept += nk
                batch_overflows += bo
            continue

        # one re-scan serves the whole group: GROUP partition runs per
        # batch sort, accumulated separately
        pieces_hi = [[] for _ in range(GROUP)]
        pieces_lo = [[] for _ in range(GROUP)]
        # accumulate overflow on device; ONE readback per group (a
        # per-batch int() would stall the relay dispatch pipeline)
        ovf_dev = jnp.zeros((GROUP,), jnp.int32)
        for b in range(n_batches):
            hi, lo = batch_keys(b)
            ghi, glo, ovf = extract_partition_group(
                hi, lo, jnp.uint32(g), partitions=partitions, cap_bp=cap_bp
            )
            for r in range(GROUP):
                pieces_hi[r].append(ghi[r])
                pieces_lo[r].append(glo[r])
            ovf_dev = ovf_dev + ovf.astype(jnp.int32)
        group_overflows = np.asarray(ovf_dev)

        for r in range(GROUP):
            p = g * GROUP + r
            if p >= partitions:
                continue
            if ckpt is not None and (ckpt / f"part_{p}.npz").exists():
                khi, klo, nd, nk, bo = load_part(p)
                khi_parts.append(khi)
                klo_parts.append(klo)
                n_distinct += nd
                n_kept += nk
                batch_overflows += bo
                continue
            pass_overflows = int(group_overflows[r])
            batch_overflows += pass_overflows
            cat_hi = jnp.concatenate(pieces_hi[r])
            cat_lo = jnp.concatenate(pieces_lo[r])
            pieces_hi[r] = pieces_lo[r] = None  # free staging before count
            recs = WindowRecords(
                mmer=jnp.zeros((0,), jnp.uint32),
                kmer_hi=cat_hi,
                kmer_lo=cat_lo,
                valid=cat_hi != SENTINEL,
            )
            kc = count_ops.count_keys(
                recs, cutoff=cutoff, pallas_sort=pallas_sort
            )
            del recs, cat_hi, cat_lo  # kc's sorted copies supersede these
            n_distinct_p = int(jnp.sum(kc.group_start & kc.valid))
            n_distinct += n_distinct_p
            n_kept_p = int(jnp.sum(kc.keep))
            n_kept += n_kept_p
            khi, klo, _ = count_ops.kept_keys_sorted(kc)
            del kc
            # trim to the partition's TRUE kept count (kept keys are
            # compacted to the front) and park on the host: no padding can
            # reach the final concatenation, and the device frees this
            # pass's arrays before the next group's staging begins
            khi_parts.append(np.asarray(khi[:n_kept_p]))
            klo_parts.append(np.asarray(klo[:n_kept_p]))
            del khi, klo
            if ckpt is not None:
                # savez appends ".npz" unless the name already ends with it
                tmp = ckpt / f"part_{p}.tmp.npz"
                np.savez_compressed(
                    tmp,
                    khi=khi_parts[-1],
                    klo=klo_parts[-1],
                    n_distinct=np.int64(n_distinct_p),
                    n_kept=np.int64(n_kept_p),
                    batch_overflows=np.int64(pass_overflows),
                )
                tmp.rename(ckpt / f"part_{p}.npz")

    kmer_hi = jnp.asarray(
        np.concatenate([np.asarray(a, dtype=np.uint32) for a in khi_parts])
    )
    kmer_lo = jnp.asarray(
        np.concatenate([np.asarray(a, dtype=np.uint32) for a in klo_parts])
    )
    valid = kmer_hi != SENTINEL
    return PartitionedCount(
        kmer_hi=kmer_hi,
        kmer_lo=kmer_lo,
        valid=valid,
        n_distinct=n_distinct,
        n_kept=n_kept,
        batch_overflows=batch_overflows,
        kept_overflow=n_kept > kept_cap,
    )
