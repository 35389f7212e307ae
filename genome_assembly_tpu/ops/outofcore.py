"""Out-of-core counting: hash-partitioned multi-pass for beyond-HBM inputs.

A chromosome-scale run's window records exceed HBM (celegans preset: 2.9G
records x 8 B = 23 GB on a 16 GB chip), but the RECORD STREAM is cheap to
regenerate -- the scan runs at 13.7G windows/s and reads re-stream from
disk or from the on-device read simulator.  So, KMC-style (PAPERS.md):

  pass p of P:  re-scan every batch, keep only records whose key-hash
  partition is p (mask -> sort -> fixed-size slice), count partition p
  entirely in HBM.

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


@functools.partial(jax.jit, static_argnames=("partitions", "cap_bp"))
def extract_partition(
    hi: jnp.ndarray, lo: jnp.ndarray, part: jnp.ndarray, *,
    partitions: int, cap_bp: int
):
    """Keep one partition's records from a batch, compacted to cap_bp slots.

    hi/lo: flat key lanes (SENTINEL = invalid).  part: partition to keep
    (traced scalar, so one executable serves all passes).  Non-partition
    records become SENTINEL; one 2-lane sort compacts real records to the
    front; the fixed-size head slice is the pass's contribution.
    Returns (hi[cap_bp], lo[cap_bp], overflowed) -- overflowed means a real
    record sat at the slice boundary, i.e. cap_bp was too small.
    """
    keep = (key_partition(hi, lo, partitions) == part) & (hi != SENTINEL)
    hi_m = jnp.where(keep, hi, SENTINEL)
    lo_m = jnp.where(keep, lo, SENTINEL)
    hi_s, lo_s = lax.sort((hi_m, lo_m), num_keys=2)
    overflowed = hi_s[cap_bp] != SENTINEL if cap_bp < hi.shape[0] else jnp.bool_(False)
    return hi_s[:cap_bp], lo_s[:cap_bp], overflowed


class PartitionedCount(NamedTuple):
    """Union of per-partition pruned keys (unordered across partitions)."""

    kmer_hi: jnp.ndarray  # [kept_cap] kept canonical keys, sentinel-padded
    kmer_lo: jnp.ndarray
    valid: jnp.ndarray
    n_distinct: int
    n_kept: int
    batch_overflows: int  # nonzero => raise slack
    kept_overflow: bool  # kept keys exceeded kept_cap => raise kept_cap


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
    SENTINEL); called P times per batch, so it should be a cheap jitted
    regeneration (device read simulation, or a re-streamed file read).

    checkpoint_dir: if given, each completed partition's kept keys land in
    ``part_<p>.npz`` there and are skipped on re-run -- a killed
    chromosome-scale job resumes at its last finished pass (the elasticity
    model of SURVEY.md 5.3/5.4: passes are idempotent and independent).
    """
    probe_hi, probe_lo = batch_keys(0)
    batch_slots = int(probe_hi.shape[0])
    cap_bp = min(
        batch_slots,
        int(np.ceil(batch_slots / partitions * slack)) + 1,
    )
    per_part_kept = max(1, kept_cap // partitions)

    ckpt = None
    if checkpoint_dir is not None:
        import json
        import pathlib

        ckpt = pathlib.Path(checkpoint_dir)
        ckpt.mkdir(parents=True, exist_ok=True)
        # fingerprint: partition checkpoints are only valid for the exact
        # run parameters (a different partition count remaps every key)
        fp = {
            "partitions": partitions,
            "cutoff": cutoff,
            "kept_cap": kept_cap,
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

    khi_parts, klo_parts = [], []
    n_distinct = 0
    n_kept = 0
    batch_overflows = 0
    kept_overflow = False
    for p in range(partitions):
        if ckpt is not None and (ckpt / f"part_{p}.npz").exists():
            saved = np.load(ckpt / f"part_{p}.npz")
            khi_parts.append(jnp.asarray(saved["khi"]))
            klo_parts.append(jnp.asarray(saved["klo"]))
            n_distinct += int(saved["n_distinct"])
            n_kept += int(saved["n_kept"])
            kept_overflow |= bool(saved["kept_overflow"])
            batch_overflows += int(saved["batch_overflows"])
            continue
        pieces_hi, pieces_lo = [], []
        # accumulate overflow on device; ONE readback per pass (a per-batch
        # int() would block the dispatch pipeline on the relay every batch)
        ovf_dev = jnp.int32(0)
        for b in range(n_batches):
            hi, lo = batch_keys(b)
            phi, plo, ovf = extract_partition(
                hi, lo, jnp.uint32(p), partitions=partitions, cap_bp=cap_bp
            )
            pieces_hi.append(phi)
            pieces_lo.append(plo)
            ovf_dev = ovf_dev + ovf.astype(jnp.int32)
        pass_overflows = int(ovf_dev)
        batch_overflows += pass_overflows
        cat_hi = jnp.concatenate(pieces_hi)
        cat_lo = jnp.concatenate(pieces_lo)
        del pieces_hi, pieces_lo  # free the staging copies before counting
        recs = WindowRecords(
            mmer=jnp.zeros((0,), jnp.uint32),
            kmer_hi=cat_hi,
            kmer_lo=cat_lo,
            valid=cat_hi != SENTINEL,
        )
        kc = count_ops.count_keys(recs, cutoff=cutoff, pallas_sort=pallas_sort)
        del recs, cat_hi, cat_lo  # the sorted copies in kc supersede these
        n_distinct_p = int(jnp.sum(kc.group_start & kc.valid))
        n_distinct += n_distinct_p
        n_kept_p = int(jnp.sum(kc.keep))
        n_kept += n_kept_p
        kept_overflow |= n_kept_p > per_part_kept
        khi, klo, _ = count_ops.kept_keys_sorted(kc)
        del kc
        khi_parts.append(khi[:per_part_kept])
        klo_parts.append(klo[:per_part_kept])
        if ckpt is not None:
            # savez appends ".npz" unless the name already ends with it
            tmp = ckpt / f"part_{p}.tmp.npz"
            np.savez_compressed(
                tmp,
                khi=np.asarray(khi_parts[-1]),
                klo=np.asarray(klo_parts[-1]),
                n_distinct=np.int64(n_distinct_p),
                n_kept=np.int64(n_kept_p),
                kept_overflow=np.bool_(n_kept_p > per_part_kept),
                batch_overflows=np.int64(pass_overflows),
            )
            tmp.rename(ckpt / f"part_{p}.npz")

    kmer_hi = jnp.concatenate(khi_parts)
    kmer_lo = jnp.concatenate(klo_parts)
    valid = kmer_hi != SENTINEL
    return PartitionedCount(
        kmer_hi=kmer_hi,
        kmer_lo=kmer_lo,
        valid=valid,
        n_distinct=n_distinct,
        n_kept=n_kept,
        batch_overflows=batch_overflows,
        kept_overflow=kept_overflow,
    )
