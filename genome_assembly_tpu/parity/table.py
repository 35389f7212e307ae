"""Host-side materialization of the device-counted table.

Converts the padded, sorted CountedTable arrays into the string-keyed
structures the parity replay engine and the printers consume.  This is the
only place device 2-bit keys become Python strings; it runs once per phase
boundary, never per record on the hot path (vectorized numpy throughout).
"""

from __future__ import annotations

from typing import Dict, List, NamedTuple, Tuple

import numpy as np

from genome_assembly_tpu.ops import encode
from genome_assembly_tpu.ops.count import CountedTable


class HostTable(NamedTuple):
    """Pruned table in stream-insertion order, ready for replay.

    Entries are sorted by (mmer, kmer) packed keys; each holds its occurrence
    read ids in stream (ascending) order.  ``first_seen`` is the flat stream
    index of the group's first occurrence -- the replay engine sorts by it to
    recover the reference's insertion order.
    """

    mmer: np.ndarray  # [G] uint32
    kmer_hi: np.ndarray  # [G] uint32
    kmer_lo: np.ndarray  # [G] uint32
    count: np.ndarray  # [G] int32
    first_seen: np.ndarray  # [G] uint32 stream index of first occurrence
    read_ids: List[np.ndarray]  # per group, stream order


def extract_groups(table: CountedTable, *, pruned: bool = True) -> HostTable:
    """Pull surviving (or all valid) groups off-device."""
    mmer = np.asarray(table.mmer)
    khi = np.asarray(table.kmer_hi)
    klo = np.asarray(table.kmer_lo)
    rid = np.asarray(table.read_id)
    stream = np.asarray(table.stream_idx)
    valid = np.asarray(table.valid)
    group_start = np.asarray(table.group_start)
    count = np.asarray(table.count)
    keep = np.asarray(table.keep)

    starts = np.flatnonzero(group_start & valid)
    if pruned:
        starts = starts[keep[starts]]
    sizes = count[starts]
    read_ids = [rid[s : s + c] for s, c in zip(starts, sizes)]
    return HostTable(
        mmer=mmer[starts],
        kmer_hi=khi[starts],
        kmer_lo=klo[starts],
        count=sizes.astype(np.int32),
        first_seen=stream[starts],
        read_ids=read_ids,
    )


def extract_groups_with_streams(
    table: CountedTable, *, pruned: bool = True
) -> Tuple[HostTable, List[np.ndarray]]:
    """extract_groups plus each group's per-occurrence stream indices.

    The stream lane rides the same stable sort as read ids, so
    streams[g][j] is the flat (read, window) position of read_ids[g][j] --
    what the non-ACGT exception path (parity/nonacgt.py) needs to map
    occurrences back to raw read bytes.
    """
    stream = np.asarray(table.stream_idx)
    valid = np.asarray(table.valid)
    group_start = np.asarray(table.group_start)
    count = np.asarray(table.count)
    keep = np.asarray(table.keep)
    starts = np.flatnonzero(group_start & valid)
    if pruned:
        starts = starts[keep[starts]]
    sizes = count[starts]
    streams = [stream[s : s + c] for s, c in zip(starts, sizes)]
    return extract_groups(table, pruned=pruned), streams


def decode_table(
    host: HostTable, k: int, m: int
) -> Dict[Tuple[str, str], List[int]]:
    """String-keyed pruned table: (mmer, kmer) -> read ids descending.

    Matches parity.model.count_table for differential tests.
    """
    out: Dict[Tuple[str, str], List[int]] = {}
    for i in range(len(host.mmer)):
        sig = encode.unpack_int(int(host.mmer[i]), m)
        kmer = encode.unpack_int(
            encode.split_to_int(host.kmer_hi[i], host.kmer_lo[i], k), k
        )
        out[(sig, kmer)] = list(map(int, host.read_ids[i][::-1]))
    return out
