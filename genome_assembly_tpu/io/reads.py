"""Read loading.

Parity mode must reproduce the reference driver's input handling exactly
(binning.c:1154-1166, SURVEY.md 2.1.6): ``fgets(read, READ_LENGTH=101, file)``
reads at most 100 characters per call; the driver then chops the final
character of whatever it got (assuming it was the newline).  Consequences for
100-bp lines: the line body is consumed in a 100-char chunk whose last *base*
is chopped (reads become 99 bp), and the still-unread newline becomes a
separate empty "read" that consumes a read id of its own (real reads get ids
0, 2, 4, ... on reads.txt).
"""

from __future__ import annotations

import dataclasses
from typing import Iterator, List, Sequence

import numpy as np

from genome_assembly_tpu.ops import encode

_ACGT = frozenset("ACGT")


def fgets_chunks(data: bytes, buffer_size: int) -> Iterator[str]:
    """Yield the successive strings fgets(buf, buffer_size) would return.

    Each chunk is at most ``buffer_size - 1`` characters and ends either at a
    newline (inclusive) or at the character limit.
    """
    limit = buffer_size - 1
    pos = 0
    n = len(data)
    while pos < n:
        nl = data.find(b"\n", pos, pos + limit)
        end = nl + 1 if nl != -1 else min(pos + limit, n)
        yield data[pos:end].decode("latin-1")
        pos = end


def load_reads_parity(path: str, read_length: int = 101) -> List[str]:
    """Load reads the way the reference ``main`` does.

    Returns one string per consumed read id, including empty reads from
    leftover newlines; each chunk has its final character chopped
    (``read[--len] = '\\0'``, binning.c:1162).
    """
    with open(path, "rb") as f:
        data = f.read()
    return [chunk[:-1] for chunk in fgets_chunks(data, read_length)]


def load_reads_fast(path: str) -> List[str]:
    """Load reads sanely: one read per line, newline stripped, no truncation.

    Accepts plain one-read-per-line files and FASTA ('>' header lines are
    skipped and sequences are NOT joined across lines -- long-read FASTA
    should be pre-flattened or fed through load_fasta).
    """
    out = []
    with open(path, "r") as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith(">"):
                continue
            out.append(line)
    return out


def load_fasta(path: str) -> List[str]:
    """Load FASTA records, joining sequence lines per record."""
    out: List[str] = []
    cur: List[str] = []
    with open(path, "r") as f:
        for line in f:
            line = line.strip()
            if line.startswith(">"):
                if cur:
                    out.append("".join(cur))
                    cur = []
            elif line:
                cur.append(line)
    if cur:
        out.append("".join(cur))
    return out


def validate_acgt(reads: Sequence[str]) -> None:
    """Parity mode requires pure-ACGT input.

    The reference stores raw characters in its keys: a non-ACGT character is
    *scored* as 'A' (getval default, binning.c:107-109) but printed verbatim
    when the k-mer is not complemented -- a distinction the 2-bit device
    representation cannot carry.  Rather than silently mismatch, reject.
    """
    for i, r in enumerate(reads):
        if not _ACGT.issuperset(r):
            bad = sorted(set(r) - _ACGT)
            raise ValueError(
                f"parity mode requires ACGT-only reads; read {i} contains "
                f"{bad} (the reference would score these as 'A' but print "
                "them verbatim, which 2-bit packing cannot represent)"
            )


@dataclasses.dataclass
class ReadBatch:
    """A padded device-ready batch of reads.

    codes: [n, max_len] uint8, 2-bit base codes, zero-padded.
    lengths: [n] int32 actual lengths.
    read_ids: [n] uint32 global read ids (parity mode: includes gaps for
      empty reads, which are simply absent here but still numbered).
    """

    codes: np.ndarray
    lengths: np.ndarray
    read_ids: np.ndarray

    @property
    def n(self) -> int:
        return self.codes.shape[0]


def batch_reads(
    reads: Sequence[str],
    max_len: int,
    batch_size: int | None = None,
    start_id: int = 0,
    parity_chars: bool = False,
) -> List[ReadBatch]:
    """Encode and pad reads into fixed-shape batches.

    Every read (even empty ones) consumes a read id, mirroring the reference
    driver.  Reads longer than ``max_len`` are rejected here; long sequences
    go through the halo'd segment path (parallel/halo.py).

    parity_chars: encode with the reference's exact getval table (only
    uppercase TGCA are real; lowercase/N/etc. score as 'A') instead of the
    lenient fast-mode table that accepts lowercase bases.
    """
    ids = np.arange(start_id, start_id + len(reads), dtype=np.uint32)
    for r in reads:
        if len(r) > max_len:
            raise ValueError(
                f"read of length {len(r)} exceeds max_read_len={max_len}; "
                "use the halo'd long-sequence path"
            )
    if batch_size is None:
        batch_size = max(1, len(reads))
    # getval-exact scoring matters for dirty reads: lowercase c/g/t map to
    # their real codes in the lenient table but score 3 ('A') in the
    # reference, and one wrong score corrupts the stale-signature choice
    # for every later window of the read (binning.c:91-111)
    enc = encode.encode_str_parity if parity_chars else encode.encode_str
    batches = []
    for ofs in range(0, max(len(reads), 1), batch_size):
        chunk = reads[ofs : ofs + batch_size]
        if not chunk:
            break
        n = len(chunk)
        codes = np.zeros((n, max_len), dtype=np.uint8)
        lengths = np.zeros(n, dtype=np.int32)
        for i, r in enumerate(chunk):
            lengths[i] = len(r)
            if r:
                codes[i, : len(r)] = enc(r)
        batches.append(ReadBatch(codes, lengths, ids[ofs : ofs + n]))
    return batches


def chunk_long_sequence(seq: str, chunk_len: int, k: int) -> List[str]:
    """Split a long sequence into chunks overlapping by k-1 bases.

    Every k-window of the original sequence appears in exactly one chunk
    (the one owning its start position) -- the single-device analogue of
    the distributed halo exchange (parallel/halo.py).
    """
    if chunk_len < k:
        raise ValueError(f"chunk_len {chunk_len} must be >= k {k}")
    step = chunk_len - (k - 1)
    out = []
    for start in range(0, max(len(seq) - (k - 1), 1), step):
        chunk = seq[start : start + chunk_len]
        if len(chunk) >= k or start == 0:
            out.append(chunk)
    return out


def pad_batch(batch: ReadBatch, to_n: int) -> ReadBatch:
    """Pad a batch with empty reads up to ``to_n`` rows (static shapes)."""
    n = batch.n
    if n == to_n:
        return batch
    if n > to_n:
        raise ValueError(f"batch of {n} cannot pad down to {to_n}")
    codes = np.zeros((to_n, batch.codes.shape[1]), dtype=np.uint8)
    codes[:n] = batch.codes
    lengths = np.zeros(to_n, dtype=np.int32)
    lengths[:n] = batch.lengths
    read_ids = np.zeros(to_n, dtype=np.uint32)
    read_ids[:n] = batch.read_ids
    return ReadBatch(codes, lengths, read_ids)
