"""Base-pair codec and 2-bit packing primitives.

Encoding convention follows the reference exactly (binning.c:69-124):
codes are T=0, G=1, C=2, A=3; the base-4 MSB-first "score" of a string equals
its 2-bit packed integer; a higher score means a lexicographically *smaller*
string (because 'A' has the highest code).  The complement (A<->T, C<->G) of a
code c is ``3 - c``; note the reference's "reverse complement" is a
per-position complement *without* reversal (binning.c:1029-1040, SURVEY.md
2.1.1) -- fast mode uses the true reverse complement, parity mode the
reference's plain complement.

k-mers with k <= 31 pack into at most 62 bits.  TPUs have no native int64, so
a packed k-mer is carried as two uint32 lanes: ``hi`` holds the first
``k - min(k, 16)`` bases and ``lo`` the final ``min(k, 16)`` bases, both
MSB-first.  (hi, lo) compares lexicographically like the string scores.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

# Base characters indexed by numeric code (reference getbp, binning.c:69-88).
BASE_BY_CODE = "TGCA"

# ASCII -> code lookup. Unknown characters map to 3 ('A'), matching the
# reference's getval default (binning.c:107-109).
_ASCII_TO_CODE = np.full(256, 3, dtype=np.uint8)
for _i, _ch in enumerate(BASE_BY_CODE):
    _ASCII_TO_CODE[ord(_ch)] = _i
    _ASCII_TO_CODE[ord(_ch.lower())] = _i

_CODE_TO_ASCII = np.frombuffer(BASE_BY_CODE.encode(), dtype=np.uint8).copy()


def encode_bytes(ascii_u8: jnp.ndarray) -> jnp.ndarray:
    """Map ASCII bytes to 2-bit codes (uint8). Device-side lookup."""
    table = jnp.asarray(_ASCII_TO_CODE)
    return jnp.take(table, ascii_u8.astype(jnp.int32), axis=0)


def decode_codes(codes: jnp.ndarray) -> jnp.ndarray:
    """Map 2-bit codes back to ASCII bytes."""
    table = jnp.asarray(_CODE_TO_ASCII)
    return jnp.take(table, codes.astype(jnp.int32), axis=0)


def complement(codes: jnp.ndarray) -> jnp.ndarray:
    """Per-position complement: code -> 3 - code (binning.c:1031-1039)."""
    return (3 - codes.astype(jnp.int32)).astype(codes.dtype)


def windowed_scores(codes: jnp.ndarray, n: int) -> jnp.ndarray:
    """Packed base-4 MSB-first scores of every length-``n`` window.

    Equivalent to the reference's getscore (binning.c:114-124) applied to each
    substring.  ``codes`` has shape [..., L]; the result has shape
    [..., L - n + 1] and dtype uint32.  Requires n <= 15 so the score fits a
    uint32 with headroom (2n bits <= 30).
    """
    if n > 15:
        raise ValueError(f"windowed_scores supports n <= 15, got {n}")
    length = codes.shape[-1]
    nwin = length - n + 1
    if nwin <= 0:
        raise ValueError(f"window {n} longer than sequence {length}")
    acc = jnp.zeros(codes.shape[:-1] + (nwin,), dtype=jnp.uint32)
    for j in range(n):
        acc = (acc << 2) | codes[..., j : j + nwin].astype(jnp.uint32)
    return acc


def pack_kmers(codes: jnp.ndarray, k: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Pack every length-``k`` window into (hi, lo) uint32 lanes, MSB-first.

    hi holds the first ``k - n_lo`` bases, lo the final ``n_lo = min(k, 16)``
    bases.  Shapes: [..., L] -> two arrays [..., L - k + 1].
    """
    if k > 31:
        raise ValueError(f"pack_kmers supports k <= 31, got {k}")
    length = codes.shape[-1]
    nwin = length - k + 1
    if nwin <= 0:
        raise ValueError(f"k={k} longer than sequence {length}")
    n_lo = min(k, 16)
    n_hi = k - n_lo
    u32 = codes.astype(jnp.uint32)
    hi = jnp.zeros(codes.shape[:-1] + (nwin,), dtype=jnp.uint32)
    for j in range(n_hi):
        hi = (hi << 2) | u32[..., j : j + nwin]
    lo = jnp.zeros(codes.shape[:-1] + (nwin,), dtype=jnp.uint32)
    for j in range(n_hi, k):
        lo = (lo << 2) | u32[..., j : j + nwin]
    return hi, lo


def complement_packed(
    hi: jnp.ndarray, lo: jnp.ndarray, k: int
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Complement of a packed k-mer: each 2-bit group c -> 3 - c.

    Equals ``mask - x`` per lane, i.e. XOR with the all-ones 2-bit mask.
    """
    n_lo = min(k, 16)
    n_hi = k - n_lo
    mask_lo = jnp.uint32((1 << (2 * n_lo)) - 1)
    mask_hi = jnp.uint32((1 << (2 * n_hi)) - 1)
    return hi ^ mask_hi, lo ^ mask_lo


def reverse_complement_u32(v: jnp.ndarray, n: int) -> jnp.ndarray:
    """True reverse complement of single-lane packed n-mers (n <= 15)."""
    comp = jnp.uint32((1 << (2 * n)) - 1) - v
    out = jnp.zeros_like(v)
    for j in range(n):
        out = out | (((comp >> (2 * j)) & 3) << (2 * (n - 1 - j)))
    return out


def reverse_complement_packed(
    hi: jnp.ndarray, lo: jnp.ndarray, k: int
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """True reverse complement of packed k-mers (fast mode only).

    k is static, so the per-base regroup unrolls into shifts/ors that XLA
    fuses; elementwise over any shape.
    """
    n_lo = min(k, 16)
    n_hi = k - n_lo
    codes = []
    for j in range(n_hi):
        codes.append((hi >> (2 * (n_hi - 1 - j))) & 3)
    for j in range(n_lo):
        codes.append((lo >> (2 * (n_lo - 1 - j))) & 3)
    codes = [3 - c for c in codes]  # complement
    codes.reverse()  # reversal
    rhi = jnp.zeros_like(hi)
    for j in range(n_hi):
        rhi = (rhi << 2) | codes[j].astype(jnp.uint32)
    rlo = jnp.zeros_like(lo)
    for j in range(n_hi, k):
        rlo = (rlo << 2) | codes[j].astype(jnp.uint32)
    return rhi, rlo


# ---------------------------------------------------------------------------
# Host-side (numpy / Python int) helpers, used for decoding device results to
# strings and in tests.  Not on any hot path.
# ---------------------------------------------------------------------------


def encode_str(s: str) -> np.ndarray:
    """String -> uint8 code array (host)."""
    return _ASCII_TO_CODE[np.frombuffer(s.encode(), dtype=np.uint8)]


def decode_str(codes: np.ndarray) -> str:
    """uint8 code array -> string (host)."""
    return _CODE_TO_ASCII[np.asarray(codes, dtype=np.int64)].tobytes().decode()


def score_str(s: str) -> int:
    """Reference getscore of a string (binning.c:114-124), exact semantics
    including the default-to-'A' mapping for unknown characters."""
    score = 0
    for ch in s:
        score = score * 4 + int(_ASCII_TO_CODE[ord(ch)])
    return score


def pack_str(s: str) -> int:
    """Packed integer of a string; identical to score_str by construction."""
    return score_str(s)


def unpack_int(value: int, n: int) -> str:
    """Packed integer -> length-n string (MSB-first)."""
    out = []
    for j in range(n - 1, -1, -1):
        out.append(BASE_BY_CODE[(value >> (2 * j)) & 3])
    return "".join(out)


def split_to_int(hi: int, lo: int, k: int) -> int:
    """(hi, lo) uint32 lanes -> single packed Python int."""
    n_lo = min(k, 16)
    return (int(hi) << (2 * n_lo)) | int(lo)


def int_to_split(value: int, k: int) -> tuple[int, int]:
    """Single packed int -> (hi, lo) uint32 lanes."""
    n_lo = min(k, 16)
    return value >> (2 * n_lo), value & ((1 << (2 * n_lo)) - 1)
