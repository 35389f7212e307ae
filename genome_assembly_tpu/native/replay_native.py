"""ctypes bindings for the C++ parity replay engine."""

from __future__ import annotations

import ctypes
from typing import Tuple

import numpy as np

_lib = None


def _load():
    global _lib
    if _lib is None:
        from genome_assembly_tpu.native import build

        path = build.build()
        lib = ctypes.CDLL(str(path))
        lib.ga_parity_replay.restype = ctypes.c_int
        lib.ga_parity_replay.argtypes = [
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_uint32),
            ctypes.POINTER(ctypes.c_uint32),
            ctypes.POINTER(ctypes.c_uint32),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.ga_free.argtypes = [ctypes.c_char_p]
        _lib = lib
    return _lib


def available() -> bool:
    try:
        _load()
        return True
    except Exception:
        return False


def replay(
    mmer: np.ndarray,
    kmer_hi: np.ndarray,
    kmer_lo: np.ndarray,
    id_offsets: np.ndarray,
    read_ids: np.ndarray,
    k: int,
    m: int,
    cutoff: int,
    verbose: bool = False,
) -> Tuple[str, Tuple[int, int, int]]:
    """Run the native replay over insertion-ordered groups.

    Arrays must be sorted by first-seen stream index; read_ids is the
    flattened per-group occurrence lists in stream (ascending) order with
    id_offsets delimiting groups.
    """
    lib = _load()
    mmer = np.ascontiguousarray(mmer, dtype=np.uint32)
    kmer_hi = np.ascontiguousarray(kmer_hi, dtype=np.uint32)
    kmer_lo = np.ascontiguousarray(kmer_lo, dtype=np.uint32)
    id_offsets = np.ascontiguousarray(id_offsets, dtype=np.int64)
    read_ids = np.ascontiguousarray(read_ids, dtype=np.int32)
    n_groups = len(mmer)
    out_text = ctypes.c_char_p()
    stats = (ctypes.c_int64 * 3)()
    rc = lib.ga_parity_replay(
        k,
        m,
        cutoff,
        n_groups,
        mmer.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        kmer_hi.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        kmer_lo.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        id_offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        read_ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        1 if verbose else 0,
        ctypes.byref(out_text),
        stats,
    )
    text = out_text.value.decode() if out_text.value is not None else ""
    # out_text buffer ownership: copy made above; free the C buffer.
    lib.ga_free(out_text)
    if rc != 0:
        raise RuntimeError(f"native parity replay aborted: {text}")
    return text, (int(stats[0]), int(stats[1]), int(stats[2]))


def assemble(host_table, k: int, m: int, cutoff: int, verbose: bool = False):
    """HostTable (pre-prune extraction) -> output text/lines via native replay."""
    order = np.argsort(np.asarray(host_table.first_seen), kind="stable")
    mmer = np.asarray(host_table.mmer)[order]
    khi = np.asarray(host_table.kmer_hi)[order]
    klo = np.asarray(host_table.kmer_lo)[order]
    sizes = np.asarray(host_table.count)[order].astype(np.int64)
    offsets = np.zeros(len(order) + 1, dtype=np.int64)
    np.cumsum(sizes, out=offsets[1:])
    flat_ids = np.concatenate(
        [np.asarray(host_table.read_ids[g], dtype=np.int32) for g in order]
    ) if len(order) else np.zeros(0, dtype=np.int32)
    text, _stats = replay(
        mmer, khi, klo, offsets, flat_ids, k, m, cutoff, verbose=verbose
    )
    if verbose:
        return text
    return text.splitlines()
