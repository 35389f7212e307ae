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
        lib.ga_parity_replay_raw.restype = ctypes.c_int
        lib.ga_parity_replay_raw.argtypes = [
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_uint32),
            ctypes.POINTER(ctypes.c_uint32),
            ctypes.POINTER(ctypes.c_uint32),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_char_p,
            ctypes.c_char_p,
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


def assemble_groups(
    groups, k: int, m: int, cutoff: int, verbose: bool = False
):
    """Run the native replay over insertion-ordered STRING groups.

    groups: [(mmer_str, kmer_str, [read ids in stream order])], as built
    by parity/nonacgt.regroup_with_exceptions -- key strings may contain
    raw non-ACGT bytes, which ride the override channel
    (ga_parity_replay_raw) instead of the packed lanes.
    """
    from genome_assembly_tpu.ops import encode

    lib = _load()
    n = len(groups)
    mmer = np.zeros(n, dtype=np.uint32)
    khi = np.zeros(n, dtype=np.uint32)
    klo = np.zeros(n, dtype=np.uint32)
    offsets = np.zeros(n + 1, dtype=np.int64)
    raw_idx = []
    raw_m = bytearray()
    raw_k = bytearray()
    ids_parts = []
    pure = frozenset("TGCA")
    for g, (sig, kmer, id_list) in enumerate(groups):
        if len(sig) != m or len(kmer) != k:
            raise ValueError(f"group {g}: key lengths != (m={m}, k={k})")
        if pure.issuperset(sig) and pure.issuperset(kmer):
            mmer[g] = encode.pack_str(sig)
            hi, lo = encode.int_to_split(encode.pack_str(kmer), k)
            khi[g], klo[g] = hi, lo
        else:
            raw_idx.append(g)
            raw_m.extend(sig.encode("latin-1"))
            raw_k.extend(kmer.encode("latin-1"))
        offsets[g + 1] = offsets[g] + len(id_list)
        ids_parts.append(np.asarray(id_list, dtype=np.int32))
    flat_ids = (
        np.concatenate(ids_parts) if ids_parts else np.zeros(0, np.int32)
    )
    raw_idx_a = np.asarray(raw_idx, dtype=np.int64)
    out_text = ctypes.c_char_p()
    stats = (ctypes.c_int64 * 3)()
    rc = lib.ga_parity_replay_raw(
        k, m, cutoff, n,
        mmer.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        khi.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        klo.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        flat_ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        len(raw_idx_a),
        raw_idx_a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        bytes(raw_m),
        bytes(raw_k),
        1 if verbose else 0,
        ctypes.byref(out_text),
        stats,
    )
    text = out_text.value.decode("latin-1") if out_text.value is not None else ""
    lib.ga_free(out_text)
    if rc != 0:
        raise RuntimeError(f"native parity replay aborted: {text}")
    if verbose:
        return text
    return text.splitlines()


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
