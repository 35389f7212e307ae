"""Phase-boundary checkpoint/resume (SURVEY.md section 5.4).

The reference has none; here the counting phase is restartable per batch
(idempotent merge into the table) and the counted table itself serializes
at any phase boundary (post-count, post-prune).  Format: a compressed npz
of the CountedTable arrays plus a JSON sidecar of config metadata -- self
contained, mmap-friendly, no service dependencies.  (orbax/tensorstore is
available for pod-scale sharded checkpoints; the npz path keeps the
single-host flow dependency-light.)
"""

from __future__ import annotations

import dataclasses
import json
import pathlib
from typing import Tuple

import numpy as np

from genome_assembly_tpu.config import PipelineConfig
from genome_assembly_tpu.ops.count import CountedTable

FORMAT_VERSION = 1


def save_counted_table(
    path: str, table: CountedTable, config: PipelineConfig, phase: str
) -> None:
    """Serialize a counted table (device or host arrays) + metadata."""
    p = pathlib.Path(path)
    if p.suffix != ".npz":
        p = p.with_suffix(p.suffix + ".npz")
    p.parent.mkdir(parents=True, exist_ok=True)
    arrays = {name: np.asarray(arr) for name, arr in table._asdict().items()}
    np.savez_compressed(p, **arrays)
    meta = {
        "format_version": FORMAT_VERSION,
        "phase": phase,
        "config": dataclasses.asdict(config),
    }
    p.with_suffix(".meta.json").write_text(json.dumps(meta, indent=2))


def jump_fingerprint(next_state) -> dict:
    """Cheap content fingerprint of a link array (device-side reduction).

    Frontier checkpoints are only valid for the exact graph they were
    taken from; a full hash would need a host transfer of the (possibly
    multi-GB) link array, so two wrapping partial sums + the length stand
    in.  Wrap-around is deterministic; collisions would need a different
    graph agreeing in both 16-bit half sums AND length.
    """
    import jax.numpy as jnp

    ns = next_state.astype(jnp.int32)
    lo = int(jnp.sum((ns & 0xFFFF).astype(jnp.uint32)))
    hi = int(jnp.sum((ns >> 16).astype(jnp.uint32)))
    return {"n2": int(next_state.shape[0]), "sum_lo": lo, "sum_hi": hi}


def save_jump_frontier(
    dirpath: str, tbl, pred, rounds_done: int, lanes: int, fingerprint: dict
) -> None:
    """Checkpoint a pointer-jump doubling frontier (SURVEY.md section 5.4
    'per-extension-round' resume).  Atomic: written to a temp name and
    renamed, so a kill mid-save leaves the previous frontier intact."""
    import os

    d = pathlib.Path(dirpath)
    d.mkdir(parents=True, exist_ok=True)
    tmp = d / f".frontier_l{lanes}.tmp.npz"
    final = d / f"frontier_l{lanes}.npz"
    # uncompressed: doubling frontiers are near-random int32 parent ids,
    # so zlib bought ~34% at minutes of CPU per multi-GB save (measured on
    # the celegans jump); disk is cheaper than that
    np.savez(
        tmp,
        tbl=np.asarray(tbl),
        pred=np.asarray(pred),
        rounds_done=np.int64(rounds_done),
    )
    (d / f"frontier_l{lanes}.meta.json").write_text(
        json.dumps({"format_version": FORMAT_VERSION, **fingerprint})
    )
    os.replace(tmp, final)


def load_jump_frontier(dirpath: str, lanes: int, fingerprint: dict):
    """Restore a frontier if one exists for this exact graph, else None.

    Returns (tbl, pred, rounds_done) as numpy arrays.  A fingerprint
    mismatch (different links array) is treated as no checkpoint.
    """
    d = pathlib.Path(dirpath)
    final = d / f"frontier_l{lanes}.npz"
    meta_path = d / f"frontier_l{lanes}.meta.json"
    if not final.exists() or not meta_path.exists():
        return None
    meta = json.loads(meta_path.read_text())
    if meta != {"format_version": FORMAT_VERSION, **fingerprint}:
        return None
    data = np.load(final)
    return data["tbl"], data["pred"], int(data["rounds_done"])


def clear_jump_frontier(dirpath: str, lanes: int) -> None:
    d = pathlib.Path(dirpath)
    for name in (f"frontier_l{lanes}.npz", f"frontier_l{lanes}.meta.json"):
        p = d / name
        if p.exists():
            p.unlink()


def load_counted_table(path: str) -> Tuple[CountedTable, PipelineConfig, str]:
    """Restore a counted table; returns (table, config, phase)."""
    p = pathlib.Path(path)
    if p.suffix != ".npz":
        p = p.with_suffix(p.suffix + ".npz")
    meta = json.loads(p.with_suffix(".meta.json").read_text())
    if meta["format_version"] != FORMAT_VERSION:
        raise ValueError(f"unsupported checkpoint version {meta['format_version']}")
    data = np.load(p)
    table = CountedTable(**{name: data[name] for name in CountedTable._fields})
    config = PipelineConfig(**meta["config"])
    return table, config, meta["phase"]
