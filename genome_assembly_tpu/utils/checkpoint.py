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
