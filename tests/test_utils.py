"""Aux subsystems: checkpoint roundtrip, metrics, CLI, plots."""

import json
import pathlib
import subprocess
import sys

import numpy as np
import pytest

import jax.numpy as jnp

from genome_assembly_tpu.config import PipelineConfig
from genome_assembly_tpu.io import reads as reads_io
from genome_assembly_tpu.models.pipeline import CountPipeline
from genome_assembly_tpu.utils import checkpoint as ckpt
from genome_assembly_tpu.utils.metrics import MetricsLogger

REPO = pathlib.Path(__file__).parent.parent


def test_checkpoint_roundtrip(tmp_path):
    cfg = PipelineConfig(k=6, m=3, max_read_len=32, batch_reads=64)
    reads = ["ACGTACGTTGCA", "TTGCAACGTACG", "ACGTACGTTGCA"]
    counted, _ = CountPipeline(cfg).count_reads(reads)
    path = tmp_path / "table.npz"
    ckpt.save_counted_table(str(path), counted, cfg, phase="post-count")
    table, cfg2, phase = ckpt.load_counted_table(str(path))
    assert phase == "post-count"
    assert cfg2 == cfg
    for name in table._fields:
        assert np.array_equal(
            np.asarray(getattr(table, name)), np.asarray(getattr(counted, name))
        ), name


def test_metrics_jsonl(tmp_path):
    path = tmp_path / "m.jsonl"
    with open(path, "w") as f:
        log = MetricsLogger(f, run_id="t")
        with log.phase("count", k=31) as extra:
            extra["entries"] = 42
        log.emit("done", ok=True)
    recs = [json.loads(line) for line in path.read_text().splitlines()]
    assert recs[0]["event"] == "count"
    assert recs[0]["entries"] == 42
    assert recs[0]["k"] == 31
    assert "wall_s" in recs[0]
    assert recs[1]["event"] == "done"


def test_cli_parity_matches_golden(tmp_path):
    out = subprocess.run(
        [
            sys.executable,
            "-m",
            "genome_assembly_tpu",
            "assemble",
            "/root/reference/input.txt",
            "--k",
            "6",
            "--m",
            "3",
            "--max-read-len",
            "32",
            "--cpu",
            "--metrics",
            str(tmp_path / "m.jsonl"),
        ],
        capture_output=True,
        text=True,
        cwd=REPO,
        timeout=300,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    golden = (REPO / "tests/golden/input_k6m3_unitigs.txt").read_text()
    assert out.stdout == golden
    recs = [json.loads(l) for l in (tmp_path / "m.jsonl").read_text().splitlines()]
    assert recs[0]["event"] == "assemble"


def test_plots_render(tmp_path):
    from genome_assembly_tpu.utils import plots

    plots.plot_reads([0, 5, 10], 50, 20, str(tmp_path / "reads.png"))
    plots.plot_mmer_bins({"ACG": 5, "CCA": 2}, str(tmp_path / "mmers.png"))
    plots.plot_unitig_placement(
        ["ACGTACG", "TTTTTTT"], "GGACGTACGGG", str(tmp_path / "kmers.png")
    )
    for name in ("reads.png", "mmers.png", "kmers.png"):
        assert (tmp_path / name).stat().st_size > 0
