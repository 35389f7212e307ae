"""ASan/UBSan sweep of the native replay engine (SURVEY.md section 5.2)."""

import subprocess

import pytest

from genome_assembly_tpu.native import build


def test_replay_engine_under_sanitizers():
    binary = build.build_sanitizer_selftest()
    proc = subprocess.run(
        [str(binary)], capture_output=True, text=True, timeout=120
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert proc.stdout.startswith("ok "), proc.stdout
