"""Test environment: force an 8-device virtual CPU mesh before JAX loads.

Multi-chip sharding paths are tested on simulated devices
(--xla_force_host_platform_device_count), the same code path that runs on a
real pod slice; see SURVEY.md section 4 item 3.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import pathlib
import sys

REPO_ROOT = pathlib.Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))

REFERENCE_DIR = pathlib.Path("/root/reference")

import pytest


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "oracle: needs the reference C source tree to compile an oracle"
    )
    config.addinivalue_line("markers", "slow: long-running test")


def pytest_collection_modifyitems(config, items):
    if REFERENCE_DIR.exists():
        return
    skip = pytest.mark.skip(reason="/root/reference not mounted")
    for item in items:
        if "oracle" in item.keywords:
            item.add_marker(skip)
