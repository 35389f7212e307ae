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

# This image's sitecustomize force-registers the axon TPU backend and
# overrides jax_platforms via jax.config.update, which silently ignores the
# env var above -- undo that explicitly so unit tests run on the 8-device
# virtual CPU mesh, not over the TPU relay.
import jax

jax.config.update("jax_platforms", "cpu")

import pathlib
import sys

REPO_ROOT = pathlib.Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))

REFERENCE_DIR = pathlib.Path("/root/reference")

from genome_assembly_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

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
