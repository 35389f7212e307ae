"""Merge-path sort backend (ops/mergepath_pallas.py) vs lax.sort.

Runs the Pallas kernels in interpret mode (the conftest CPU backend has
no Mosaic); the same code compiles on TPU where tools/bench_sort3.py
measures it.  Covers: sentinel padding (non-power-of-two n), duplicate
keys straddling run boundaries, no-local-levels and no-mergepath-levels
degenerate configurations.
"""

import numpy as np
import pytest

import jax.numpy as jnp
from jax import lax

from genome_assembly_tpu.ops.mergepath_pallas import sort_pairs_mergepath


@pytest.mark.parametrize(
    "n,tile,width,base,chunk",
    [
        (4096, 512, 128, 128, 1024),
        (5000, 512, 128, 128, 1024),  # sentinel-padded
        (16384, 512, 128, 256, 2048),
        (65536, 2048, 256, 512, 8192),
        (65536, 2048, 256, 2048, 2048),  # base == chunk: no local levels
        (8192, 512, 128, 128, 2048),  # chunk == total/4 boundary
    ],
)
def test_mergepath_equals_lax_sort(n, tile, width, base, chunk):
    rng = np.random.default_rng(n + tile)
    hi = rng.integers(0, 1 << 30, size=n, dtype=np.uint32)
    lo = rng.integers(0, 1 << 32, size=n, dtype=np.uint32)
    hi[::7] = hi[0]  # duplicate-heavy keys across runs
    lo[::13] = lo[3]
    want_h, want_l = lax.sort((jnp.asarray(hi), jnp.asarray(lo)), num_keys=2)
    got_h, got_l = sort_pairs_mergepath(
        jnp.asarray(hi), jnp.asarray(lo),
        tile=tile, width=width, base_run=base, chunk=chunk, interpret=True,
    )
    assert np.array_equal(np.asarray(want_h), np.asarray(got_h))
    assert np.array_equal(np.asarray(want_l), np.asarray(got_l))


def test_mergepath_small_n_falls_back():
    rng = np.random.default_rng(0)
    hi = rng.integers(0, 1 << 30, size=100, dtype=np.uint32)
    lo = rng.integers(0, 1 << 32, size=100, dtype=np.uint32)
    got_h, got_l = sort_pairs_mergepath(jnp.asarray(hi), jnp.asarray(lo))
    want_h, want_l = lax.sort((jnp.asarray(hi), jnp.asarray(lo)), num_keys=2)
    assert np.array_equal(np.asarray(want_h), np.asarray(got_h))
    assert np.array_equal(np.asarray(want_l), np.asarray(got_l))
