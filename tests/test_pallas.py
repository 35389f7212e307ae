"""Pallas kernels vs their XLA twins (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from genome_assembly_tpu.ops import minimizer
from genome_assembly_tpu.ops.minimizer_pallas import fast_scan_pallas


@pytest.mark.parametrize("k,m", [(31, 7), (21, 7), (15, 5)])
def test_fast_scan_pallas_matches_xla(k, m):
    rng = np.random.default_rng(0)
    B, L = 256, 128
    codes = jnp.asarray(rng.integers(0, 4, size=(B, L), dtype=np.uint8))
    lengths = jnp.asarray(
        rng.integers(k, L + 1, size=(B,)).astype(np.int32)
    )
    want = minimizer.fast_scan(codes, lengths, k=k, m=m)
    got = fast_scan_pallas(codes, lengths, k=k, m=m, interpret=True)
    v = np.asarray(want.valid)
    assert np.array_equal(np.asarray(got.valid), v)
    for name in ("mmer", "kmer_hi", "kmer_lo"):
        g = np.asarray(getattr(got, name))
        w = np.asarray(getattr(want, name))
        assert np.array_equal(g[v], w[v]), name
