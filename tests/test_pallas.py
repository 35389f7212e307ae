"""Pallas kernels vs their XLA twins (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from genome_assembly_tpu.ops import minimizer
from genome_assembly_tpu.ops.minimizer_pallas import fast_scan_pallas


@pytest.mark.parametrize("rows,c", [(8, 256), (16, 1024), (8, 512)])
def test_bitonic_row_sort_matches_numpy(rows, c):
    from genome_assembly_tpu.ops.sort_pallas import sort_rows_pallas

    rng = np.random.default_rng(1)
    hi = rng.integers(0, 2**32, size=(rows, c), dtype=np.uint32)
    lo = rng.integers(0, 2**32, size=(rows, c), dtype=np.uint32)
    # sprinkle sentinels and duplicate keys
    hi[:, :7] = 0xFFFFFFFF
    lo[:, :7] = 0xFFFFFFFF
    hi[:, 8:16] = hi[:, 16:24]
    lo[:, 8:16] = lo[:, 16:24]
    got_hi, got_lo = sort_rows_pallas(
        jnp.asarray(hi), jnp.asarray(lo), interpret=True
    )
    got_hi, got_lo = np.asarray(got_hi), np.asarray(got_lo)
    for r in range(rows):
        pairs = sorted((int(a) << 32) | int(b) for a, b in zip(hi[r], lo[r]))
        got = [(int(a) << 32) | int(b) for a, b in zip(got_hi[r], got_lo[r])]
        assert got == pairs, f"row {r}"


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
