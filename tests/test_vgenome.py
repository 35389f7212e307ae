"""Counter-based virtual genome (ops/vgenome.py)."""

import numpy as np

import jax.numpy as jnp

from genome_assembly_tpu.ops import vgenome


def test_bases_deterministic_and_uniform():
    pos = jnp.arange(1 << 16, dtype=jnp.uint32)
    a = np.asarray(vgenome.genome_bases(7, pos))
    b = np.asarray(vgenome.genome_bases(7, pos))
    np.testing.assert_array_equal(a, b)
    assert a.dtype == np.uint8 and set(np.unique(a)) <= {0, 1, 2, 3}
    # fmix32 composition is bijective in the position for a fixed seed,
    # so over any large window the four bases are near-exactly uniform
    counts = np.bincount(a, minlength=4)
    assert counts.min() > 0.95 * (len(a) / 4)
    # a different seed is a different genome
    c = np.asarray(vgenome.genome_bases(8, pos))
    assert (a != c).mean() > 0.5


def test_overlapping_reads_agree_on_shared_bases():
    """Reads are views of ONE virtual genome: two reads overlapping in
    position agree on every shared base (the coverage property the
    reference's generator provides by sampling all reads from one genome
    string, /root/reference/generate_reads.py)."""
    starts = jnp.asarray([100, 150], dtype=jnp.uint32)
    reads = np.asarray(vgenome.read_batch(3, starts, 100))
    np.testing.assert_array_equal(reads[0, 50:], reads[1, :50])


def test_positions_past_2_31():
    """3 Gbp positions exceed int31; the hash path must stay uint32."""
    pos = jnp.asarray([2_999_999_990, 2_999_999_991], dtype=jnp.uint32)
    out = np.asarray(vgenome.genome_bases(5, pos))
    assert out.shape == (2,) and set(out) <= {0, 1, 2, 3}
