"""Hierarchical two-lane sort: row-sorted base + explicit bitonic merges.

Measured on the v5-lite chip (tools/bench_prims.py): XLA's monolithic
``lax.sort`` runs at ~540M two-lane elements/s at 1.6M records and degrades
to ~300M/s at 12.6M, while the SAME total data sorted as many independent
1024-wide rows runs at 3.8G/s -- a 7x gap, because the monolithic sort pays
cross-VMEM stages for its full O(log^2 N) network depth.

This module keeps XLA's near-optimal row sort for the first log2(base)
levels and expresses the remaining merge levels directly: per level, the
odd rows are reversed (making each row pair one bitonic sequence) and then
log2(2L) compare-exchange stages at halving distances run as pure
elementwise selects over rolled copies -- no gathers, no transposes, fully
fusible by XLA.

Cost model: log2(n/base) merge levels, level i costing log2(2*base*2^i)
stages of ~8 elementwise ops -- ~176 stage-passes for n=2^21, base=1024,
versus ~231 inside the monolithic sort, but each stage here is a cheap
fused elementwise pass instead of a generic sort stage.

Sentinel convention matches ops/count.py: invalid slots hold 0xFFFFFFFF in
the key lane and sort to the end; internal power-of-two padding adds more
sentinels, and the result is trimmed back, preserving every real record.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from genome_assembly_tpu.common import SENTINEL


def _ce_rolled(hi, lo, d):
    """Distance-d compare-exchange along the last axis (bitonic stage).

    Standard network: element i with bit d clear keeps the min of (i, i+d),
    bit d set keeps the max of (i-d, i).  Rolls never pair across a 2d
    block because i and its partner differ only in bit d.
    """
    c = hi.shape[-1]
    pos = lax.broadcasted_iota(jnp.int32, hi.shape, hi.ndim - 1)
    is_a = (pos & d) == 0
    o_hi = jnp.where(is_a, jnp.roll(hi, -d, axis=-1), jnp.roll(hi, d, axis=-1))
    o_lo = jnp.where(is_a, jnp.roll(lo, -d, axis=-1), jnp.roll(lo, d, axis=-1))
    self_le = (hi < o_hi) | ((hi == o_hi) & (lo <= o_lo))
    keep_self = self_le == is_a
    return (
        jnp.where(keep_self, hi, o_hi),
        jnp.where(keep_self, lo, o_lo),
    )


@functools.partial(jax.jit, static_argnames=("base",))
def merge_sort_pairs(hi: jnp.ndarray, lo: jnp.ndarray, *, base: int = 1024):
    """Sort flat (hi, lo) uint32 lanes ascending-lexicographically.

    Drop-in replacement for ``lax.sort((hi, lo), num_keys=2)`` (unstable,
    which counting does not care about).  base must be a power of two.
    """
    n = hi.shape[0]
    if base & (base - 1):
        raise ValueError("base must be a power of two")
    if n <= base:
        return lax.sort((hi, lo), num_keys=2)
    # pad to a power-of-two multiple of base
    levels = 0
    total = base
    while total < n:
        total *= 2
        levels += 1
    if total != n:
        pad = total - n
        hi = jnp.concatenate([hi, jnp.full((pad,), SENTINEL, jnp.uint32)])
        lo = jnp.concatenate([lo, jnp.full((pad,), SENTINEL, jnp.uint32)])

    rows = total // base
    h = hi.reshape(rows, base)
    l = lo.reshape(rows, base)
    h, l = lax.sort((h, l), dimension=1, num_keys=2)

    length = base
    for _ in range(levels):
        # pair rows: [r/2, 2, L]; reverse the second of each pair so the
        # concatenation is a single bitonic sequence
        h = h.reshape(-1, 2, length)
        l = l.reshape(-1, 2, length)
        h = jnp.concatenate([h[:, :1, :], h[:, 1:, ::-1]], axis=1)
        l = jnp.concatenate([l[:, :1, :], l[:, 1:, ::-1]], axis=1)
        length *= 2
        h = h.reshape(-1, length)
        l = l.reshape(-1, length)
        d = length // 2
        while d >= 1:
            h, l = _ce_rolled(h, l, d)
            d //= 2

    h = h.reshape(total)
    l = l.reshape(total)
    if total != n:
        h = h[:n]
        l = l[:n]
    return h, l
