"""Pallas in-VMEM bitonic row sort for two-lane uint32 keys.

Building block for the radix-partitioned count pipeline (NOTES.md round-2
plan): XLA's comparator sort streams every stage through HBM; this kernel
sorts each row of a [rows, C] pair of key lanes entirely in VMEM, so the
only HBM traffic is one read and one write per lane.

Compare-exchange uses lane rolls instead of sub-lane reshapes (Mosaic
handles rolls at any distance); the descending-partner mask follows the
standard bitonic network.  Unsigned order is preserved by the sign-flip
map u32 -> i32 (Mosaic cannot legalize unsigned vector min/max).

C must be a power of two; pad with 0xFFFFFFFF sentinels (they sort last).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _roll(x, shift):
    # pltpu.roll requires non-negative shifts; circular equivalence
    return pltpu.roll(x, shift % x.shape[1], axis=1)


def _bitonic_rows(hi, lo):
    """Sort each row of (hi, lo) ascending-lexicographic.  i32 inputs
    (sign-flipped from u32); shapes [rows, C] with C a power of two."""
    rows, c = hi.shape
    logc = c.bit_length() - 1
    pos = jax.lax.broadcasted_iota(jnp.int32, (rows, c), 1)
    for k in range(1, logc + 1):
        # ascending blocks of size 2^(k+1)... direction flips with bit k+? :
        # standard network: direction = bit (k) of position's 2^k block —
        # element i sorts ascending iff (i >> k) & 1 == 0 for the final
        # merge when k == logc every block ascends.
        dir_up = ((pos >> k) & 1) == 0 if k < logc else jnp.ones_like(pos, jnp.bool_)
        for j in range(k - 1, -1, -1):
            jj = 1 << j
            is_a = (pos & jj) == 0  # lower partner of each pair
            o_hi = jnp.where(is_a, _roll(hi, -jj), _roll(hi, jj))
            o_lo = jnp.where(is_a, _roll(lo, -jj), _roll(lo, jj))
            less = (hi < o_hi) | ((hi == o_hi) & (lo < o_lo))
            # keep self when (I'm the smaller and I'm the 'min' slot) etc.
            keep_self = less == (is_a == dir_up)
            hi = jnp.where(keep_self, hi, o_hi)
            lo = jnp.where(keep_self, lo, o_lo)
    return hi, lo


def _sort_kernel(hi_ref, lo_ref, out_hi_ref, out_lo_ref):
    flip = jnp.int32(-0x80000000)
    hi = hi_ref[:, :].astype(jnp.int32) ^ flip
    lo = lo_ref[:, :].astype(jnp.int32) ^ flip
    hi, lo = _bitonic_rows(hi, lo)
    out_hi_ref[:, :] = (hi ^ flip).astype(jnp.uint32)
    out_lo_ref[:, :] = (lo ^ flip).astype(jnp.uint32)


@functools.partial(
    jax.jit, static_argnames=("block_rows", "interpret")
)
def sort_rows_pallas(
    hi: jnp.ndarray,
    lo: jnp.ndarray,
    *,
    block_rows: int = 8,
    interpret: bool = False,
):
    """Row-wise lexicographic sort of (hi, lo); [rows, C], C power of two."""
    rows, c = hi.shape
    if c & (c - 1):
        raise ValueError(f"row length {c} must be a power of two")
    if rows % block_rows:
        raise ValueError(f"rows {rows} must divide block_rows {block_rows}")
    grid = (rows // block_rows,)
    spec = pl.BlockSpec((block_rows, c), lambda i: (i, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _sort_kernel,
        grid=grid,
        in_specs=[spec, spec],
        out_specs=[spec, spec],
        out_shape=[
            jax.ShapeDtypeStruct((rows, c), jnp.uint32),
            jax.ShapeDtypeStruct((rows, c), jnp.uint32),
        ],
        interpret=interpret,
    )(hi, lo)
