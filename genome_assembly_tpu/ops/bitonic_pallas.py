"""Pallas two-lane bitonic sort: in-VMEM chunk networks + paired big stages.

Why (measured, tools/bench_prims.py + bench_sort2.py on the v5-lite chip):
``lax.sort`` of 1.6M two-lane records costs 2.95 ms -- 95% of the whole
count pipeline -- and degrades superlinearly (12.6M: 41.8 ms).  The same
network expressed as XLA elementwise rolls does NOT fuse (13x slower), so
the only way to beat it is to keep whole network levels inside VMEM.

Design: the flat array is [rows, WIDTH] row-major; a CHUNK is CHUNK_ROWS
consecutive rows (2^17 elements by default, ~1 MB/lane in VMEM).

  1. ``chunk sort``: one grid pass runs the full bitonic network for every
     stage with distance < CHUNK entirely in VMEM (merge levels up to the
     chunk size), with direction bits taken from GLOBAL element positions
     so chunks compose into the global network.
  2. For each merge level larger than a chunk: the stages with distance
     >= CHUNK are ``big_ce`` passes -- a grid over row-block pairs (the
     two BlockSpec inputs map the lower and upper halves of each pair), a
     single compare-exchange per element, one HBM round trip per stage.
  3. The remaining stages of that level (distance < CHUNK) are one
     ``finish`` pass per level, again entirely in VMEM.

Pass count for n=2^21: 1 chunk pass + 10 big stages + 4 finish passes,
~15 HBM round trips total versus the O(log^2) cross-VMEM traffic of the
monolithic sort.

Element distance maps to the layout as: d < WIDTH -> lane roll; d >=
WIDTH -> sublane (row) roll by d/WIDTH.  Unsigned order comes from one
sign-flip into int32 at load and one flip back at store.  Keys-only (both
lanes are key): equal records are interchangeable, so the network's
instability is unobservable.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from genome_assembly_tpu.common import SENTINEL
_FLIP = -0x80000000  # python int: jnp scalars may not be closed over in kernels


def _roll2(x, shift, axis):
    return pltpu.roll(x, shift % x.shape[axis], axis=axis)


def _stage(hi, lo, pos, d, size, width):
    """One compare-exchange stage at element distance d, merge level size."""
    if d < width:
        o_hi = jnp.where((pos & d) == 0, _roll2(hi, -d, 1), _roll2(hi, d, 1))
        o_lo = jnp.where((pos & d) == 0, _roll2(lo, -d, 1), _roll2(lo, d, 1))
    else:
        r = d // width
        o_hi = jnp.where((pos & d) == 0, _roll2(hi, -r, 0), _roll2(hi, r, 0))
        o_lo = jnp.where((pos & d) == 0, _roll2(lo, -r, 0), _roll2(lo, r, 0))
    is_a = (pos & d) == 0
    dir_up = (pos & size) == 0
    self_le = (hi < o_hi) | ((hi == o_hi) & (lo <= o_lo))
    keep_self = self_le == (is_a == dir_up)
    return jnp.where(keep_self, hi, o_hi), jnp.where(keep_self, lo, o_lo)


def _chunk_kernel(hi_ref, lo_ref, ohi_ref, olo_ref, *, chunk_rows, width, sizes):
    """Run all stages with distance < chunk for the given merge sizes."""
    chunk = chunk_rows * width
    base = pl.program_id(0) * chunk
    rows_i = jax.lax.broadcasted_iota(jnp.int32, (chunk_rows, width), 0)
    cols_i = jax.lax.broadcasted_iota(jnp.int32, (chunk_rows, width), 1)
    pos = base + rows_i * width + cols_i
    hi = hi_ref[:, :].astype(jnp.int32) ^ _FLIP
    lo = lo_ref[:, :].astype(jnp.int32) ^ _FLIP
    for size in sizes:
        d = min(size // 2, chunk // 2)
        while d >= 1:
            hi, lo = _stage(hi, lo, pos, d, size, width)
            d //= 2
    ohi_ref[:, :] = (hi ^ _FLIP).astype(jnp.uint32)
    olo_ref[:, :] = (lo ^ _FLIP).astype(jnp.uint32)


def _big_ce_kernel(
    scal_ref, shi_ref, slo_ref, ohi_in_ref, olo_in_ref, ohi_ref, olo_ref, *,
    block_rows, width
):
    """Compare-exchange each row block with its partner at row distance
    per*block_rows; block i is the lower half of its pair iff (i & per)==0.
    Every block is written exactly once (identity-mapped output).

    per and size arrive as prefetched scalars (scal_ref = [per, size]), so
    ONE compiled kernel serves every big stage of every merge level --
    otherwise each (distance, level) pair is its own multi-minute remote
    Mosaic compile."""
    per = scal_ref[0]
    size = scal_ref[1]
    i = pl.program_id(0)
    is_a = (i & per) == 0
    row0 = i * block_rows
    pos0 = row0 * width
    dir_up = (pos0 & size) == 0
    s_hi = shi_ref[:, :].astype(jnp.int32) ^ _FLIP
    s_lo = slo_ref[:, :].astype(jnp.int32) ^ _FLIP
    o_hi = ohi_in_ref[:, :].astype(jnp.int32) ^ _FLIP
    o_lo = olo_in_ref[:, :].astype(jnp.int32) ^ _FLIP
    self_le = (s_hi < o_hi) | ((s_hi == o_hi) & (s_lo <= o_lo))
    keep_self = self_le == (is_a == dir_up)
    ohi_ref[:, :] = (jnp.where(keep_self, s_hi, o_hi) ^ _FLIP).astype(jnp.uint32)
    olo_ref[:, :] = (jnp.where(keep_self, s_lo, o_lo) ^ _FLIP).astype(jnp.uint32)


def _finish_kernel(size_ref, hi_ref, lo_ref, ohi_ref, olo_ref, *, chunk_rows, width):
    """All sub-chunk stages (chunk/2 .. 1) of ONE merge level, in VMEM.

    The level's ``size`` is a prefetched scalar so a single compiled kernel
    finishes every level of every sort size."""
    chunk = chunk_rows * width
    base = pl.program_id(0) * chunk
    rows_i = jax.lax.broadcasted_iota(jnp.int32, (chunk_rows, width), 0)
    cols_i = jax.lax.broadcasted_iota(jnp.int32, (chunk_rows, width), 1)
    pos = base + rows_i * width + cols_i
    size = size_ref[0]
    hi = hi_ref[:, :].astype(jnp.int32) ^ _FLIP
    lo = lo_ref[:, :].astype(jnp.int32) ^ _FLIP
    d = chunk // 2
    while d >= 1:
        hi, lo = _stage(hi, lo, pos, d, size, width)
        d //= 2
    ohi_ref[:, :] = (hi ^ _FLIP).astype(jnp.uint32)
    olo_ref[:, :] = (lo ^ _FLIP).astype(jnp.uint32)


def _run_finish(hi2, lo2, size, *, chunk_rows, width, interpret):
    rows = hi2.shape[0]
    grid = (rows // chunk_rows,)
    spec = pl.BlockSpec(
        (chunk_rows, width), lambda i, s: (i, 0), memory_space=pltpu.VMEM
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[spec, spec],
        out_specs=[spec, spec],
    )
    return pl.pallas_call(
        functools.partial(_finish_kernel, chunk_rows=chunk_rows, width=width),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct(hi2.shape, jnp.uint32),
            jax.ShapeDtypeStruct(lo2.shape, jnp.uint32),
        ],
        interpret=interpret,
    )(jnp.array([size], dtype=jnp.int32), hi2, lo2)


def _run_chunk_pass(hi2, lo2, sizes, *, chunk_rows, width, interpret):
    rows = hi2.shape[0]
    grid = (rows // chunk_rows,)
    spec = pl.BlockSpec(
        (chunk_rows, width), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        functools.partial(
            _chunk_kernel, chunk_rows=chunk_rows, width=width, sizes=tuple(sizes)
        ),
        grid=grid,
        in_specs=[spec, spec],
        out_specs=[spec, spec],
        out_shape=[
            jax.ShapeDtypeStruct(hi2.shape, jnp.uint32),
            jax.ShapeDtypeStruct(lo2.shape, jnp.uint32),
        ],
        interpret=interpret,
    )(hi2, lo2)


def _run_big_ce(hi2, lo2, d, size, *, width, interpret):
    rows = hi2.shape[0]
    rowdist = d // width
    block_rows = min(8, rowdist)
    per = rowdist // block_rows
    grid = (rows // block_rows,)

    spec_self = pl.BlockSpec(
        (block_rows, width), lambda i, s: (i, 0), memory_space=pltpu.VMEM
    )
    spec_other = pl.BlockSpec(
        (block_rows, width), lambda i, s: (i ^ s[0], 0), memory_space=pltpu.VMEM
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[spec_self, spec_self, spec_other, spec_other],
        out_specs=[spec_self, spec_self],
    )
    scal = jnp.array([per, size], dtype=jnp.int32)
    return pl.pallas_call(
        functools.partial(
            _big_ce_kernel,
            block_rows=block_rows,
            width=width,
        ),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct(hi2.shape, jnp.uint32)] * 2,
        interpret=interpret,
    )(scal, hi2, lo2, hi2, lo2)


@functools.partial(
    jax.jit, static_argnames=("chunk_rows", "width", "interpret")
)
def sort_pairs(
    hi: jnp.ndarray,
    lo: jnp.ndarray,
    *,
    chunk_rows: int = 128,
    width: int = 1024,
    interpret: bool = False,
):
    """Ascending-lexicographic sort of flat (hi, lo) uint32 key lanes.

    Unstable, keys-only (both lanes are compared) -- the drop-in for
    ``lax.sort((hi, lo), num_keys=2)`` in counting.  Pads internally to a
    power-of-two multiple of the chunk with sentinel keys and trims back;
    sentinels sort last, so real records are preserved.
    """
    n = hi.shape[0]
    chunk = chunk_rows * width
    if n < 2 * chunk:
        return lax.sort((hi, lo), num_keys=2)
    total = chunk
    while total < n:
        total *= 2
    if total != n:
        pad = total - n
        hi = jnp.concatenate([hi, jnp.full((pad,), SENTINEL, jnp.uint32)])
        lo = jnp.concatenate([lo, jnp.full((pad,), SENTINEL, jnp.uint32)])
    rows = total // width
    hi2 = hi.reshape(rows, width)
    lo2 = lo.reshape(rows, width)

    # merge levels up to the chunk, entirely in VMEM
    chunk_sizes = []
    s = 2
    while s <= chunk:
        chunk_sizes.append(s)
        s *= 2
    hi2, lo2 = _run_chunk_pass(
        hi2, lo2, chunk_sizes, chunk_rows=chunk_rows, width=width,
        interpret=interpret,
    )

    size = 2 * chunk
    while size <= total:
        d = size // 2
        while d >= chunk:
            hi2, lo2 = _run_big_ce(
                hi2, lo2, d, size, width=width, interpret=interpret
            )
            d //= 2
        # finish the level's sub-chunk stages in one VMEM pass
        hi2, lo2 = _run_finish(
            hi2, lo2, size, chunk_rows=chunk_rows, width=width,
            interpret=interpret,
        )
        size *= 2

    hi = hi2.reshape(total)
    lo = lo2.reshape(total)
    if total != n:
        hi = hi[:n]
        lo = lo[:n]
    return hi, lo


@functools.partial(
    jax.jit,
    static_argnames=("xla_chunk", "chunk_rows", "width", "interpret"),
)
def sort_pairs_hybrid(
    hi: jnp.ndarray,
    lo: jnp.ndarray,
    *,
    xla_chunk: int = 1 << 21,
    chunk_rows: int = 128,
    width: int = 1024,
    interpret: bool = False,
):
    """Large-n sort: XLA chunk sorts + Pallas bitonic merges.

    lax.sort degrades superlinearly (measured: 540M elem/s at 1.6M, 304M/s
    at 12.6M, ~70M/s at 231M) while staying near machine limits at ~2M.
    So: sort 2M-element chunks with lax.sort at its sweet spot, then run
    only the REMAINING merge levels of the standard bitonic network --
    cross-chunk stages as paired-block passes (HBM-bound, one round trip
    per stage) and sub-chunk stages fused in VMEM.

    Equivalence to the network: after lax-sorting all chunks ascending and
    reversing the odd ones, the array is exactly in the standard network's
    post-level-``xla_chunk`` state (block at start b ascending iff
    (b & 2*xla_chunk) == 0), so the remaining levels compose unchanged.
    """
    n = hi.shape[0]
    if xla_chunk % (chunk_rows * width):
        raise ValueError("xla_chunk must be a multiple of the pallas chunk")
    if n <= 2 * xla_chunk:
        return lax.sort((hi, lo), num_keys=2)
    total = xla_chunk
    while total < n:
        total *= 2
    if total != n:
        pad = total - n
        hi = jnp.concatenate([hi, jnp.full((pad,), SENTINEL, jnp.uint32)])
        lo = jnp.concatenate([lo, jnp.full((pad,), SENTINEL, jnp.uint32)])

    n_chunks = total // xla_chunk
    h = hi.reshape(n_chunks, xla_chunk)
    l = lo.reshape(n_chunks, xla_chunk)
    h, l = lax.sort((h, l), dimension=1, num_keys=2)
    odd = (jnp.arange(n_chunks, dtype=jnp.int32) & 1)[:, None] == 1
    h = jnp.where(odd, h[:, ::-1], h)
    l = jnp.where(odd, l[:, ::-1], l)

    rows = total // width
    h2 = h.reshape(rows, width)
    l2 = l.reshape(rows, width)
    pallas_chunk = chunk_rows * width
    size = 2 * xla_chunk
    while size <= total:
        d = size // 2
        while d >= pallas_chunk:
            h2, l2 = _run_big_ce(h2, l2, d, size, width=width, interpret=interpret)
            d //= 2
        h2, l2 = _run_finish(
            h2, l2, size, chunk_rows=chunk_rows, width=width,
            interpret=interpret,
        )
        size *= 2

    h = h2.reshape(total)
    l = l2.reshape(total)
    if total != n:
        h = h[:n]
        l = l[:n]
    return h, l
