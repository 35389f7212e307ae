"""Merge-path sort: XLA row sorts + one-HBM-pass-per-level Pallas merges.

MEASURED RESULT (tools/bench_mpath.py, v5-lite): correct everywhere but
SLOWER than lax.sort at every size -- 35.0 vs 22.6 ms at 8.4M, 424 vs
268 ms at 67M.  The level passes are VPU-bound, not HBM-bound: a Batcher
merge level is log2(window) compare-exchange stages and each stage's
flat shift costs 2-3 cross-lane ``pltpu.roll``s.  Kept as an optional
backend and a documented negative result (the third: see
ops/bitonic_pallas.py and NOTES.md's count-roofline section for why XLA's
sort is the practical ceiling on this hardware).

Why the backend was built (measured, NOTES.md): ``lax.sort`` of two-lane
records runs near machine limits at ~2M elements (540M elem/s) but
degrades superlinearly (304M at 12.6M; 250M at 67M re-measured) -- and
chromosome-scale counts sort hundreds of millions of records.  Round
1's bitonic hybrids LOST because their cross-chunk stages cost one HBM
round trip per network STAGE (log^2 passes).  Here every merge LEVEL is a
single HBM pass:

  1. ``lax.sort`` of the flat array viewed as [n/1024, 1024] rows -- XLA's
     row sort measured 3.8G elem/s, ~7x its monolithic rate.
  2. Per level run -> 2*run: a merge-path kernel.  Every output tile of T
     elements finds its source split (a0, b0) in its run pair A|B via a
     vectorized binary search on the merge diagonal (tiny, XLA), then one
     grid step DMAs the rows covering A[a0:a0+T) and B[b0:b0+T) into VMEM,
     aligns them with an in-VMEM flat shift, merges 2T elements with a
     Batcher odd-even network, and writes the first T -- exactly output
     positions [i*T, (i+1)*T) of the global merge.  log2(n/1024) levels,
     each ONE pass over HBM.

Equal records are interchangeable (both lanes are key), so any valid
merge-path split yields the same multiset per tile -- the network's tie
order is unobservable, exactly like ops/bitonic_pallas.py.

The kernel is compiled ONCE for all levels of all sizes: the level enters
only through the prefetched split arrays (a0/b0/aend/bend per tile).
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

_FLIP = -0x80000000  # uint32 order == int32 order after this xor
_IMAX = 0x7FFFFFFF  # flip-encoded +inf (sentinel sorts last)


def _roll(x, shift, axis, interpret):
    """pltpu.roll when compiling for TPU (jnp.roll has no efficient Mosaic
    lowering); jnp.roll in interpret mode (pltpu.roll has no eval rule).
    Convention matches jnp.roll: out[i] = x[i - shift] along axis."""
    if interpret:
        return jnp.roll(x, shift, axis=axis)
    return pltpu.roll(x, shift % x.shape[axis], axis=axis)


def _le2(ah, al, bh, bl):
    return (ah < bh) | ((ah == bh) & (al <= bl))


def merge_splits(hi: jnp.ndarray, lo: jnp.ndarray, run: int, tile: int):
    """Per-output-tile source splits for one merge level.

    hi/lo: flat [n] uint32, sorted in runs of length ``run`` (n % (2*run)
    == 0).  Returns int32 [n/tile] arrays (a0, b0, aend, bend): tile i of
    the merged output consumes A[a0..] and B[b0..] where A/B are the two
    runs of its pair; aend/bend bound the runs for sentinel masking.

    The split is the classic merge-path crossing: the largest j with
    A[j-1] <= B[d-j] (monotone predicate => binary search), vectorized
    over all tiles with two-lane row gathers.
    """
    n = hi.shape[0]
    n_tiles = n // tile
    i = jnp.arange(n_tiles, dtype=jnp.int32)
    out0 = i * tile
    pair = out0 // (2 * run)
    d = out0 - pair * 2 * run
    base = pair * 2 * run

    tbl = jnp.stack([hi, lo], axis=1)

    lo_j = jnp.maximum(0, d - run)
    hi_j = jnp.minimum(d, run)

    def pred(j):
        # True iff split j is not past the crossing: A[j-1] <= B[d-j]
        # j == 0: A[-1] = -inf -> True; d - j >= run: B[run] = +inf -> True
        a_idx = jnp.clip(base + j - 1, 0, n - 1)
        b_idx = jnp.clip(base + run + d - j, 0, n - 1)
        a = tbl[a_idx]
        b = tbl[b_idx]
        ok = _le2(a[:, 0], a[:, 1], b[:, 0], b[:, 1])
        return (j == 0) | (d - j >= run) | ok

    # binary search for the largest j in [lo_j, hi_j] with pred(j)
    # (pred is monotone True..False); invariant: pred(lo_b) is True
    steps = max(1, int(np.ceil(np.log2(max(run, 2)))) + 1)

    def body(_, carry):
        lo_b, hi_b = carry
        mid = (lo_b + hi_b + 1) >> 1
        p = pred(mid)
        lo_b = jnp.where(p, mid, lo_b)
        hi_b = jnp.where(p, hi_b, mid - 1)
        return lo_b, hi_b

    j, _ = lax.fori_loop(0, steps, body, (lo_j, hi_j))
    a0 = base + j
    b0 = base + run + (d - j)
    aend = base + run
    bend = base + 2 * run
    return a0, b0, aend, bend


def _flat_shift(x, k, width, interpret=False):
    """x viewed as a flat row-major array shifted by k flat positions:
    out[p] = x[p + k] for k >= 0, x[p - |k|] for k < 0 (wrapped tails are
    garbage -- callers mask).  k may be a traced scalar for 0 <= k <
    rows*width (the alignment shift; crosses rows via a dynamic sublane
    roll); network stages pass python ints."""
    rows = x.shape[0]
    if isinstance(k, (int, np.integer)):
        if k >= 0:
            r, c = divmod(k, width)
            a = _roll(x, -c, 1, interpret)
            if r:
                a = _roll(a, -r, 0, interpret)
            if c == 0:
                return a
            b = _roll(a, -1, 0, interpret)
        else:
            r, c = divmod(-k, width)
            a = _roll(x, c, 1, interpret)
            if r:
                a = _roll(a, r, 0, interpret)
            if c == 0:
                return a
            b = _roll(a, 1, 0, interpret)
        col = lax.broadcasted_iota(jnp.int32, x.shape, 1)
        if k >= 0:
            return jnp.where(col < width - c, a, b)
        return jnp.where(col >= c, a, b)
    # traced non-negative shift: sub-row part by a lane roll + row blend,
    # whole-row part by a dynamic sublane roll
    r = k // width
    c = k % width
    a = _roll(x, -c, 1, interpret)
    b = _roll(a, -1, 0, interpret)
    col = lax.broadcasted_iota(jnp.int32, x.shape, 1)
    merged = jnp.where(col < width - c, a, b)
    return _roll(merged, -r, 0, interpret)


def _merge_level(hi, lo, pos, *, m, window, width, interpret=False):
    """One Batcher odd-even merge LEVEL: every aligned ``window``-sized
    region (window == 2m) whose halves are ascending becomes fully sorted.
    hi/lo: int32 flip-encoded [rows, width]; pos: flat positions."""
    k = m
    while k >= 1:
        if k == m:
            lower = (pos & m) == 0
            upper = ~lower
        else:
            lower = ((pos & k) == k) & ((pos & (window - 1)) + k < window)
            q = pos - k
            upper = (q >= 0) & ((q & k) == k) & ((q & (window - 1)) + k < window)
        f_hi = _flat_shift(hi, k, width, interpret)
        f_lo = _flat_shift(lo, k, width, interpret)
        g_hi = _flat_shift(hi, -k, width, interpret)
        g_lo = _flat_shift(lo, -k, width, interpret)
        le_f = _le2(hi, lo, f_hi, f_lo)  # self <= forward partner
        ge_g = _le2(g_hi, g_lo, hi, lo)  # backward partner <= self
        new_hi = jnp.where(
            lower,
            jnp.where(le_f, hi, f_hi),
            jnp.where(upper, jnp.where(ge_g, hi, g_hi), hi),
        )
        new_lo = jnp.where(
            lower,
            jnp.where(le_f, lo, f_lo),
            jnp.where(upper, jnp.where(ge_g, lo, g_lo), lo),
        )
        hi, lo = new_hi, new_lo
        k //= 2
    return hi, lo


def _merge_network(hi, lo, *, t, width, interpret=False):
    """Merge a [2t/width, width] array whose two halves are ascending."""
    rows2 = 2 * t // width
    pos = (
        lax.broadcasted_iota(jnp.int32, (rows2, width), 0) * width
        + lax.broadcasted_iota(jnp.int32, (rows2, width), 1)
    )
    return _merge_level(
        hi, lo, pos, m=t, window=2 * t, width=width, interpret=interpret
    )


def _local_merge_kernel(hi_ref, lo_ref, ohi_ref, olo_ref, *, levels, width,
                        interpret):
    """Fuse every merge level up to the block size in one VMEM pass.

    The block holds ascending runs of ``levels[0]/2``; after the kernel it
    holds ascending runs of ``levels[-1]`` -- log-many levels for ONE HBM
    round trip (this is what round 1's per-stage big_ce passes lacked)."""
    rows = hi_ref.shape[0]
    pos = (
        lax.broadcasted_iota(jnp.int32, (rows, width), 0) * width
        + lax.broadcasted_iota(jnp.int32, (rows, width), 1)
    )
    hi = hi_ref[...].astype(jnp.int32) ^ _FLIP
    lo = lo_ref[...].astype(jnp.int32) ^ _FLIP
    for L in levels:
        hi, lo = _merge_level(
            hi, lo, pos, m=L // 2, window=L, width=width, interpret=interpret
        )
    ohi_ref[...] = (hi ^ _FLIP).astype(jnp.uint32)
    olo_ref[...] = (lo ^ _FLIP).astype(jnp.uint32)


def _local_merge_pass(h2, l2, *, levels, chunk_rows, width, real_rows,
                      interpret):
    """Apply _local_merge_kernel over the real rows (pad rows untouched)."""
    grid = (real_rows // chunk_rows,)
    spec = pl.BlockSpec(
        (chunk_rows, width), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    rows_padded = h2.shape[0]
    return pl.pallas_call(
        functools.partial(
            _local_merge_kernel, levels=tuple(levels), width=width,
            interpret=interpret,
        ),
        grid=grid,
        in_specs=[spec, spec],
        out_specs=[spec, spec],
        out_shape=[
            jax.ShapeDtypeStruct((rows_padded, width), jnp.uint32),
            jax.ShapeDtypeStruct((rows_padded, width), jnp.uint32),
        ],
        interpret=interpret,
        # the fused level stack's live temporaries exceed the default 16M
        # scoped-vmem limit (measured 27.9M at chunk 2^17); v5e has 128M
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
    )(h2, l2)


def _merge_kernel(
    arow_ref, brow_ref, a0_ref, b0_ref, aend_ref, bend_ref,  # prefetch
    hi_ref, lo_ref,  # [n/width, width] in compiler-chosen (HBM) space
    ohi_ref, olo_ref,  # output tile [t/width, width] in VMEM
    sa_hi, sa_lo, sb_hi, sb_lo, sems,
    *, t, width, interpret,
):
    i = pl.program_id(0)
    rows_t = t // width
    # DMA slice starts AND lengths must respect the (8, 128) sublane
    # tiling: align each start down to a multiple of 8 and copy rows_t + 8
    # rows (covers the rows_t + 1 the window needs at any misalignment;
    # pad rows exist past every possible start, and the extras never
    # reach the output -- the in-VMEM flat shift re-aligns)
    rows_cp = rows_t + 8
    arow = (arow_ref[i] // 8) * 8
    brow = (brow_ref[i] // 8) * 8
    copies = [
        pltpu.make_async_copy(
            hi_ref.at[pl.ds(arow, rows_cp)], sa_hi, sems.at[0]
        ),
        pltpu.make_async_copy(
            lo_ref.at[pl.ds(arow, rows_cp)], sa_lo, sems.at[1]
        ),
        pltpu.make_async_copy(
            hi_ref.at[pl.ds(brow, rows_cp)], sb_hi, sems.at[2]
        ),
        pltpu.make_async_copy(
            lo_ref.at[pl.ds(brow, rows_cp)], sb_lo, sems.at[3]
        ),
    ]
    for c in copies:
        c.start()
    for c in copies:
        c.wait()

    row_i = lax.broadcasted_iota(jnp.int32, (rows_cp, width), 0)
    col_i = lax.broadcasted_iota(jnp.int32, (rows_cp, width), 1)

    def window(s_hi, s_lo, row0, w0, wend):
        # loaded rows start at flat position row0*width; align so the
        # window's first element (flat w0) lands at local position 0
        shift = w0 - row0 * width  # in [0, width)
        gpos = row0 * width + row_i * width + col_i + shift
        ok = (gpos >= w0) & (gpos < wend)
        h = jnp.where(
            ok,
            _flat_shift(s_hi[...].astype(jnp.int32) ^ _FLIP, shift, width, interpret),
            _IMAX,
        )
        l = jnp.where(
            ok,
            _flat_shift(s_lo[...].astype(jnp.int32) ^ _FLIP, shift, width, interpret),
            _IMAX,
        )
        return h[:rows_t], l[:rows_t]

    ahi, alo = window(sa_hi, sa_lo, arow, a0_ref[i], aend_ref[i])
    bhi, blo = window(sb_hi, sb_lo, brow, b0_ref[i], bend_ref[i])
    hi2 = jnp.concatenate([ahi, bhi], axis=0)
    lo2 = jnp.concatenate([alo, blo], axis=0)
    mhi, mlo = _merge_network(hi2, lo2, t=t, width=width, interpret=interpret)
    ohi_ref[...] = (mhi[:rows_t] ^ _FLIP).astype(jnp.uint32)
    olo_ref[...] = (mlo[:rows_t] ^ _FLIP).astype(jnp.uint32)


def _merge_pass(hi2, lo2, arow, brow, a0, b0, aend, bend, *, t, width,
                real_rows, interpret):
    """hi2/lo2: [real_rows + t//width + 8, width] -- real data in the
    first real_rows rows; the pad rows may hold anything (every window
    masks reads beyond its run end, and runs end within the real rows).
    Output has the same padded shape with the pad rows UNWRITTEN."""
    rows_padded = hi2.shape[0]
    rows_t = t // width
    grid = (real_rows // rows_t,)
    out_spec = pl.BlockSpec(
        (rows_t, width), lambda i, *s: (i, 0), memory_space=pltpu.VMEM
    )
    in_spec = pl.BlockSpec(memory_space=pltpu.ANY)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        grid=grid,
        in_specs=[in_spec, in_spec],
        out_specs=[out_spec, out_spec],
        scratch_shapes=[
            pltpu.VMEM((rows_t + 8, width), jnp.uint32),
            pltpu.VMEM((rows_t + 8, width), jnp.uint32),
            pltpu.VMEM((rows_t + 8, width), jnp.uint32),
            pltpu.VMEM((rows_t + 8, width), jnp.uint32),
            pltpu.SemaphoreType.DMA((4,)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_merge_kernel, t=t, width=width, interpret=interpret),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((rows_padded, width), jnp.uint32),
            jax.ShapeDtypeStruct((rows_padded, width), jnp.uint32),
        ],
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
    )(arow, brow, a0, b0, aend, bend, hi2, lo2)


@functools.partial(
    jax.jit,
    static_argnames=("tile", "width", "base_run", "chunk", "interpret"),
)
def sort_pairs_mergepath(
    hi: jnp.ndarray,
    lo: jnp.ndarray,
    *,
    tile: int = 8192,
    width: int = 1024,
    base_run: int = 1024,
    chunk: int = 1 << 17,
    interpret: bool = False,
):
    """Ascending sort of flat (hi, lo) uint32 key lanes (keys-only).

    Drop-in for ``lax.sort((hi, lo), num_keys=2)`` on large arrays:

      rowsort(base_run) -> local VMEM merges (levels 2*base_run..chunk,
      one HBM pass) -> one merge-path pass per level chunk*2..total.

    Pads internally to a power of two with sentinels and trims back.
    Requires tile <= chunk (merge-path tiles must sit inside one run
    pair) and width | tile | chunk, all powers of two.
    """
    n = hi.shape[0]
    if n < 4 * chunk:
        return lax.sort((hi, lo), num_keys=2)
    total = 1 << int(np.ceil(np.log2(n)))
    if total != n:
        pad = total - n
        hi = jnp.concatenate([hi, jnp.full((pad,), SENTINEL, jnp.uint32)])
        lo = jnp.concatenate([lo, jnp.full((pad,), SENTINEL, jnp.uint32)])

    rows = total // base_run
    h2, l2 = lax.sort(
        (hi.reshape(rows, base_run), lo.reshape(rows, base_run)),
        dimension=1,
        num_keys=2,
    )
    real_rows = total // width
    rows_t = tile // width
    # window loads are (rows_t + 8) rows (rows_t + 1 needed, rounded up to
    # the sublane tiling) from arbitrary row starts up to the array end:
    # pad once so no load is ever out of bounds.  Pad contents are never
    # read unmasked (runs end inside the real rows).
    padrows = jnp.full((rows_t + 8, width), SENTINEL, jnp.uint32)
    h2 = jnp.concatenate([h2.reshape(real_rows, width), padrows])
    l2 = jnp.concatenate([l2.reshape(real_rows, width), padrows])

    levels = []
    L = 2 * base_run
    while L <= chunk:
        levels.append(L)
        L *= 2
    if levels:
        h2, l2 = _local_merge_pass(
            h2, l2, levels=levels, chunk_rows=chunk // width, width=width,
            real_rows=real_rows, interpret=interpret,
        )

    run = chunk
    while run < total:
        hflat = h2[:real_rows].reshape(total)
        lflat = l2[:real_rows].reshape(total)
        a0, b0, aend, bend = merge_splits(hflat, lflat, run, tile)
        h2, l2 = _merge_pass(
            h2, l2, a0 // width, b0 // width, a0, b0, aend, bend,
            t=tile, width=width, real_rows=real_rows, interpret=interpret,
        )
        run *= 2

    h = h2[:real_rows].reshape(total)
    l = l2[:real_rows].reshape(total)
    if total != n:
        h = h[:n]
        l = l[:n]
    return h, l
