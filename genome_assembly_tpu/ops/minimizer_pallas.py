"""Pallas fused fast-mode scan: pack + canonicalize + minimize in VMEM.

The XLA fast_scan materializes its windowed intermediates ([B, n_win]
uint32 pyramids) through HBM between fusions; this kernel keeps one block
of reads and every intermediate in VMEM, writing only the three output
lanes.  Grid over row blocks; each block is pure VPU work.

Numerically identical to ops/minimizer.fast_scan (asserted by tests in
interpret mode and on device).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from genome_assembly_tpu.ops import encode
from genome_assembly_tpu.ops.minimizer import WindowRecords


def _scan_kernel(codes_ref, mmer_ref, hi_ref, lo_ref, *, k, m, n_win):
    codes = codes_ref[:, :]
    length = codes.shape[-1]

    # m-mer scores + true RC from doubling pyramids (all in VMEM)
    mpacks = encode._doubling_packs(codes, m)
    mrcpacks = encode._doubling_rc_packs(codes, m)
    n_mpos = length - m + 1
    fwd = encode._windowed_pack(mpacks, m, n_mpos)
    rc_m = encode._windowed_rc_pack(mrcpacks, m, n_mpos)
    # Mosaic cannot legalize unsigned vector min (arith.minui); m-mer
    # scores are < 2^30, so signed min is exact.
    canon_m = jnp.minimum(fwd.astype(jnp.int32), rc_m.astype(jnp.int32))

    # sparse-table windowed min over the k - m + 1 m-mer positions
    wwin = k - m + 1
    if wwin == 1:
        wmin = canon_m[:, :n_win]
    else:
        level = canon_m
        span = 1
        while span * 2 <= wwin:
            level = jnp.minimum(level[:, : level.shape[1] - span], level[:, span:])
            span *= 2
        wmin = jnp.minimum(
            level[:, :n_win], level[:, wwin - span : wwin - span + n_win]
        )
    wmin = wmin.astype(jnp.uint32)

    khi, klo, rhi, rlo = encode.pack_kmers_both(codes, k)
    fwd_le = (khi < rhi) | ((khi == rhi) & (klo <= rlo))
    out_hi = jnp.where(fwd_le, khi, rhi)
    out_lo = jnp.where(fwd_le, klo, rlo)

    mmer_ref[:, :n_win] = wmin
    hi_ref[:, :n_win] = out_hi
    lo_ref[:, :n_win] = out_lo
    # pad the alignment tail with sentinels so downstream masking is cheap
    if n_win < mmer_ref.shape[1]:
        pad = jnp.full(
            (codes.shape[0], mmer_ref.shape[1] - n_win), 0xFFFFFFFF, jnp.uint32
        )
        mmer_ref[:, n_win:] = pad
        hi_ref[:, n_win:] = pad
        lo_ref[:, n_win:] = pad


@functools.partial(
    jax.jit, static_argnames=("k", "m", "block_rows", "interpret")
)
def fast_scan_pallas(
    codes: jnp.ndarray,
    lengths: jnp.ndarray,
    *,
    k: int,
    m: int,
    block_rows: int = 256,
    interpret: bool = False,
) -> WindowRecords:
    """Drop-in fused replacement for minimizer.fast_scan.

    codes [B, L] uint8 with B % block_rows == 0.
    """
    batch, max_len = codes.shape
    if batch % block_rows:
        raise ValueError(f"batch {batch} must divide block_rows {block_rows}")
    n_win = max_len - k + 1
    grid = (batch // block_rows,)

    out_shape = [
        jax.ShapeDtypeStruct((batch, max_len), jnp.uint32) for _ in range(3)
    ]
    mmer, khi, klo = pl.pallas_call(
        functools.partial(_scan_kernel, k=k, m=m, n_win=n_win),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (block_rows, max_len),
                lambda i: (i, 0),
                memory_space=pltpu.VMEM,
            )
        ],
        out_specs=[
            pl.BlockSpec(
                (block_rows, max_len),
                lambda i: (i, 0),
                memory_space=pltpu.VMEM,
            )
            for _ in range(3)
        ],
        out_shape=out_shape,
        interpret=interpret,
    )(codes)

    starts = jax.lax.broadcasted_iota(jnp.int32, (batch, n_win), 1)
    valid = starts + k <= lengths[:, None]
    return WindowRecords(
        mmer=mmer[:, :n_win],
        kmer_hi=khi[:, :n_win],
        kmer_lo=klo[:, :n_win],
        valid=valid,
    )
