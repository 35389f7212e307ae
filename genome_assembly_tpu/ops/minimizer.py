"""Minimizer/signature scans over read batches.

Two scans share the record format (mmer, kmer-hi, kmer-lo) per window:

- ``parity_scan``: replicates the reference's per-read signature recurrence
  (process_read, binning.c:902-1076) exactly, including the stale-signature
  quirk: the signature is recomputed by full window rescan only when the
  previous signature's start position falls behind the window start; m-mers
  entering on the right are otherwise ignored (SURVEY.md 2.1.3).  The
  recurrence is sequential in the window axis only, so it runs as a
  ``lax.scan`` over positions vmapped across thousands of reads -- the VPU
  sees [batch]-wide lanes at every step.

- ``fast_scan``: true canonical k-mers (lexicographic min of the k-mer and
  its reverse complement in 2-bit space) with standard leftmost-minimum
  minimizers, for the throughput path and for sharding decisions.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from genome_assembly_tpu.ops import encode


class WindowRecords(NamedTuple):
    """Per-window records of a read batch; all arrays are [batch, n_windows].

    mmer: packed signature m-mer (already complemented when is_rev).
    kmer_hi / kmer_lo: packed stored k-mer lanes (already complemented).
    valid: window exists (window start + k <= read length).
    """

    mmer: jnp.ndarray
    kmer_hi: jnp.ndarray
    kmer_lo: jnp.ndarray
    valid: jnp.ndarray


def _signature_positions(mx: jnp.ndarray, k: int, m: int) -> jnp.ndarray:
    """Sequential signature recurrence for one read.

    mx: [n_mpos] uint32, max(fwd, comp) score per m-mer start position.
    Returns sig_pos [n_windows] int32.
    """
    n_mpos = mx.shape[0]
    n_win = n_mpos - (k - m)
    wwin = k - m + 1

    def step(sig_pos, i):
        # Unconditional windowed argmax + select: under vmap a lax.cond
        # executes both branches anyway, and deriving everything from mx
        # keeps the carry's varying-axis type consistent under shard_map.
        w = lax.dynamic_slice_in_dim(mx, i, wwin)
        fresh = (i + jnp.argmax(w)).astype(jnp.int32)
        new_pos = jnp.where(sig_pos < i, fresh, sig_pos)
        return new_pos, new_pos

    init = (mx[0] * 0).astype(jnp.int32) - 1  # -1, inheriting mx's vma type
    _, positions = lax.scan(step, init, jnp.arange(n_win, dtype=jnp.int32))
    return positions


@functools.partial(jax.jit, static_argnames=("k", "m"))
def parity_scan(
    codes: jnp.ndarray, lengths: jnp.ndarray, *, k: int, m: int
) -> WindowRecords:
    """Reference-exact signature scan over a padded read batch.

    codes: [batch, max_len] uint8; lengths: [batch] int32.
    """
    if k < 2 * m:
        raise ValueError("parity scan requires k >= 2m (SURVEY.md 2.1.3)")
    batch, max_len = codes.shape
    n_win = max_len - k + 1
    mask = jnp.uint32((1 << (2 * m)) - 1)

    fwd = encode.windowed_scores(codes, m)  # [batch, n_mpos]
    comp = mask - fwd
    mx = jnp.maximum(fwd, comp)

    sig_pos = jax.vmap(lambda row: _signature_positions(row, k, m))(mx)

    fwd_at_sig = jnp.take_along_axis(fwd, sig_pos, axis=1)
    is_rev = (mask - fwd_at_sig) >= fwd_at_sig
    mmer = jnp.where(is_rev, mask - fwd_at_sig, fwd_at_sig)

    khi, klo = encode.pack_kmers(codes, k)
    chi, clo = encode.complement_packed(khi, klo, k)
    kmer_hi = jnp.where(is_rev, chi, khi)
    kmer_lo = jnp.where(is_rev, clo, klo)

    starts = jax.lax.broadcasted_iota(jnp.int32, (batch, n_win), 1)
    valid = starts + k <= lengths[:, None]
    return WindowRecords(mmer, kmer_hi, kmer_lo, valid)


@functools.partial(jax.jit, static_argnames=("k", "m"))
def fast_scan(
    codes: jnp.ndarray, lengths: jnp.ndarray, *, k: int, m: int
) -> WindowRecords:
    """Canonical k-mer + minimizer scan (no reference quirks).

    The canonical form of a window is the lexicographic minimum (as 2-bit
    integers, which equals string order under A<C<G<T... note our code order
    is T<G<C<A, so "minimum packed value" = lexicographically LARGEST string;
    any total order works as long as it is strand-symmetric and consistent,
    and integer-min is the cheapest on the VPU).  The minimizer is the
    leftmost minimum m-mer score over min(fwd, comp) -- used for bucket
    routing; it is strand-symmetric so both orientations of a k-mer land in
    the same shard.
    """
    batch, max_len = codes.shape
    n_win = max_len - k + 1

    # m-mer scores and their true reverse complements from shared doubling
    # pyramids (O(log m) combines, fused by XLA).
    mpacks = encode._doubling_packs(codes, m)
    mrcpacks = encode._doubling_rc_packs(codes, m)
    n_mpos = max_len - m + 1
    fwd = encode._windowed_pack(mpacks, m, n_mpos)
    rc_m = encode._windowed_rc_pack(mrcpacks, m, n_mpos)
    # strand-symmetric m-mer key: min(mmer, true reverse complement), so a
    # k-mer and its RC always produce the same minimizer (and therefore the
    # same shard) -- unlike the reference's complement-without-reversal.
    canon_m = jnp.minimum(fwd, rc_m)

    # Windowed min over the k - m + 1 m-mer positions of each window via a
    # sparse table (doubling): O(log wwin) minimum ops instead of O(wwin),
    # final window = min of two overlapping power-of-two spans.
    wwin = k - m + 1
    if wwin == 1:
        wmin = canon_m[:, :n_win]
    else:
        level = canon_m
        span = 1
        while span * 2 <= wwin:
            level = jnp.minimum(
                level[:, : level.shape[1] - span], level[:, span:]
            )
            span *= 2
        wmin = jnp.minimum(
            level[:, :n_win], level[:, wwin - span : wwin - span + n_win]
        )

    khi, klo, rhi, rlo = encode.pack_kmers_both(codes, k)
    fwd_smaller = (khi < rhi) | ((khi == rhi) & (klo <= rlo))
    kmer_hi = jnp.where(fwd_smaller, khi, rhi)
    kmer_lo = jnp.where(fwd_smaller, klo, rlo)

    starts = jax.lax.broadcasted_iota(jnp.int32, (batch, n_win), 1)
    valid = starts + k <= lengths[:, None]
    return WindowRecords(wmin, kmer_hi, kmer_lo, valid)
