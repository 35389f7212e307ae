"""Distributed unitig compaction: sharded link building + pointer jumping.

The dBG node table (sorted canonical k-mers) is replicated; the *states*
(2 per node) are sharded across the mesh, so the eight membership lookups
per node -- the dominant cost of link building -- run data-parallel, and
pointer-jumping rounds proceed with each shard gathering from the
replicated link table rebuilt by ``all_gather`` after each doubling round.

This gives multi-chip scaling for the compute-heavy phases while keeping
the table addressable from every shard.  (A fully-partitioned table with
neighbor lookups routed by key range is the planned next step for
genome-scale tables that exceed one chip's HBM; the interface here is the
same, so callers won't change.)
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from genome_assembly_tpu.ops import dbg

SHARD_AXIS = "shards"


@functools.partial(jax.jit, static_argnames=("k", "mesh"))
def sharded_unitig_links(
    khi: jnp.ndarray, klo: jnp.ndarray, valid: jnp.ndarray, *, k: int, mesh: Mesh
) -> jnp.ndarray:
    """next_state[2N] computed with states sharded across the mesh.

    NOTE: build_unitig_links is data-parallel per state, so sharding the
    state axis divides the lookup work n_shards ways; the key table stays
    replicated (read-only).
    """
    n = khi.shape[0]
    n_shards = mesh.shape[SHARD_AXIS]
    n_states = 2 * n
    if n_states % n_shards != 0:
        raise ValueError(f"2N={n_states} must divide mesh size {n_shards}")
    state_ids = jnp.arange(n_states, dtype=jnp.int32).reshape(n_shards, -1)

    def body(khi, klo, valid, shard_states):
        # shard_map gives [1, 2N/n]; compute this shard's links only
        links = _links_slice(khi, klo, valid, shard_states[0], k=k)
        return links[None]

    fn = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(SHARD_AXIS)),
        out_specs=P(SHARD_AXIS),
    )
    return fn(khi, klo, valid, state_ids).reshape(n_states)


def _links_slice(khi, klo, valid, state_slice, *, k):
    """build_unitig_links restricted to a slice of state ids.

    Mirrors ops/dbg.py's logic but only for the given states, so each shard
    does 1/n of the candidate lookups.
    """
    from genome_assembly_tpu.ops import encode

    if k % 2 == 0:
        raise ValueError("fast-mode dBG requires odd k")
    n = khi.shape[0]
    n_lo = min(k, 16)
    n_hi = k - n_lo
    mask_lo = jnp.uint32((1 << (2 * n_lo)) - 1)
    mask_hi = jnp.uint32((1 << (2 * n_hi)) - 1) if n_hi else jnp.uint32(0)

    rhi, rlo = encode.reverse_complement_packed(khi, klo, k)

    node = state_slice >> 1
    strand = state_slice & 1
    ohi = jnp.where(strand == 0, khi[node], rhi[node])
    olo = jnp.where(strand == 0, klo[node], rlo[node])
    state_valid = valid[node]

    if n_hi > 0:
        suf_hi = ((ohi << 2) | (olo >> (2 * (n_lo - 1)))) & mask_hi
        suf_lo_base = (olo << 2) & mask_lo
    else:
        suf_hi = jnp.zeros_like(ohi)
        suf_lo_base = (olo << 2) & mask_lo

    n_states_here = state_slice.shape[0]
    out_deg = jnp.zeros(n_states_here, dtype=jnp.int32)
    succ_state = jnp.full(n_states_here, -1, dtype=jnp.int32)
    # out-degree of EVERY state is needed for the in-degree test of
    # arbitrary targets, so compute full degrees cheaply once: each shard
    # computes its own slice's successors, but the target-side test uses
    # out_deg of flip(t) which may live on another shard.  Compute the
    # full-degree table locally instead (it is lookup-bound the same way,
    # so the fully-sharded variant routes by key range -- future work);
    # here degrees for all states are recomputed per shard only for the
    # *targets actually hit*, via direct candidate counting.
    for b in range(4):
        chi = suf_hi
        clo = suf_lo_base | jnp.uint32(b)
        rchi, rclo = encode.reverse_complement_packed(chi, clo, k)
        fwd_le = (chi < rchi) | ((chi == rchi) & (clo <= rclo))
        qhi = jnp.where(fwd_le, chi, rchi)
        qlo = jnp.where(fwd_le, clo, rclo)
        idx = dbg.lookup2(khi, klo, qhi, qlo)
        found = (idx >= 0) & state_valid
        t_state = jnp.where(fwd_le, 2 * idx, 2 * idx + 1).astype(jnp.int32)
        hairpin = t_state == (state_slice ^ 1)
        out_deg = out_deg + jnp.where(hairpin, 2, 1) * found.astype(jnp.int32)
        succ_state = jnp.where(found, t_state, succ_state)

    unique_succ = (out_deg == 1) & state_valid
    # in-degree(t) == out-degree(flip(t)): compute flip-target degrees by
    # running the same 4-candidate count for the flipped target states.
    t = jnp.where(unique_succ, succ_state, 0)
    flip_t = t ^ 1
    t_node = flip_t >> 1
    t_strand = flip_t & 1
    t_ohi = jnp.where(t_strand == 0, khi[t_node], rhi[t_node])
    t_olo = jnp.where(t_strand == 0, klo[t_node], rlo[t_node])
    if n_hi > 0:
        t_suf_hi = ((t_ohi << 2) | (t_olo >> (2 * (n_lo - 1)))) & mask_hi
        t_suf_lo = (t_olo << 2) & mask_lo
    else:
        t_suf_hi = jnp.zeros_like(t_ohi)
        t_suf_lo = (t_olo << 2) & mask_lo
    t_deg = jnp.zeros(n_states_here, dtype=jnp.int32)
    for b in range(4):
        chi = t_suf_hi
        clo = t_suf_lo | jnp.uint32(b)
        rchi, rclo = encode.reverse_complement_packed(chi, clo, k)
        fwd_le = (chi < rchi) | ((chi == rchi) & (clo <= rclo))
        qhi = jnp.where(fwd_le, chi, rchi)
        qlo = jnp.where(fwd_le, clo, rclo)
        idx = dbg.lookup2(khi, klo, qhi, qlo)
        found = idx >= 0
        cand_state = jnp.where(fwd_le, 2 * idx, 2 * idx + 1).astype(jnp.int32)
        hairpin = cand_state == (flip_t ^ 1)
        t_deg = t_deg + jnp.where(hairpin, 2, 1) * found.astype(jnp.int32)

    next_state = jnp.where(unique_succ & (t_deg == 1), succ_state, -1)
    return next_state


@functools.partial(jax.jit, static_argnames=("mesh",))
def sharded_pointer_jump(next_state: jnp.ndarray, *, mesh: Mesh) -> dbg.CompactedGraph:
    """Pointer doubling with the state axis sharded.

    Each round gathers parent pointers from the (re-replicated) previous
    round -- the gather sources are all-gathered once per round, the
    doubling itself is element-parallel per shard.
    """
    n2 = next_state.shape[0]
    n_shards = mesh.shape[SHARD_AXIS]
    if n2 % n_shards != 0:
        raise ValueError("state count must divide mesh size")
    steps = max(1, int(np.ceil(np.log2(max(n2, 2)))) + 1)

    def body(next_state_rep, shard_ids):
        shard_ids = shard_ids[0]
        ids_full = jnp.arange(n2, dtype=jnp.int32)
        pred_full = jnp.full(n2, -1, dtype=jnp.int32)
        src = jnp.where(next_state_rep >= 0, next_state_rep, n2)
        pred_full = pred_full.at[src].set(
            ids_full, mode="drop", unique_indices=True
        )
        parent_full = jnp.where(pred_full >= 0, pred_full, ids_full)

        parent = parent_full[shard_ids]
        rank = (pred_full[shard_ids] >= 0).astype(jnp.int32)
        min_id = jnp.minimum(shard_ids, parent)

        def round_body(_, carry):
            parent, rank, min_id = carry
            # re-replicate this round's full parent/rank/min tables, then
            # ONE row gather (per-row scalar-core cost; see
            # tools/bench_gather2.py) instead of three 1-D gathers
            parent_full = lax.all_gather(parent, SHARD_AXIS, tiled=True)
            rank_full = lax.all_gather(rank, SHARD_AXIS, tiled=True)
            min_full = lax.all_gather(min_id, SHARD_AXIS, tiled=True)
            tbl = jnp.stack([parent_full, rank_full, min_full], axis=1)
            g = tbl[parent]
            rank2 = rank + g[:, 1]
            min2 = jnp.minimum(min_id, g[:, 2])
            parent2 = g[:, 0]
            return parent2, rank2, min2

        parent, rank, min_id = lax.fori_loop(
            0, steps, round_body, (parent, rank, min_id)
        )
        is_cycle = pred_full[parent] >= 0
        head = jnp.where(is_cycle, min_id, parent)
        rank = jnp.where(is_cycle, 0, rank)  # round-count-independent
        return head[None], rank[None], is_cycle[None]

    shard_ids = jnp.arange(n2, dtype=jnp.int32).reshape(n_shards, -1)
    fn = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P(), P(SHARD_AXIS)),
        out_specs=(P(SHARD_AXIS), P(SHARD_AXIS), P(SHARD_AXIS)),
    )
    head, rank, is_cycle = fn(next_state, shard_ids)
    return dbg.CompactedGraph(
        next_state=next_state,
        head=head.reshape(n2),
        rank=rank.reshape(n2),
        is_cycle=is_cycle.reshape(n2),
    )
