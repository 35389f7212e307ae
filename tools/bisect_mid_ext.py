"""On-chip bisection of the mid-scale distributed-extension TPU fault.

Both ``run_scale --preset mid --ext-mode part`` and ``wide`` crash the TPU
worker ("kernel fault") at 64M states inside the FIRST dispatched program
(the partitioned links join; crash surfaces at the lovf hard sync,
runs/mid_part_r4k.jsonl / mid_wide_r4k.jsonl).  The 1-device differential
test passes on CPU, so the fault is Mosaic/XLA:TPU-specific and can only
be bisected on silicon (VERDICT r4 item 1).

Each ``--stage`` dispatches ONE prefix of the join body on a 1-device
mesh over synthetic sorted keys and prints a single JSON line with the
wall + a checksum (full-output reductions -- the relay slices away
unreduced graphs, NOTES hazards).  A TPU worker crash kills the process,
so the driver (tools/drive_r5a.sh) reads the exit code per stage:

  incore    control: the in-core dbg.build_unitig_links_join (known good
            on chip at 200M states)
  boundary  _boundary_records only (per-state oriented prefix/suffix keys)
  pack      + _pack_by_owner (6-operand 4R-row sort + capacity scatter)
  pairs     + _xchg + _pair_edges (3-key 4R-row sort + adjacency test)
  join      the full partitioned_unitig_links_join (adds the edge
            route-home: second pack + scatter into next_state)
  jumppred  jump predecessor build alone on a synthetic chain forest
  jump      the full partitioned_pointer_jump
  joinw     partitioned_unitig_links_join_wide
  jumpw     partitioned_pointer_jump_wide

--nodes scales N (states = 2N): the mid preset kept 32.0M nodes, so
``--nodes 32000000`` reproduces the crash config and smaller values probe
for a size threshold.  Keys are uniform random (sorted, hi lane < 2^30) --
the join's control flow is content-independent, so any keys reproduce a
backend fault.
"""

from __future__ import annotations

import argparse
import functools
import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

sys.path.insert(0, ".")

K = 31


def synth_keys(n, seed=0):
    """Sorted synthetic 2-lane keys + all-valid mask, on device."""
    kk = jax.random.PRNGKey(seed)

    @jax.jit
    def make(kk):
        hi = jax.random.bits(jax.random.fold_in(kk, 0), (n,), jnp.uint32)
        lo = jax.random.bits(jax.random.fold_in(kk, 1), (n,), jnp.uint32)
        hi = hi & jnp.uint32((1 << 30) - 1)  # valid hi lanes stay < 2^30
        hi, lo = lax.sort((hi, lo), num_keys=2)
        return hi, lo, jnp.ones((n,), dtype=bool)

    return make(kk)


def synth_links(n2, seed=0, chain=1024):
    """Synthetic chain forest: next[i] = i+1 except every chain-th."""

    @jax.jit
    def make():
        ids = jnp.arange(n2, dtype=jnp.int32)
        nxt = jnp.where((ids + 1) % chain == 0, -1, ids + 1)
        return jnp.where(ids == n2 - 1, -1, nxt)

    return make()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", required=True)
    ap.add_argument("--nodes", type=int, default=32_000_000)
    ap.add_argument("--slack", type=float, default=1.0)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from genome_assembly_tpu.ops import dbg
    from genome_assembly_tpu.parallel import part_dbg

    n = args.nodes
    stage = args.stage
    t_gen = time.perf_counter()

    def emit(**kw):
        print(json.dumps({"stage": stage, "nodes": n, **kw}), flush=True)

    mesh = Mesh(np.array(jax.devices()[:1]), (part_dbg.SHARD_AXIS,))
    n_shards, rows = 1, n
    cap_rec = max(1, int(np.ceil(4 * rows / n_shards * args.slack)))
    cap_edge = max(1, int(np.ceil(2 * rows / n_shards * args.slack)))

    def smap(body, n_out):
        return jax.jit(jax.shard_map(
            body, mesh=mesh,
            in_specs=(P(part_dbg.SHARD_AXIS),) * 3,
            out_specs=(P(part_dbg.SHARD_AXIS),) * n_out,
        ))

    if stage in ("jump", "jumppred", "jumpw"):
        links = synth_links(2 * n)
        gen_s = time.perf_counter() - t_gen
        t0 = time.perf_counter()
        if stage == "jump":
            graph, ovf = part_dbg.partitioned_pointer_jump(
                links, mesh=mesh, slack=2.0 / (2 * n)
            )
            chk = int(np.sum(np.asarray(ovf))) + int(
                jnp.sum(graph.rank.astype(jnp.int64))
            )
        elif stage == "jumpw":
            no = jnp.zeros((2 * n,), jnp.int32)
            no = jnp.where(links >= 0, 0, -1)
            wg, ovf = part_dbg.partitioned_pointer_jump_wide(
                no, jnp.where(links >= 0, links, -1),
                mesh=mesh, slack=2.0 / (2 * n),
            )
            chk = int(np.sum(np.asarray(ovf))) + int(
                jnp.sum(wg.rank_lo.astype(jnp.int64))
            )
        else:  # jumppred: the pred-table build alone
            rows2 = 2 * n
            cap = 2

            def pred_body(next_l, a, b):
                del a, b
                base = lax.axis_index(part_dbg.SHARD_AXIS).astype(jnp.int32)
                base = base * rows2
                gids = base + jnp.arange(rows2, dtype=jnp.int32)
                me = base // rows2
                dest = next_l
                owner = jnp.clip(dest, 0, 2 * n - 1) // rows2
                is_local = (dest >= 0) & (owner == me)
                active = (dest >= 0) & ~is_local
                blocks, _, ovf = part_dbg._pack_by_owner(
                    owner, active, (dest, gids),
                    (jnp.int32(-1), jnp.int32(-1)), n_shards, cap,
                )
                r_dest = part_dbg._xchg(blocks[0], n_shards).reshape(-1)
                r_src = part_dbg._xchg(blocks[1], n_shards).reshape(-1)
                pred_l = jnp.full(rows2, -1, dtype=jnp.int32)
                loc_local = jnp.where(is_local, dest - base, rows2)
                pred_l = pred_l.at[loc_local].set(
                    gids, mode="drop", unique_indices=True)
                loc = jnp.where(r_dest >= 0, r_dest - base, rows2)
                pred_l = pred_l.at[loc].set(
                    r_src, mode="drop", unique_indices=True)
                return (jnp.sum(pred_l.astype(jnp.int64))[None],
                        ovf[None])

            fn = smap(pred_body, 2)
            s, ovf = fn(links, links, links)
            chk = int(np.asarray(s)[0]) + int(np.sum(np.asarray(ovf)))
        emit(wall_s=round(time.perf_counter() - t0, 3),
             gen_s=round(gen_s, 3), checksum=chk)
        return 0

    khi, klo, valid = synth_keys(n)
    # relay hazard: block_until_ready does not sync; only readback does
    print(json.dumps({"stage": stage, "nodes": n, "phase": "gen_done",
                      "khi0": int(np.asarray(khi[:1])[0])}), flush=True)
    gen_s = time.perf_counter() - t_gen

    t0 = time.perf_counter()
    if stage.startswith("sort") or stage in ("scan", "iotafill"):
        # micro-stages: isolate _pack_by_owner's constituent primitives.
        #   sort5s  5-operand num_keys=1 is_stable=True   (the pack sort)
        #   sort5u  5-operand num_keys=1 unstable
        #   sort4s  4-operand num_keys=1 stable
        #   sort3k  4-operand num_keys=3 unstable         (the in-core mix)
        #   scan    associative_scan cummax over 4R
        #   iotafill 2D-iota gather block fill over 4R
        # suffix "j" = plain jit (no shard_map): sort5sj etc.
        base = stage.rstrip("j")
        wrap_smap = not stage.endswith("j")
        q = 4 * rows

        def micro(khi_l, klo_l, valid_l):
            owner = jnp.zeros((q,), jnp.uint32)
            idx = jnp.arange(q, dtype=jnp.int32)
            kh = jnp.tile(khi_l, 4)
            kl = jnp.tile(klo_l, 4)
            pay = idx.astype(jnp.uint32)
            if base == "sort5s":
                outs = lax.sort((owner, idx, kh, kl, pay), num_keys=1,
                                is_stable=True)
            elif base == "sort5u":
                outs = lax.sort((owner, idx, kh, kl, pay), num_keys=1,
                                is_stable=False)
            elif base == "sort4s":
                outs = lax.sort((owner, idx, kh, kl), num_keys=1,
                                is_stable=True)
            elif base == "sort3k":
                outs = lax.sort((kh, kl, pay, idx), num_keys=3)
            elif base == "scan":
                gs = jnp.concatenate(
                    [jnp.ones((1,), bool), kh[1:] != kh[:-1]])
                outs = (lax.associative_scan(
                    jnp.maximum, jnp.where(gs, idx, -1)),)
            elif base == "iotafill":
                starts = jnp.searchsorted(
                    kh, jnp.arange(2, dtype=kh.dtype), side="left"
                ).astype(jnp.int32)
                jj = lax.broadcasted_iota(jnp.int32, (1, q), 0)
                cc = lax.broadcasted_iota(jnp.int32, (1, q), 1)
                src = jnp.clip(starts[jj] + cc, 0, q - 1)
                outs = (jnp.where(src < starts[jj + 1], kh[src],
                                  jnp.uint32(0)),)
            else:
                raise SystemExit(f"unknown micro stage {stage}")
            s = sum(jnp.sum(o.astype(jnp.uint32)).astype(jnp.uint32)
                    for o in outs)
            return (s[None],)

        if wrap_smap:
            fn = smap(micro, 1)
        else:
            fn = jax.jit(micro)
        (s,) = fn(khi, klo, valid)
        chk = int(np.asarray(s)[0])
        emit(wall_s=round(time.perf_counter() - t0, 3),
             gen_s=round(gen_s, 3), checksum=chk)
        return 0
    if stage == "incore":
        links = dbg.build_unitig_links_join(khi, klo, valid, k=K)
        chk = int(jnp.sum((links >= 0).astype(jnp.int64)))
    elif stage == "join":
        links, ovf = part_dbg.partitioned_unitig_links_join(
            khi, klo, valid, k=K, mesh=mesh, slack=args.slack
        )
        chk = int(jnp.sum((links >= 0).astype(jnp.int64))) + int(
            np.sum(np.asarray(ovf))
        )
    elif stage == "joinw":
        no, nl, ovf = part_dbg.partitioned_unitig_links_join_wide(
            khi, klo, valid, k=K, mesh=mesh, slack=args.slack
        )
        chk = int(jnp.sum((no >= 0).astype(jnp.int64))) + int(
            np.sum(np.asarray(ovf))
        )
    elif stage == "boundary":

        def body(khi_l, klo_l, valid_l):
            sid2 = jnp.arange(2 * rows, dtype=jnp.int32)
            gid = (2 * (sid2 >> 1) + (sid2 & 1)).astype(jnp.uint32)
            kh, kl, pay, act = part_dbg._boundary_records(
                khi_l, klo_l, valid_l, k=K, rows=rows, gid=gid
            )
            s = (jnp.sum(kh.astype(jnp.uint64)) + jnp.sum(kl.astype(jnp.uint64))
                 + jnp.sum(pay.astype(jnp.uint64))
                 + jnp.sum(act.astype(jnp.uint64)))
            return (s[None],)

        (s,) = smap(body, 1)(khi, klo, valid)
        chk = int(np.asarray(s)[0])
    elif stage == "pack":

        def body(khi_l, klo_l, valid_l):
            sid2 = jnp.arange(2 * rows, dtype=jnp.int32)
            gid = (2 * (sid2 >> 1) + (sid2 & 1)).astype(jnp.uint32)
            kh, kl, pay, act = part_dbg._boundary_records(
                khi_l, klo_l, valid_l, k=K, rows=rows, gid=gid
            )
            sent = jnp.uint32(0xFFFFFFFF)
            owner = part_dbg._key_owner(kh, kl, n_shards)
            blocks, _, ovf = part_dbg._pack_by_owner(
                owner, act, (kh, kl, pay), (sent, sent, sent),
                n_shards, cap_rec,
            )
            s = sum(jnp.sum(b.astype(jnp.uint64)) for b in blocks)
            return s[None], ovf[None]

        s, ovf = smap(body, 2)(khi, klo, valid)
        chk = int(np.asarray(s)[0]) + int(np.sum(np.asarray(ovf)))
    elif stage == "pairs":

        def body(khi_l, klo_l, valid_l):
            sid2 = jnp.arange(2 * rows, dtype=jnp.int32)
            gid = (2 * (sid2 >> 1) + (sid2 & 1)).astype(jnp.uint32)
            kh, kl, pay, act = part_dbg._boundary_records(
                khi_l, klo_l, valid_l, k=K, rows=rows, gid=gid
            )
            sent = jnp.uint32(0xFFFFFFFF)
            owner = part_dbg._key_owner(kh, kl, n_shards)
            blocks, _, ovf = part_dbg._pack_by_owner(
                owner, act, (kh, kl, pay), (sent, sent, sent),
                n_shards, cap_rec,
            )
            r_khi = part_dbg._xchg(blocks[0], n_shards).reshape(-1)
            r_klo = part_dbg._xchg(blocks[1], n_shards).reshape(-1)
            r_pay = part_dbg._xchg(blocks[2], n_shards).reshape(-1)
            edge, state_s, target = part_dbg._pair_edges(r_khi, r_klo, r_pay)
            s = (jnp.sum(edge.astype(jnp.int64))
                 + jnp.sum(jnp.abs(state_s).astype(jnp.int64))
                 + jnp.sum(jnp.abs(target).astype(jnp.int64)))
            return s[None], ovf[None]

        s, ovf = smap(body, 2)(khi, klo, valid)
        chk = int(np.asarray(s)[0]) + int(np.sum(np.asarray(ovf)))
    else:
        raise SystemExit(f"unknown stage {stage}")

    emit(wall_s=round(time.perf_counter() - t0, 3), gen_s=round(gen_s, 3),
         checksum=chk, cap_rec=cap_rec, cap_edge=cap_edge)
    return 0


if __name__ == "__main__":
    sys.exit(main())
