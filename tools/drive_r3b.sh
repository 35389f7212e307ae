#!/bin/bash
# Round-3b TPU queue (fresh VM: XLA cache cold, previous checkpoints gone).
# Strictly serialized -- never two TPU-touching processes (CLAUDE.md).
#
#  1. relay probe (NOTES.md: the relay wedges after killed runs)
#  2. chr1 (250 Mbp x 30x) end-to-end rehearsal, checkpointed -- the
#     previous attempt died at the link-cap assert, now self-healing
#     (ops/dbg._reextract_partition3)
#  3. bench.py -- warms the persistent XLA cache for the round driver's
#     official run and sanity-checks the headline JSON
#  4. presorted-runs count experiment (VERDICT item 2)
#  5. Pallas on-chip correctness artifact (VERDICT weak #5)
#  6. humanchr (3 Gbp) count fraction: one ~55 min window saves the first
#     partition group; a second window must extend the checkpoint set in
#     less time than a cold run could (resume proof at config-5 scale)
#  7. celegans materialize timing (VERDICT item 7), if wall clock remains
set -u
cd /root/repo
log=runs/r3b_driver.log
mark() { echo "$(date -u +%FT%TZ) $*" >> "$log"; }

mark "r3b driver start (pid $$)"
while true; do
  if timeout 180 python -c 'import jax, jax.numpy as jnp; print(int(jnp.sum(jnp.arange(1024))))' >/dev/null 2>&1; then
    mark "relay alive"
    break
  fi
  mark "relay wedged; sleeping 120"
  sleep 120
done

mark "chr1 end-to-end start"
timeout 16200 python tools/run_scale.py --preset chr1 --park-keys --park-links \
  --tpu-ext-limit 600000000 --jump-checkpoint-every 0 \
  --checkpoint-dir ckpt/chr1_range \
  > runs/chr1_r3b.jsonl 2> runs/chr1_r3b.err
mark "chr1 rc=$?"

mark "bench start"
timeout 3600 python bench.py > runs/bench_r3b.json 2> runs/bench_r3b.err
mark "bench rc=$?"

mark "presorted experiment start"
timeout 3600 python tools/bench_presorted.py --records 50e6 \
  --genome 4.6e6 --chunk 2097152 \
  > runs/presorted_r3.jsonl 2> runs/presorted_r3.err
mark "presorted rc=$?"

mark "pallas on-chip artifact start"
timeout 3600 python tools/check_pallas_onchip.py --out runs/pallas_onchip_r3.jsonl \
  > /dev/null 2> runs/pallas_onchip_r3.err
mark "pallas rc=$?"

mark "humanchr count fraction window1 (3300 s)"
timeout 3300 python tools/run_scale.py --preset humanchr --count-only \
  --park-keys --checkpoint-dir ckpt/humanchr \
  > runs/humanchr_frac1_r3.jsonl 2> runs/humanchr_frac1_r3.err
mark "humanchr window1 rc=$? (124 = timeout-kill, expected)"
n1=$(ls ckpt/humanchr/part_*.npz 2>/dev/null | wc -l)
mark "humanchr parts after window1: $n1"
timeout 2700 python tools/run_scale.py --preset humanchr --count-only \
  --park-keys --checkpoint-dir ckpt/humanchr \
  > runs/humanchr_frac2_r3.jsonl 2> runs/humanchr_frac2_r3.err
mark "humanchr window2 rc=$? (124 expected)"
n2=$(ls ckpt/humanchr/part_*.npz 2>/dev/null | wc -l)
mark "humanchr parts after window2: $n2 (resume proof: n2 > n1 within a shorter window)"

mark "celegans materialize start"
timeout 7200 python tools/run_scale.py --preset celegans --materialize \
  --tpu-ext-limit 600000000 --jump-checkpoint-every 0 \
  --checkpoint-dir ckpt/celegans_range \
  > runs/celegans_mat_r3.jsonl 2> runs/celegans_mat_r3.err
mark "celegans rc=$?"
mark "r3b queue done"
