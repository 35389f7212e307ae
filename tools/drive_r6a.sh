#!/bin/bash
# Next-session TPU queue — written at the end of round 5.
#
# Round-5 state: distributed extension COMPLETE on silicon (mid part
# 48 s / wide, runs/mid_*_r5*.jsonl), super counting proven (ecoli +
# chr1 4-pass), bench extension 6.57M fixed / 17.2M micro, humanchr
# banking runs ragged super windows into ckpt/humanchr_super_r5.
#
#   1. One humanchr super window with the SIMILAR-LOAD-PACKED planner
#      (commit d29865f, chip-unproven): compare partitions/hour against
#      the measured ragged rate (8 parts / ~11 min pass).
#   2. Keep banking windows until the count completes (~45 packed
#      passes total, SCALE.md §2).
#   3. Optional: mid wide warm re-measure with the strand-major join
#      (only the part mode was re-measured warm).
set -u
cd /root/repo
log=runs/r6a_driver.log
mark() { echo "$(date -u +%FT%TZ) $*" >> "$log"; }
probe() {
  for i in $(seq 1 40); do
    timeout 150 python -c "
import jax, jax.numpy as jnp
print(float(jnp.arange(1024.0).sum()))" >/dev/null 2>&1 && { mark "relay alive ($i)"; return 0; }
    sleep 45
  done
  mark "relay dead"; return 1
}

mark "r6a driver start (pid $$)"
probe || exit 1

for w in 1 2 3 4 5 6; do
  timeout 5400 python tools/run_scale.py --preset humanchr --count-only \
    --park-keys --super --part-range 0:1247 \
    --checkpoint-dir ckpt/humanchr_super_r5 \
    > runs/humanchr_super_r6_w$w.jsonl 2> runs/humanchr_super_r6_w$w.err
  mark "humanchr super window $w rc=$?"
  mark "parts banked: $(ls ckpt/humanchr_super_r5/part_*.npz 2>/dev/null | wc -l) / 1247"
  probe || exit 1
done

timeout 1500 python tools/run_scale.py --preset mid --ext-mode wide \
  --tpu-ext-limit 600000000 --jump-checkpoint-every 0 \
  --checkpoint-dir ckpt/mid_ext_r5 \
  > runs/mid_wide_r6.jsonl 2> runs/mid_wide_r6.err
mark "mid wide warm rc=$?"
mark "r6a queue done"
