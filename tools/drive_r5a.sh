#!/bin/bash
# Round-5 TPU queue, slot A — written at the end of round 4 session 8.
# Assume ckpt/ and the XLA cache are wiped again (the VM restarts
# between sessions).  Serialized; never run two TPU processes at once.
#
#   1. mid --ext-mode part, then wide: the 64M-state physical runs the
#      singleton-axis all_to_all bypass (part_dbg._xchg) was built for —
#      VERDICT r3 item 4's wide-at-scale evidence.  Both crashed the TPU
#      worker pre-bypass (runs/mid_part_r4.jsonl).
#   2. ecoli --super: first chip attempt since the fori_loop pack fix
#      (the 55-ary fused OR tree never returned from remote compile in
#      three runs).  Compare passes/wall to runs/ecoli_range_r4.jsonl.
#   3. chr1 --super --count-only: if 2 works, the pass-count lever at
#      the scale SCALE.md §2 prices (plain: 8 passes / 1,795.8 s cold).
#   4. humanchr plain-range windows 7:14 and 14:21 (window 0:7 banked in
#      round 4 session 8 — see runs/humanchr_w1_r4j.jsonl).
set -u
cd /root/repo
log=runs/r5a_driver.log
mark() { echo "$(date -u +%FT%TZ) $*" >> "$log"; }

mark "r5a driver start (pid $$)"
for i in $(seq 1 40); do
  if timeout 120 python -c "
import jax, jax.numpy as jnp
print(float(jnp.arange(1024.0).sum()))" >/dev/null 2>&1; then
    mark "relay alive (probe $i)"; break
  fi
  sleep 30
done

for mode in part wide; do
  timeout 2400 python tools/run_scale.py --preset mid --ext-mode $mode \
    --tpu-ext-limit 600000000 --jump-checkpoint-every 0 \
    --checkpoint-dir ckpt/mid_ext_r5 \
    > runs/mid_${mode}_r5a.jsonl 2> runs/mid_${mode}_r5a.err
  mark "mid $mode rc=$?"
done

timeout 1800 python tools/run_scale.py --preset ecoli --count-only \
  --partitions 8 --super --checkpoint-dir ckpt/ecoli_super_r5 \
  > runs/ecoli_super_r5a.jsonl 2> runs/ecoli_super_r5a.err
mark "ecoli super rc=$?"

if grep -q scan_and_count runs/ecoli_super_r5a.jsonl 2>/dev/null; then
  timeout 5400 python tools/run_scale.py --preset chr1 --count-only \
    --park-keys --super --checkpoint-dir ckpt/chr1_super_r5 \
    > runs/chr1_super_r5a.jsonl 2> runs/chr1_super_r5a.err
  mark "chr1 super rc=$?"
else
  mark "ecoli super produced no count event; skipping chr1 super"
fi

for rng in 7:14 14:21; do
  timeout 4500 python tools/run_scale.py --preset humanchr --count-only \
    --park-keys --part-range $rng --checkpoint-dir ckpt/humanchr_r5 \
    > runs/humanchr_w${rng%%:*}_r5a.jsonl 2> runs/humanchr_w${rng%%:*}_r5a.err
  mark "humanchr window $rng rc=$?"
  mark "humanchr parts banked: $(ls ckpt/humanchr_r5/part_*.npz 2>/dev/null | wc -l)"
done
mark "r5a queue done"
