#!/bin/bash
# Round-4 TPU queue, slot E: humanchr fraction windows, attempt 2.
#
# The r4c windows died with RESOURCE_EXHAUSTED in the super partition
# count (raw-layout expansion multiplied sentinel slots by S_CAP=25 --
# fixed in d7c7b3e: compact-then-expand).  Serialized after r4d (chr1
# materialize).  Windows are shorter than r4c's so both fit before the
# session snapshot; group budget drops 5 -> 4 GB for staging headroom
# next to the ~5 GB expansion+count transient.
# Done = parts after window2 > parts after window1 > 0 (VERDICT item 2).
set -u
cd /root/repo
log=runs/r4e_driver.log
mark() { echo "$(date -u +%FT%TZ) $*" >> "$log"; }

mark "r4e driver start (pid $$)"
while ! grep -q "r4d queue done" runs/r4d_driver.log 2>/dev/null; do
  sleep 60
done
mark "r4d queue drained"

mark "humanchr window1 (compact-then-expand super, budget 4 GB)"
timeout 2700 python tools/run_scale.py --preset humanchr --count-only \
  --park-keys --super --group-budget-gb 4 --checkpoint-dir ckpt/humanchr_r4e \
  > runs/humanchr_w1_r4e.jsonl 2> runs/humanchr_w1_r4e.err
mark "humanchr window1 rc=$? (124 expected)"
n1=$(ls ckpt/humanchr_r4e/part_*.npz 2>/dev/null | wc -l)
mark "humanchr parts after window1: $n1"

mark "humanchr window2 (resume)"
timeout 2100 python tools/run_scale.py --preset humanchr --count-only \
  --park-keys --super --group-budget-gb 4 --checkpoint-dir ckpt/humanchr_r4e \
  > runs/humanchr_w2_r4e.jsonl 2> runs/humanchr_w2_r4e.err
mark "humanchr window2 rc=$? (124 expected)"
n2=$(ls ckpt/humanchr_r4e/part_*.npz 2>/dev/null | wc -l)
mark "humanchr parts after window2: $n2 (resume proof if > $n1 > 0)"
mark "r4e queue done"
