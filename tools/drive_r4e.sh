#!/bin/bash
# Round-4 TPU queue, slot E: humanchr fraction windows, attempt 2.
#
# r4c's windows died in the super partition count (RESOURCE_EXHAUSTED,
# fixed in d7c7b3e) -- and window math shows even a healthy full-run
# pass (~all 6,867 batches) barely fits one fraction window, banking
# partitions only at pass end.  So the windows now use VERDICT item 2's
# other lever: the PLAIN range scheme (the program chr1 just proved at
# 1,967 s for 8 passes) with --part-range, which counts whole partition
# GROUPS and exits -- each window completes 2-3 one-group passes and
# banks their partitions durably.  Ranges are multiples of G=7 (the
# default-budget group width) so no group straddles an ownership edge.
# Done = parts after window2 > parts after window1 > 0.
set -u
cd /root/repo
log=runs/r4e_driver.log
mark() { echo "$(date -u +%FT%TZ) $*" >> "$log"; }

mark "r4e driver start (pid $$)"
while ! grep -q "r4d queue done" runs/r4d_driver.log 2>/dev/null; do
  sleep 60
done
mark "r4d queue drained"

mark "humanchr window1 (plain range, --part-range 0:14)"
timeout 2700 python tools/run_scale.py --preset humanchr --count-only \
  --park-keys --part-range 0:14 --checkpoint-dir ckpt/humanchr_r4e \
  > runs/humanchr_w1_r4e.jsonl 2> runs/humanchr_w1_r4e.err
mark "humanchr window1 rc=$?"
n1=$(ls ckpt/humanchr_r4e/part_*.npz 2>/dev/null | wc -l)
mark "humanchr parts after window1: $n1"

mark "humanchr window2 (--part-range 14:28, warm cache)"
timeout 2100 python tools/run_scale.py --preset humanchr --count-only \
  --park-keys --part-range 14:28 --checkpoint-dir ckpt/humanchr_r4e \
  > runs/humanchr_w2_r4e.jsonl 2> runs/humanchr_w2_r4e.err
mark "humanchr window2 rc=$?"
n2=$(ls ckpt/humanchr_r4e/part_*.npz 2>/dev/null | wc -l)
mark "humanchr parts after window2: $n2 (resume proof if > $n1 > 0)"
mark "r4e queue done"
