#!/bin/bash
# Round-4 TPU queue, slot I (fresh VM; ckpt/ and the XLA cache were wiped
# by the restart, so everything below is COLD -- compiles included):
#   1. chr1 end-to-end WITH materialize (VERDICT item 1, attempt 3):
#      the graph_stats AOT fix (bec8c2a) and the donated walk sort +
#      bucketed-host fallback (b90675d) are in the tree; this is the
#      first run where the whole tail can execute.  Cold count ~2,000 s
#      + cold compiles, links ~650 s, jump ~110 s, materialize.
#   2. ecoli --super --scan-chunk 1 (VERDICT item 3 retry; the 16-wide
#      fused super scan never came back from its remote compile in r4c).
#   3. ecoli --ext-mode part/wide probes (bisect the mid 64M-state
#      one-device kernel fault: size-triggered vs path-triggered).
#   4. humanchr plain-range windows (VERDICT item 2): each counts one
#      G=7 partition group over the full batch stream and banks it.
set -u
cd /root/repo
log=runs/r4i_driver.log
mark() { echo "$(date -u +%FT%TZ) $*" >> "$log"; }

mark "r4i driver start (pid $$)"

mark "chr1 end-to-end + materialize start (cold: no ckpt, empty XLA cache)"
timeout 9000 python tools/run_scale.py --preset chr1 --park-keys --park-links \
  --tpu-ext-limit 600000000 --jump-checkpoint-every 0 \
  --checkpoint-dir ckpt/chr1_r4 --materialize \
  > runs/chr1_r4i.jsonl 2> runs/chr1_r4i.err
mark "chr1 rc=$?"

mark "ecoli super scan_chunk=1"
timeout 1800 python tools/run_scale.py --preset ecoli --count-only \
  --partitions 8 --super --scan-chunk 1 --checkpoint-dir ckpt/ecoli_super_r4i \
  > runs/ecoli_super_r4i.jsonl 2> runs/ecoli_super_r4i.err
mark "ecoli super rc=$?"

for mode in part wide; do
  timeout 1500 python tools/run_scale.py --preset ecoli --ext-mode $mode \
    --tpu-ext-limit 600000000 --jump-checkpoint-every 0 \
    --checkpoint-dir ckpt/ecoli_ext_r4i \
    > runs/ecoli_${mode}_r4i.jsonl 2> runs/ecoli_${mode}_r4i.err
  mark "ecoli $mode rc=$?"
done

mark "humanchr window1 (plain range, --part-range 0:7)"
timeout 3600 python tools/run_scale.py --preset humanchr --count-only \
  --park-keys --part-range 0:7 --checkpoint-dir ckpt/humanchr_r4i \
  > runs/humanchr_w1_r4i.jsonl 2> runs/humanchr_w1_r4i.err
mark "humanchr window1 rc=$?"
n1=$(ls ckpt/humanchr_r4i/part_*.npz 2>/dev/null | wc -l)
mark "humanchr parts after window1: $n1"

mark "humanchr window2 (--part-range 7:14, warm cache)"
timeout 3600 python tools/run_scale.py --preset humanchr --count-only \
  --park-keys --part-range 7:14 --checkpoint-dir ckpt/humanchr_r4i \
  > runs/humanchr_w2_r4i.jsonl 2> runs/humanchr_w2_r4i.err
mark "humanchr window2 rc=$?"
n2=$(ls ckpt/humanchr_r4i/part_*.npz 2>/dev/null | wc -l)
mark "humanchr parts after window2: $n2 (resume proof if > $n1 > 0)"
mark "r4i queue done"
