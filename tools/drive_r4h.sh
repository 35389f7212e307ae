#!/bin/bash
# Round-4 TPU queue, slot H (consolidated tail; replaces the killed
# r4f/r4g pollers whose grep markers were poisoned by a poller race):
#   1. chr1 materialize, attempt 3: donate=True walk sort (4.5 GB of
#      sort headroom) + bucketed-host fallback on device OOM.
#   2. ecoli --super --scan-chunk 1 (the compile-sized retry).
#   3. ecoli --ext-mode part/wide probes (bisect the mid kernel fault).
# Waits on the r4e POLLER PID (passed as $1) -- not a log marker.
set -u
cd /root/repo
log=runs/r4h_driver.log
mark() { echo "$(date -u +%FT%TZ) $*" >> "$log"; }

mark "r4h driver start (pid $$, waiting on r4e pid $1)"
while kill -0 "$1" 2>/dev/null; do
  sleep 60
done
mark "r4e poller exited"

mark "chr1 materialize attempt 3 (donated walk sort + host fallback)"
timeout 7200 python tools/run_scale.py --preset chr1 --park-keys --park-links \
  --tpu-ext-limit 600000000 --jump-checkpoint-every 0 \
  --checkpoint-dir ckpt/chr1_r4 --materialize \
  > runs/chr1_r4h.jsonl 2> runs/chr1_r4h.err
mark "chr1 rc=$?"

mark "ecoli super scan_chunk=1"
timeout 1800 python tools/run_scale.py --preset ecoli --count-only \
  --partitions 8 --super --scan-chunk 1 --checkpoint-dir ckpt/ecoli_super_r4f \
  > runs/ecoli_super_r4f.jsonl 2> runs/ecoli_super_r4f.err
mark "ecoli super rc=$?"

for mode in part wide; do
  timeout 1500 python tools/run_scale.py --preset ecoli --ext-mode $mode \
    --tpu-ext-limit 600000000 --jump-checkpoint-every 0 \
    --checkpoint-dir ckpt/ecoli_ext_r4g \
    > runs/ecoli_${mode}_r4g.jsonl 2> runs/ecoli_${mode}_r4g.err
  mark "ecoli $mode rc=$?"
done
mark "r4h queue done"
