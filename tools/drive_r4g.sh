#!/bin/bash
# Round-4 TPU queue, slot G: bisect the part/wide one-device kernel fault.
#
# mid (64M states) --ext-mode part AND wide both killed the TPU worker
# ("kernel fault") in the partitioned extension's one-device
# self-exchange.  Probe at ecoli scale (16.7M states, 4x smaller): if
# part/wide complete there, the fault is size-triggered (likely the
# single-program all_to_all staging); if they crash too, the 1-device
# collective path itself faults on this backend and the honest answer
# for NOTES is "the partitioned engine needs >= 2 real chips".
set -u
cd /root/repo
log=runs/r4g_driver.log
mark() { echo "$(date -u +%FT%TZ) $*" >> "$log"; }

mark "r4g driver start (pid $$)"
while ! grep -q "r4f queue done" runs/r4f_driver.log 2>/dev/null; do
  sleep 60
done
mark "r4f queue drained"

for mode in part wide; do
  timeout 1800 python tools/run_scale.py --preset ecoli --ext-mode $mode \
    --tpu-ext-limit 600000000 --jump-checkpoint-every 0 \
    --checkpoint-dir ckpt/ecoli_ext_r4g \
    > runs/ecoli_${mode}_r4g.jsonl 2> runs/ecoli_${mode}_r4g.err
  mark "ecoli $mode rc=$?"
done
mark "r4g queue done"
