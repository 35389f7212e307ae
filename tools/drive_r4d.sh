#!/bin/bash
# Round-4 TPU queue, slot D: the chr1 MATERIALIZED finish.
#
# r4c banked chr1's extension/total events twice but both materialize
# attempts died at the same AOT-compiler OOM -- root-caused and fixed in
# commit bec8c2a (the [N,2] pred broadcast tile-padded 2->128 into a
# 32 GB allocation; _materialize_prep_sort now uses a flat gather).
# This run waits for the r4c queue to drain (one TPU process at a time),
# then reruns chr1 from its count checkpoints: resume ~90 s, links
# ~600 s, jump ~100 s, stats + MATERIALIZE with the fixed kernel.
set -u
cd /root/repo
log=runs/r4d_driver.log
mark() { echo "$(date -u +%FT%TZ) $*" >> "$log"; }

mark "r4d driver start (pid $$)"
while ! grep -q "r4c queue done" runs/r4c_driver.log 2>/dev/null; do
  sleep 60
done
mark "r4c queue drained"

timeout 7200 python tools/run_scale.py --preset chr1 --park-keys --park-links \
  --tpu-ext-limit 600000000 --jump-checkpoint-every 0 \
  --checkpoint-dir ckpt/chr1_r4 --materialize \
  > runs/chr1_r4d.jsonl 2> runs/chr1_r4d.err
mark "chr1 materialize run rc=$?"
mark "r4d queue done"
