#!/bin/bash
# Round-4 TPU queue, slot F: ecoli --super retry with scan_chunk=1.
#
# The r4c ecoli super run spent its whole 25-min timeout in remote
# compiles without one count event -- the 16-wide fused super scan is
# the suspect program (NOTES.md: big programs cost many minutes on the
# relay, and the humanchr OOM kills just before it may have wedged the
# compile queue).  ecoli has only 18 batches, so scan_chunk=1 costs ~7 s
# of dispatch and compiles four small programs instead.
set -u
cd /root/repo
log=runs/r4f_driver.log
mark() { echo "$(date -u +%FT%TZ) $*" >> "$log"; }

mark "r4f driver start (pid $$)"
while ! grep -q "r4e queue done" runs/r4e_driver.log 2>/dev/null; do
  sleep 60
done
mark "r4e queue drained"

timeout 1800 python tools/run_scale.py --preset ecoli --count-only \
  --partitions 8 --super --scan-chunk 1 --checkpoint-dir ckpt/ecoli_super_r4f \
  > runs/ecoli_super_r4f.jsonl 2> runs/ecoli_super_r4f.err
mark "ecoli super (scan_chunk 1) rc=$?"
mark "r4f queue done"
