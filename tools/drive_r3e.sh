#!/bin/bash
# Round-3e TPU queue: final chr1 end-to-end after the graph_stats fix
# (the relay's AOT helper deterministically crashes on one of the old
# EAGER stat ops; stats are now one fused jit with a non-fatal
# fallback).  Count resumes from ckpt/chr1_r3c (~87 s), links ~700 s,
# jump ~100 s.  Waits for the r3d driver to drain first.
set -u
cd /root/repo
log=runs/r3e_driver.log
mark() { echo "$(date -u +%FT%TZ) $*" >> "$log"; }

mark "r3e driver start (pid $$)"
while pgrep -x -f "bash tools/drive_r3d.sh" > /dev/null 2>&1; do
  sleep 60
done
mark "r3d queue drained"

while true; do
  if timeout 180 python -c 'import jax, jax.numpy as jnp; print(int(jnp.sum(jnp.arange(1024))))' >/dev/null 2>&1; then
    mark "relay alive"
    break
  fi
  mark "relay wedged; sleeping 120"
  sleep 120
done

mark "chr1 end-to-end start (fused graph_stats + non-fatal fallback)"
timeout 10800 python tools/run_scale.py --preset chr1 --park-keys --park-links \
  --tpu-ext-limit 600000000 --jump-checkpoint-every 0 \
  --checkpoint-dir ckpt/chr1_r3c \
  > runs/chr1_r3e.jsonl 2> runs/chr1_r3e.err
mark "chr1 rc=$?"

n=$(ls ckpt/humanchr/part_*.npz 2>/dev/null | wc -l)
if [ "$n" -lt 3 ]; then
  mark "humanchr windows got $n parts in r3d (relay wedge); rerunning"
  timeout 3300 python tools/run_scale.py --preset humanchr --count-only \
    --park-keys --group-budget-gb 5 --checkpoint-dir ckpt/humanchr \
    > runs/humanchr_frac1_r3e.jsonl 2> runs/humanchr_frac1_r3e.err
  mark "humanchr window1 rc=$? (124 expected)"
  n1=$(ls ckpt/humanchr/part_*.npz 2>/dev/null | wc -l)
  mark "humanchr parts after window1: $n1"
  timeout 3000 python tools/run_scale.py --preset humanchr --count-only \
    --park-keys --group-budget-gb 5 --checkpoint-dir ckpt/humanchr \
    > runs/humanchr_frac2_r3e.jsonl 2> runs/humanchr_frac2_r3e.err
  mark "humanchr window2 rc=$? (124 expected)"
  n2=$(ls ckpt/humanchr/part_*.npz 2>/dev/null | wc -l)
  mark "humanchr parts after window2: $n2 (resume proof if > window1)"
fi

mark "final bench confirm"
timeout 2400 python bench.py > runs/bench_r3e.json 2> runs/bench_r3e.err
mark "bench rc=$?"
mark "r3e queue done"
