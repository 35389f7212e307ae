#!/bin/bash
# Round-3d TPU queue: rerun the two r3c casualties after their fixes.
#   - chr1 end-to-end: died at ~1h45m on a transient relay compile 500
#     at the jump tail; run_scale now retries transient remote-compile
#     failures once (and resumes its count from ckpt/chr1_r3c).
#   - humanchr count fraction windows: randint maxval overflowed int32
#     at 3 Gbp; start sampling now takes the uint32 path.
# Waits for the r3c driver to drain first -- never two TPU processes.
set -u
cd /root/repo
log=runs/r3d_driver.log
mark() { echo "$(date -u +%FT%TZ) $*" >> "$log"; }

mark "r3d driver start (pid $$)"
while pgrep -x -f "bash tools/drive_r3c.sh" > /dev/null 2>&1; do
  sleep 60
done
mark "r3c queue drained"

while true; do
  if timeout 180 python -c 'import jax, jax.numpy as jnp; print(int(jnp.sum(jnp.arange(1024))))' >/dev/null 2>&1; then
    mark "relay alive"
    break
  fi
  mark "relay wedged; sleeping 120"
  sleep 120
done

mark "chr1 end-to-end start (transient-retry + count resume)"
timeout 14400 python tools/run_scale.py --preset chr1 --park-keys --park-links \
  --tpu-ext-limit 600000000 --jump-checkpoint-every 0 \
  --checkpoint-dir ckpt/chr1_r3c \
  > runs/chr1_r3d.jsonl 2> runs/chr1_r3d.err
mark "chr1 rc=$?"

mark "humanchr count fraction window1 (3300 s)"
timeout 3300 python tools/run_scale.py --preset humanchr --count-only \
  --park-keys --group-budget-gb 5 --checkpoint-dir ckpt/humanchr \
  > runs/humanchr_frac1_r3d.jsonl 2> runs/humanchr_frac1_r3d.err
mark "humanchr window1 rc=$? (124 = timeout-kill, expected)"
n1=$(ls ckpt/humanchr/part_*.npz 2>/dev/null | wc -l)
mark "humanchr parts after window1: $n1"
timeout 3000 python tools/run_scale.py --preset humanchr --count-only \
  --park-keys --group-budget-gb 5 --checkpoint-dir ckpt/humanchr \
  > runs/humanchr_frac2_r3d.jsonl 2> runs/humanchr_frac2_r3d.err
mark "humanchr window2 rc=$? (124 expected)"
n2=$(ls ckpt/humanchr/part_*.npz 2>/dev/null | wc -l)
mark "humanchr parts after window2: $n2 (resume proof: n2 > n1 within a shorter window)"

mark "r3d queue done"
