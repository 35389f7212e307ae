#!/bin/bash
# Round-3c TPU queue: rerun chr1 with the independent link-hash constants
# (the banding that overflowed the staging caps is fixed at the source;
# the self-heal retry is now memory-bounded), then the 3 Gbp fraction
# windows and the celegans materialize timing.  Strictly serialized.
set -u
cd /root/repo
log=runs/r3c_driver.log
mark() { echo "$(date -u +%FT%TZ) $*" >> "$log"; }

mark "r3c driver start (pid $$)"
while true; do
  if timeout 180 python -c 'import jax, jax.numpy as jnp; print(int(jnp.sum(jnp.arange(1024))))' >/dev/null 2>&1; then
    mark "relay alive"
    break
  fi
  mark "relay wedged; sleeping 120"
  sleep 120
done

mark "chr1 end-to-end start (fixed link hash)"
timeout 14400 python tools/run_scale.py --preset chr1 --park-keys --park-links \
  --tpu-ext-limit 600000000 --jump-checkpoint-every 0 \
  --checkpoint-dir ckpt/chr1_r3c \
  > runs/chr1_r3c.jsonl 2> runs/chr1_r3c.err
mark "chr1 rc=$?"

mark "humanchr count fraction window1 (3300 s)"
timeout 3300 python tools/run_scale.py --preset humanchr --count-only \
  --park-keys --group-budget-gb 5 --checkpoint-dir ckpt/humanchr \
  > runs/humanchr_frac1_r3.jsonl 2> runs/humanchr_frac1_r3.err
mark "humanchr window1 rc=$? (124 = timeout-kill, expected)"
n1=$(ls ckpt/humanchr/part_*.npz 2>/dev/null | wc -l)
mark "humanchr parts after window1: $n1"
timeout 3000 python tools/run_scale.py --preset humanchr --count-only \
  --park-keys --group-budget-gb 5 --checkpoint-dir ckpt/humanchr \
  > runs/humanchr_frac2_r3.jsonl 2> runs/humanchr_frac2_r3.err
mark "humanchr window2 rc=$? (124 expected)"
n2=$(ls ckpt/humanchr/part_*.npz 2>/dev/null | wc -l)
mark "humanchr parts after window2: $n2 (resume proof: n2 > n1 within a shorter window)"

mark "presorted favorable-regime config start"
timeout 3600 python tools/bench_presorted.py --records 50e6 \
  --genome 1e6 --chunk 8388608 \
  > runs/presorted_fav_r3.jsonl 2> runs/presorted_fav_r3.err
mark "presorted favorable rc=$?"

mark "celegans materialize start"
timeout 7200 python tools/run_scale.py --preset celegans --materialize \
  --tpu-ext-limit 600000000 --jump-checkpoint-every 0 \
  --checkpoint-dir ckpt/celegans_r3c \
  > runs/celegans_mat_r3.jsonl 2> runs/celegans_mat_r3.err
mark "celegans rc=$?"

mark "final bench confirm"
timeout 2400 python bench.py > runs/bench_r3c.json 2> runs/bench_r3c.err
mark "bench rc=$?"
mark "r3c queue done"
