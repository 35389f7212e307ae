#!/bin/bash
# Round-4 TPU queue, combined + serialized (the r4a/r4b drivers from the
# previous session were killed by a VM restart; this VM has NO surviving
# checkpoints or XLA cache, so chr1 goes cold again).  One script, one
# TPU process at a time (CLAUDE.md rule).
#
# Order = VERDICT round-3 priority:
#   1. chr1 end-to-end cold -> materialized unitigs (item 1)
#   2. humanchr fraction windows w1+w2: virtual genome + scan-fused
#      dispatch + --super; done = parts(w2) > parts(w1) > 0 (item 2)
#   3. ecoli ooc: plain range vs --super pass/wall comparison (item 3)
#   4. mid preset (64M states): bulk vs part vs wide extension (item 4)
#   5. bench.py to warm the persistent cache for the round driver
set -u
cd /root/repo
log=runs/r4c_driver.log
mark() { echo "$(date -u +%FT%TZ) $*" >> "$log"; }

mark "r4c driver start (pid $$)"

while true; do
  if timeout 900 python -c 'import jax, jax.numpy as jnp; print(int(jnp.sum(jnp.arange(1024))))' >/dev/null 2>&1; then
    mark "relay alive"
    break
  fi
  mark "relay probe failed (wedge or cold compile); sleeping 120"
  sleep 120
done

# ---- 1. chr1 end-to-end (cold; banks count ckpts for any retry) ----
mark "chr1 end-to-end start (cold count ~1750 s + compiles)"
timeout 12000 python tools/run_scale.py --preset chr1 --park-keys --park-links \
  --tpu-ext-limit 600000000 --jump-checkpoint-every 0 \
  --checkpoint-dir ckpt/chr1_r4 --materialize \
  > runs/chr1_r4.jsonl 2> runs/chr1_r4.err
rc=$?
mark "chr1 rc=$rc"
if [ "$rc" -ne 0 ]; then
  mark "chr1 retry from checkpoints"
  timeout 9000 python tools/run_scale.py --preset chr1 --park-keys --park-links \
    --tpu-ext-limit 600000000 --jump-checkpoint-every 0 \
    --checkpoint-dir ckpt/chr1_r4 --materialize \
    > runs/chr1_r4_retry.jsonl 2> runs/chr1_r4_retry.err
  mark "chr1 retry rc=$?"
fi

# ---- 2. humanchr fraction windows (config 5 count evidence) ----
mark "humanchr window1 (virtual genome + scan_chunk 16 + super)"
timeout 3300 python tools/run_scale.py --preset humanchr --count-only \
  --park-keys --super --group-budget-gb 5 --checkpoint-dir ckpt/humanchr_r4 \
  > runs/humanchr_w1_r4.jsonl 2> runs/humanchr_w1_r4.err
mark "humanchr window1 rc=$? (124 expected)"
n1=$(ls ckpt/humanchr_r4/part_*.npz 2>/dev/null | wc -l)
mark "humanchr parts after window1: $n1"

mark "humanchr window2 (resume)"
timeout 3000 python tools/run_scale.py --preset humanchr --count-only \
  --park-keys --super --group-budget-gb 5 --checkpoint-dir ckpt/humanchr_r4 \
  > runs/humanchr_w2_r4.jsonl 2> runs/humanchr_w2_r4.err
mark "humanchr window2 rc=$? (124 expected)"
n2=$(ls ckpt/humanchr_r4/part_*.npz 2>/dev/null | wc -l)
mark "humanchr parts after window2: $n2 (resume proof if > $n1 > 0)"

# ---- 3. ecoli range vs super ----
mark "ecoli ooc range vs super"
timeout 1500 python tools/run_scale.py --preset ecoli --count-only \
  --partitions 8 --checkpoint-dir ckpt/ecoli_range_r4 \
  > runs/ecoli_range_r4.jsonl 2> runs/ecoli_range_r4.err
mark "ecoli range rc=$?"
timeout 1500 python tools/run_scale.py --preset ecoli --count-only \
  --partitions 8 --super --checkpoint-dir ckpt/ecoli_super_r4 \
  > runs/ecoli_super_r4.jsonl 2> runs/ecoli_super_r4.err
mark "ecoli super rc=$?"

# ---- 4. mid preset: bulk vs part vs wide extension ----
mark "mid preset: bulk vs part vs wide extension"
timeout 2400 python tools/run_scale.py --preset mid --tpu-ext-limit 600000000 --jump-checkpoint-every 0 \
  --checkpoint-dir ckpt/mid_r4 \
  > runs/mid_bulk_r4.jsonl 2> runs/mid_bulk_r4.err
mark "mid bulk rc=$?"
timeout 3000 python tools/run_scale.py --preset mid --tpu-ext-limit 600000000 --jump-checkpoint-every 0 \
  --checkpoint-dir ckpt/mid_r4 --ext-mode part \
  > runs/mid_part_r4.jsonl 2> runs/mid_part_r4.err
mark "mid part rc=$?"
timeout 3000 python tools/run_scale.py --preset mid --tpu-ext-limit 600000000 --jump-checkpoint-every 0 \
  --checkpoint-dir ckpt/mid_r4 --ext-mode wide \
  > runs/mid_wide_r4.jsonl 2> runs/mid_wide_r4.err
mark "mid wide rc=$?"

# ---- 5. bench (warms the persistent cache for the round driver) ----
mark "bench confirm"
timeout 2400 python bench.py > runs/bench_r4c.json 2> runs/bench_r4c.err
mark "bench rc=$?"
mark "r4c queue done"
