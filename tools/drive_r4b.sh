#!/bin/bash
# Round-4 TPU queue, slot B (serialized after r4a / chr1):
#   1. humanchr fraction windows with the round-4 fixes: virtual genome
#      (no 1,570 s regeneration per window), scan-fused dispatch
#      (scan_chunk=16; passes were ~90% relay-dispatch overhead), and
#      the --super staging (3-4x fewer passes).  Done = parts after
#      window2 > parts after window1 > 0 (VERDICT r3 item 2).
#   2. ecoli out-of-core: --super vs plain range on the SAME preset --
#      the on-chip pass-count/wall comparison (VERDICT r3 item 3).
#   3. mid preset (64M states): bulk vs part vs wide extension walls on
#      the chip (VERDICT r3 item 4's wide-overhead measurement at the
#      largest single-chip-feasible scale; see the preset comment).
#   4. bench.py to re-warm the persistent cache for the driver.
set -u
cd /root/repo
log=runs/r4b_driver.log
mark() { echo "$(date -u +%FT%TZ) $*" >> "$log"; }

mark "r4b driver start (pid $$)"
while pgrep -x -f "bash tools/drive_r4a.sh" > /dev/null 2>&1; do
  sleep 60
done
mark "r4a queue drained"

while true; do
  if timeout 900 python -c 'import jax, jax.numpy as jnp; print(int(jnp.sum(jnp.arange(1024))))' >/dev/null 2>&1; then
    mark "relay alive"
    break
  fi
  mark "relay probe failed; sleeping 120"
  sleep 120
done

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

mark "ecoli ooc range vs super"
timeout 1800 python tools/run_scale.py --preset ecoli --count-only \
  --partitions 8 --checkpoint-dir ckpt/ecoli_range_r4 \
  > runs/ecoli_range_r4.jsonl 2> runs/ecoli_range_r4.err
mark "ecoli range rc=$?"
timeout 1800 python tools/run_scale.py --preset ecoli --count-only \
  --partitions 8 --super --checkpoint-dir ckpt/ecoli_super_r4 \
  > runs/ecoli_super_r4.jsonl 2> runs/ecoli_super_r4.err
mark "ecoli super rc=$?"

mark "mid preset: bulk vs part vs wide extension"
timeout 2400 python tools/run_scale.py --preset mid --tpu-ext-limit 600000000 --jump-checkpoint-every 0 \
  --checkpoint-dir ckpt/mid_r4 \
  > runs/mid_bulk_r4.jsonl 2> runs/mid_bulk_r4.err
mark "mid bulk rc=$?"
timeout 3600 python tools/run_scale.py --preset mid --tpu-ext-limit 600000000 --jump-checkpoint-every 0 \
  --checkpoint-dir ckpt/mid_r4 --ext-mode part \
  > runs/mid_part_r4.jsonl 2> runs/mid_part_r4.err
mark "mid part rc=$?"
timeout 3600 python tools/run_scale.py --preset mid --tpu-ext-limit 600000000 --jump-checkpoint-every 0 \
  --checkpoint-dir ckpt/mid_r4 --ext-mode wide \
  > runs/mid_wide_r4.jsonl 2> runs/mid_wide_r4.err
mark "mid wide rc=$?"

mark "bench confirm"
timeout 2400 python bench.py > runs/bench_r4b.json 2> runs/bench_r4b.err
mark "bench rc=$?"
mark "r4b queue done"
