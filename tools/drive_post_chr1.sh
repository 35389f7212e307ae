#!/bin/bash
# Round-3 TPU queue after the chr1 rehearsal: runs strictly serially
# (never two TPU processes -- CLAUDE.md).
#
#  1. celegans end-to-end WITH device materialization (thin-readback
#     materializer validation at scale: VERDICT item 7's done-criterion
#     is < ~100 s with identical output; identity is covered by the
#     differential suite, the timing by this run).
#  2. humanchr --count-only FRACTION: checkpointed, killed after
#     GA_FRACTION_S seconds, resumed for a second window -- measures
#     per-pass cost + proves resume at the 3 Gbp configuration
#     (SCALE.md section 5's projection inputs).
#  3. presorted-runs experiment (VERDICT item 2) at 50M records.
#  4. bench.py (the driver's entry; confirms the headline numbers).
set -u
cd /root/repo
log=runs/post_chr1_driver.log
mark() { echo "$(date -u +%FT%TZ) $*" >> "$log"; }

mark "post-chr1 queue start (pid $$)"

mark "celegans materialize start"
timeout 7200 python tools/run_scale.py --preset celegans --materialize \
  --tpu-ext-limit 600000000 --jump-checkpoint-every 0 \
  --checkpoint-dir ckpt/celegans_range \
  > runs/celegans_mat_r3.jsonl 2> runs/celegans_mat_r3.err
mark "celegans rc=$?"

frac="${GA_FRACTION_S:-1800}"
mark "humanchr count fraction start (window ${frac}s)"
timeout "$frac" python tools/run_scale.py --preset humanchr --count-only \
  --park-keys --checkpoint-dir ckpt/humanchr \
  > runs/humanchr_frac1_r3.jsonl 2> runs/humanchr_frac1_r3.err
mark "humanchr window1 rc=$? (124 = timeout-kill, expected)"
timeout "$frac" python tools/run_scale.py --preset humanchr --count-only \
  --park-keys --checkpoint-dir ckpt/humanchr \
  > runs/humanchr_frac2_r3.jsonl 2> runs/humanchr_frac2_r3.err
mark "humanchr window2 rc=$? (resume proof; 124 expected)"
ls ckpt/humanchr/part_*.npz 2>/dev/null | wc -l >> "$log"

mark "presorted experiment start"
timeout 3600 python tools/bench_presorted.py --records 50e6 \
  --genome 4.6e6 --chunk 2097152 \
  > runs/presorted_r3.jsonl 2> runs/presorted_r3.err
mark "presorted rc=$?"

mark "pallas on-chip artifact start"
timeout 3600 python tools/check_pallas_onchip.py --out runs/pallas_onchip_r3.jsonl \
  > /dev/null 2> runs/pallas_onchip_r3.err
mark "pallas rc=$?"

mark "bench.py start"
timeout 2400 python bench.py > runs/bench_r3_check.json 2> runs/bench_r3_check.err
mark "bench rc=$?"
mark "post-chr1 queue done"
