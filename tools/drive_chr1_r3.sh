#!/bin/bash
# Round-3 chr1 rehearsal driver (BASELINE config-5 memory plan on one chip).
#
# 1. waits for the axon relay to recover (tiny probe op under timeout;
#    NOTES.md: the relay wedges for tens of minutes after killed runs),
# 2. validates the NEW range-partitioned out-of-core extraction at ecoli
#    scale against the known distinct count (4,599,969),
# 3. runs the full chr1 (250 Mbp x 30x) end-to-end rehearsal: out-of-core
#    count (checkpointed) -> host-parked links -> low-mem bulk jump.
#
# All stdout is JSONL from run_scale; this script only logs phase markers.
set -u
cd /root/repo
log=runs/chr1_r3_driver.log
mark() { echo "$(date -u +%FT%TZ) $*" >> "$log"; }

mark "driver start (pid $$)"
while true; do
  if timeout 180 python -c 'import jax, jax.numpy as jnp; print(int(jnp.sum(jnp.arange(1024))))' >/dev/null 2>&1; then
    mark "relay alive"
    break
  fi
  mark "relay wedged; sleeping 300"
  sleep 300
done

mark "ecoli ooc range validation start"
timeout 3600 python tools/run_scale.py --preset ecoli --partitions 8 --count-only \
  > runs/ecoli_ooc_range_r3.jsonl 2> runs/ecoli_ooc_range_r3.err
rc=$?
mark "ecoli rc=$rc"
if ! grep -q '"distinct": 4599969' runs/ecoli_ooc_range_r3.jsonl; then
  mark "ecoli validation FAILED (no matching distinct count); aborting"
  exit 1
fi
mark "ecoli validation OK"

mark "chr1 end-to-end start"
timeout 21600 python tools/run_scale.py --preset chr1 --park-keys --park-links \
  --tpu-ext-limit 600000000 --jump-checkpoint-every 16 \
  --checkpoint-dir ckpt/chr1_range \
  > runs/chr1_range_r3.jsonl 2> runs/chr1_range_r3.err
mark "chr1 rc=$?"
