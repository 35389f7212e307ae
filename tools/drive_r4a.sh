#!/bin/bash
# Round-4 TPU queue, slot A: chr1 end-to-end COLD (fresh VM: round-3
# checkpoints and the XLA cache are gone).  The graph_stats AOT crash
# that killed r3c/r3d is fixed (fused jit + non-fatal fallback,
# commit 8b2d30b); this run banks count checkpoints into ckpt/chr1_r4
# so any death resumes cheaply, and materializes the unitigs
# (extension/total are emitted BEFORE materialize, so a late
# materialize fault cannot lose the headline events).
set -u
cd /root/repo
log=runs/r4a_driver.log
mark() { echo "$(date -u +%FT%TZ) $*" >> "$log"; }

mark "r4a driver start (pid $$)"

while true; do
  if timeout 900 python -c 'import jax, jax.numpy as jnp; print(int(jnp.sum(jnp.arange(1024))))' >/dev/null 2>&1; then
    mark "relay alive"
    break
  fi
  mark "relay probe failed (wedge or cold compile); sleeping 120"
  sleep 120
done

mark "chr1 end-to-end start (cold count ~5150 s + compiles)"
timeout 16200 python tools/run_scale.py --preset chr1 --park-keys --park-links \
  --tpu-ext-limit 600000000 --jump-checkpoint-every 0 \
  --checkpoint-dir ckpt/chr1_r4 --materialize \
  > runs/chr1_r4.jsonl 2> runs/chr1_r4.err
rc=$?
mark "chr1 rc=$rc"
if [ "$rc" -ne 0 ]; then
  mark "chr1 retry from checkpoints"
  timeout 10800 python tools/run_scale.py --preset chr1 --park-keys --park-links \
    --tpu-ext-limit 600000000 --jump-checkpoint-every 0 \
    --checkpoint-dir ckpt/chr1_r4 --materialize \
    > runs/chr1_r4_retry.jsonl 2> runs/chr1_r4_retry.err
  mark "chr1 retry rc=$?"
fi
mark "r4a queue done"
