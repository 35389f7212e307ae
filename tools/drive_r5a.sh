#!/bin/bash
# Round-5 TPU queue, slot A — REORDERED per VERDICT r4 item 7.
#
# The round-4 post-snapshot runs FALSIFIED the singleton-all_to_all-bypass
# hypothesis: mid --ext-mode part AND wide both still crash the TPU worker
# at 64M states (runs/mid_part_r4k.jsonl, mid_wide_r4k.jsonl — crash at the
# first links hard sync).  So step 1 is now the on-chip BISECT of the
# links-join program (tools/bisect_mid_ext.py), not a rerun of the full
# mid preset.  Serialized; never run two TPU processes at once; probe the
# relay before every long step (a TPU worker crash wedges it for minutes).
#
#   1. bisect: join @8M (control), join @32M (repro), then stages
#      boundary/pack/pairs @32M if the join crashes — the faulting
#      primitive falls out of which stage's process dies.
#   2. ecoli --super: first chip attempt since the fori_loop pack fix;
#      virtual genome is now DEFAULT for chip runs so a slow relay window
#      cannot eat the attempt again (VERDICT item 6).
#   3. chr1 --super --count-only if 2 works (fresh ckpt dir — the super
#      scheme has its own fingerprint).
#   4. humanchr plain-range windows: bank INTO ckpt/humanchr_r4 (it
#      SURVIVED — the VM did not restart; 14 partitions already banked).
set -u
cd /root/repo
log=runs/r5a_driver.log
mark() { echo "$(date -u +%FT%TZ) $*" >> "$log"; }

probe() {
  for i in $(seq 1 40); do
    if timeout 150 python -c "
import jax, jax.numpy as jnp
print(float(jnp.arange(1024.0).sum()))" >/dev/null 2>&1; then
      mark "relay alive (probe $i)"; return 0
    fi
    sleep 45
  done
  mark "relay dead after 40 probes"; return 1
}

mark "r5a driver start (pid $$)"
probe || exit 1

# --- step 1: bisect the mid-scale links-join kernel fault -----------------
for spec in "join 8000000" "join 32000000"; do
  set -- $spec
  timeout 1800 python tools/bisect_mid_ext.py --stage $1 --nodes $2 \
    >> runs/bisect_r5a.jsonl 2>> runs/bisect_r5a.err
  mark "bisect $1@$2 rc=$?"
  probe || exit 1
done
if ! grep -q '"stage": "join", "nodes": 32000000' runs/bisect_r5a.jsonl; then
  for st in boundary pack pairs; do
    timeout 1800 python tools/bisect_mid_ext.py --stage $st --nodes 32000000 \
      >> runs/bisect_r5a.jsonl 2>> runs/bisect_r5a.err
    mark "bisect $st@32M rc=$?"
    probe || exit 1
  done
fi

# --- step 2: ecoli super on chip (virtual genome default) -----------------
timeout 1800 python tools/run_scale.py --preset ecoli --count-only \
  --partitions 8 --super --checkpoint-dir ckpt/ecoli_super_r5 \
  > runs/ecoli_super_r5a.jsonl 2> runs/ecoli_super_r5a.err
mark "ecoli super rc=$?"
probe || exit 1

# --- step 3: chr1 super, only if ecoli produced a count event -------------
if grep -q scan_and_count runs/ecoli_super_r5a.jsonl 2>/dev/null; then
  timeout 5400 python tools/run_scale.py --preset chr1 --count-only \
    --park-keys --super --checkpoint-dir ckpt/chr1_super_r5 \
    > runs/chr1_super_r5a.jsonl 2> runs/chr1_super_r5a.err
  mark "chr1 super rc=$?"
  probe || exit 1
else
  mark "ecoli super produced no count event; skipping chr1 super"
fi

# --- step 4: humanchr banking continues into the SURVIVING r4 dir ---------
for rng in 14:21 21:28; do
  timeout 4500 python tools/run_scale.py --preset humanchr --count-only \
    --park-keys --part-range $rng --checkpoint-dir ckpt/humanchr_r4 \
    > runs/humanchr_w${rng%%:*}_r5a.jsonl 2> runs/humanchr_w${rng%%:*}_r5a.err
  mark "humanchr window $rng rc=$?"
  mark "humanchr parts banked: $(ls ckpt/humanchr_r4/part_*.npz 2>/dev/null | wc -l)"
  probe || exit 1
done
mark "r5a queue done"
