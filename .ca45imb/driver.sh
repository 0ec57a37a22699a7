#!/bin/bash
# Imbalanced hard-task contrast campaign (PERF.md "r4 imbalanced hard task").
# One (arm, seed) per python process (axon transfer leak, CLAUDE.md), one
# TPU job at a time, artifact written DIRECTLY into the repo so a VM
# restart resumes instead of recomputing (the r4 /tmp wipe lesson).
# Usage: bash .ca45imb/driver.sh   (from /root/repo; safe to re-run)
set -u
cd /root/repo
OUT=/root/repo/.ca45imb
mkdir -p "$OUT" /tmp/ca45imb
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_compile_cache

# paired order: each completed seed adds a (nocontrast, full) delta even if
# the session ends mid-campaign; secondary arms follow.
RUNS=""
for s in 2 3 4 5; do RUNS="$RUNS nocontrast:$s full:$s"; done
for s in 1 2 3 4 5; do RUNS="$RUNS noproto:$s"; done
for s in 1 2 3 4 5; do RUNS="$RUNS noentropy:$s"; done

for r in $RUNS; do
  arm=${r%%:*}; seed=${r##*:}
  art="$OUT/${arm}_s${seed}.json"
  if [ -s "$art" ]; then
    echo "[driver] skip ${arm}_s${seed} (artifact exists)"; continue
  fi
  echo "[driver] $(date +%T) start ${arm}_s${seed}"
  python -m coarse3d_tpu.tools.contrast_ablation \
    --arms "$arm" --seeds "$seed" \
    --epochs 45 --scans 64 --points 120000 --classes 8 \
    --weak 0.0002 --segments 16 --modes 1 --noise 0.15 \
    --imbalance 16 --num_workers 2 \
    --work /tmp/ca45imb --out "$art" \
    --set contrast.proto_momentum=0.9 \
    > "$OUT/${arm}_s${seed}.log" 2>&1
  rc=$?
  echo "[driver] $(date +%T) done ${arm}_s${seed} rc=$rc"
  if [ $rc -ne 0 ]; then
    # keep the log (epoch lines rebuild the entry); do not retry in-loop —
    # a wedged tunnel needs the grant to expire before the next job.
    echo "[driver] ${arm}_s${seed} FAILED (log kept); continuing"
  fi
done
echo "[driver] campaign complete $(date +%T)"
