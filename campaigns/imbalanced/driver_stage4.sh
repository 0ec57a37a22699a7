#!/bin/bash
# Imbalanced campaign, stage 4 (launched only after r05_queue.sh finishes —
# one TPU job at a time, CLAUDE.md). Two follow-ups the stage-2 grid opens:
#
#   minimal s1-5   — frozen prototypes AND weak-only anchors. On the
#                    balanced grid minimal ~= nocontrast while noproto won
#                    (+10.4 pt): the gain needed entropy selection. If the
#                    same holds under imbalance, noproto's win is a
#                    selection effect, not a prototype effect — which
#                    decides how the shipped defaults are documented.
#   seeds 6-7      — nocontrast/full/noproto: the primary verdict at n=5 is
#                    dominated by one catastrophic full seed (s3, escape
#                    delayed past cutoff); two more paired seeds bound how
#                    often that tail event occurs.
#
# Same protocol as driver.sh (45 epochs, imbalance 16, weak 2e-4,
# momentum 0.9); resumable; `touch campaigns/STOP` exits between runs.
set -u
cd /root/repo
OUT=/root/repo/campaigns/imbalanced
mkdir -p "$OUT" /tmp/ca45imb
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_compile_cache

RUNS=""
for s in 1 2 3 4 5; do RUNS="$RUNS minimal:$s"; done
for s in 6 7; do RUNS="$RUNS nocontrast:$s full:$s noproto:$s"; done

for r in $RUNS; do
  if [ -e /root/repo/campaigns/STOP ]; then
    echo "[stage4] STOP file present — exiting before ${r}"; exit 0
  fi
  arm=${r%%:*}; seed=${r##*:}
  art="$OUT/${arm}_s${seed}.json"
  if python -c "import json,sys; json.load(open(sys.argv[1]))" "$art" \
      2>/dev/null; then
    echo "[stage4] skip ${arm}_s${seed} (artifact valid)"; continue
  fi
  echo "[stage4] $(date +%T) start ${arm}_s${seed}"
  log="$OUT/${arm}_s${seed}.log"
  if [ -e "$log" ]; then mv "$log" "$log.prev.$(date +%s)"; fi
  python -m coarse3d_tpu.tools.contrast_ablation \
    --arms "$arm" --seeds "$seed" \
    --epochs 45 --scans 64 --points 120000 --classes 8 \
    --weak 0.0002 --segments 16 --modes 1 --noise 0.15 \
    --imbalance 16 --num_workers 2 \
    --work /tmp/ca45imb --out "$art" \
    --set contrast.proto_momentum=0.9 \
    > "$log" 2>&1
  rc=$?
  echo "[stage4] $(date +%T) done ${arm}_s${seed} rc=$rc"
  if [ $rc -ne 0 ]; then
    echo "[stage4] ${arm}_s${seed} FAILED (log kept); backing off 180s"
    sleep 180
  fi
done
echo "[stage4] complete $(date +%T)"
