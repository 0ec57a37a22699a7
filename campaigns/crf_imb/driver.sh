#!/bin/bash
# CRF trained-kernel generality queue (CPU side, VERDICT r4 next #4).
#
# The host has ONE core: runs are strictly sequential and niced so the TPU
# campaign's data loading keeps priority. Resumable like the TPU drivers —
# an artifact that parses as JSON is skipped, `touch campaigns/STOP` exits
# between runs.
#
# Queue (evidence order):
#   nocontrast_s3        second unweighted data point (weakest base —
#                        where the balanced-task CRF gained the most)
#   full_s2 --class_balance      does inverse-frequency fitting rescue the
#                                -5.8 pt / rare-class-zeroed failure?
#   nocontrast_s3 --class_balance
#   full_s4 / full_s4_cb third checkpoint (healthy escaped seed) if clock
set -u
cd /root/repo
OUT=/root/repo/campaigns/crf_imb
# running run_ckpt.py by path does NOT put the repo on sys.path; keep the
# axon site dir too (CLAUDE.md: setting PYTHONPATH replaces it)
export PYTHONPATH=/root/repo:/root/.axon_site

RUNS="nocontrast:3: full:2:cb nocontrast:3:cb full:4: full:4:cb"

for r in $RUNS; do
  if [ -e /root/repo/campaigns/STOP ]; then
    echo "[crf-driver] STOP file present — exiting before ${r}"; exit 0
  fi
  arm=$(echo "$r" | cut -d: -f1)
  seed=$(echo "$r" | cut -d: -f2)
  cb=$(echo "$r" | cut -d: -f3)
  tag="${arm}_s${seed}"; extra=""
  if [ "$cb" = "cb" ]; then tag="${tag}_cb"; extra="--class_balance"; fi
  art="$OUT/${tag}.json"
  if python -c "import json,sys; json.load(open(sys.argv[1]))" "$art" \
      2>/dev/null; then
    echo "[crf-driver] skip ${tag} (artifact valid)"; continue
  fi
  # an externally-launched run_ckpt may still be writing this artifact
  # (the in-flight nocontrast_s3 at driver start): wait while its log is
  # still growing before deciding to (re)run.
  log="$OUT/${tag}.log"
  if [ -e "$log" ]; then
    prev=-1; size=$(stat -c%s "$log")
    while [ "$size" != "$prev" ]; do
      sleep 120
      prev=$size; size=$(stat -c%s "$log")
    done
    if python -c "import json,sys; json.load(open(sys.argv[1]))" "$art" \
        2>/dev/null; then
      echo "[crf-driver] skip ${tag} (completed externally)"; continue
    fi
    mv "$log" "$log.prev.$(date +%s)"
  fi
  echo "[crf-driver] $(date +%T) start ${tag}"
  nice -n 19 python campaigns/crf_imb/run_ckpt.py \
    --arm "$arm" --seed "$seed" $extra > "$log" 2>&1
  rc=$?   # capture before $(date) clobbers $?
  echo "[crf-driver] $(date +%T) done ${tag} rc=$rc"
done
echo "[crf-driver] queue complete $(date +%T)"
