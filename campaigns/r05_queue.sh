#!/bin/bash
# Round-5 TPU work queue. One TPU job at a time (CLAUDE.md); each stage is
# resumable, so re-running this script after a crash/VM restart continues
# where it stopped.
#
# Order (VERDICT r4 priorities):
#   1. s2d_w throughput bench (minutes) — the perf half of next-step #6.
#   2. Imbalanced contrast campaign (next #1-#3): primary paired verdict
#      (nocontrast/full s4-5), staggered interaction arm, noproto/noentropy
#      defaults-settling arms.
#   3. s2d_w accuracy seeds (the remaining half of #6) if clock remains.
set -u
cd /root/repo

echo "[r05] $(date +%T) stage 1: s2d_w bench + stage 3 gating"
# Stage 1 is the first block of the s2dw driver; its accuracy seeds (stage
# 3) run after the imbalanced campaign, so stop the s2dw driver after the
# bench block by checking which artifacts exist.
if python -c "import json,sys
rows=[json.loads(l) for l in open(sys.argv[1])]
assert len(rows)>=3" campaigns/s2dw/BENCH_S2DW.json 2>/dev/null; then
  echo "[r05] s2dw bench already done"
else
  mkdir -p /tmp/ca45s2dw
  export JAX_COMPILATION_CACHE_DIR=/tmp/jax_compile_cache
  rm -f campaigns/s2dw/BENCH_S2DW.json
  python - >> campaigns/s2dw/s2dw_bench.log 2>&1 <<'EOF'
import bench
bench.main(out="campaigns/s2dw/BENCH_S2DW.json", stem="s2d_w")
bench.main_train(stem="s2d_w", batch=4, out="campaigns/s2dw/BENCH_S2DW.json")
bench.main_train(stem="s2d_w", batch=8, out="campaigns/s2dw/BENCH_S2DW.json")
EOF
  echo "[r05] s2dw bench rc=$?"
fi

if [ -e /root/repo/campaigns/STOP ]; then
  echo "[r05] STOP file present — exiting before stage 2"; exit 0
fi
echo "[r05] $(date +%T) stage 2: imbalanced campaign"
bash campaigns/imbalanced/driver.sh

if [ -e /root/repo/campaigns/STOP ]; then
  echo "[r05] STOP file present — exiting before stage 3"; exit 0
fi
echo "[r05] $(date +%T) stage 3: s2d_w accuracy seeds"
bash campaigns/s2dw/driver.sh

echo "[r05] $(date +%T) queue complete"
