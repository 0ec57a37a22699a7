#!/bin/bash
# Width-only 1x2 space-to-depth stem experiment (VERDICT r4 next #6).
# Protocol: the r4 BALANCED hard-task phase-2 grid (ABLATION_r04.json
# config — weak 0.0001, 16 segments, modes 1, momentum 0.9, 45 epochs),
# arm `s2d_w` seeds 1-5, paired at merge time against ABLATION_r04's
# `full` and `s2d` runs (same task seeds/data). One run per process (axon
# transfer leak, CLAUDE.md), artifacts written into the repo so a VM
# restart resumes. Throughput numbers come first (minutes) so the perf
# half of the question is answered even if the accuracy runs are cut off.
# Usage: bash campaigns/s2dw/driver.sh   (from /root/repo; re-runnable)
set -u
cd /root/repo
OUT=/root/repo/campaigns/s2dw
mkdir -p "$OUT" /tmp/ca45s2dw
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_compile_cache

# 1) scans/s: inference (B=16, proj+fwd+KNN) + train step (B=4 parity
#    recipe and B=8 throughput point), one process
if python -c "import json,sys
rows=[json.loads(l) for l in open(sys.argv[1])]
assert len(rows)>=3" "$OUT/BENCH_S2DW.json" 2>/dev/null; then
  echo "[s2dw] skip bench (artifact valid)"
else
  rm -f "$OUT/BENCH_S2DW.json"
  python - >> "$OUT/s2dw_bench.log" 2>&1 <<'EOF'
import bench
bench.main(out="campaigns/s2dw/BENCH_S2DW.json", stem="s2d_w")
bench.main_train(stem="s2d_w", batch=4, out="campaigns/s2dw/BENCH_S2DW.json")
bench.main_train(stem="s2d_w", batch=8, out="campaigns/s2dw/BENCH_S2DW.json")
EOF
  echo "[s2dw] bench rc=$?"
fi

# 2) accuracy: 5 paired seeds on the balanced hard task
for seed in 1 2 3 4 5; do
  # graceful stop between runs (never kill a TPU job mid-flight; CLAUDE.md)
  if [ -e /root/repo/campaigns/STOP ]; then
    echo "[s2dw] STOP file present — exiting before seed $seed"; exit 0
  fi
  art="$OUT/s2d_w_s${seed}.json"
  if python -c "import json,sys; json.load(open(sys.argv[1]))" "$art" \
      2>/dev/null; then
    echo "[s2dw] skip seed $seed (artifact valid)"; continue
  fi
  echo "[s2dw] $(date +%T) start seed $seed"
  log="$OUT/s2d_w_s${seed}.log"
  if [ -e "$log" ]; then mv "$log" "$log.prev.$(date +%s)"; fi
  python -m coarse3d_tpu.tools.contrast_ablation \
    --arms s2d_w --seeds "$seed" \
    --epochs 45 --scans 64 --points 120000 --classes 8 \
    --weak 0.0001 --segments 16 --modes 1 --noise 0.15 \
    --num_workers 2 \
    --work /tmp/ca45s2dw --out "$art" \
    --set contrast.proto_momentum=0.9 \
    > "$log" 2>&1
  rc=$?
  echo "[s2dw] $(date +%T) done seed $seed rc=$rc"
  if [ $rc -ne 0 ]; then
    echo "[s2dw] seed $seed FAILED (log kept); backing off 180s"
    sleep 180
  fi
done
echo "[s2dw] experiment complete $(date +%T)"
