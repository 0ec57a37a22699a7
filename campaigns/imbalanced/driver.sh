#!/bin/bash
# Imbalanced hard-task contrast campaign, round-5 queue (VERDICT r4 next
# #1-#3). One (arm, seed) per python process (axon transfer leak,
# CLAUDE.md), one TPU job at a time, artifact written DIRECTLY into the
# repo so a VM restart resumes instead of recomputing (the r4 /tmp wipe
# lesson).
# Usage: bash campaigns/imbalanced/driver.sh   (from /root/repo; safe to
# re-run — completed artifacts are skipped.)
set -u
cd /root/repo
OUT=/root/repo/campaigns/imbalanced
mkdir -p "$OUT" /tmp/ca45imb
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_compile_cache

# Priority order (VERDICT r4): finish the primary paired verdict first
# (nocontrast/full seeds 4-5, interleaved so every completed seed adds a
# paired delta), then the staggered interaction-hypothesis arm, then the
# single-ablation arms that settle the shipped defaults. Seeds 1-3 of
# nocontrast/full are done (artifacts present -> skipped).
RUNS=""
for s in 3 4 5; do RUNS="$RUNS nocontrast:$s full:$s"; done
for s in 1 2 3 4 5; do RUNS="$RUNS staggered:$s"; done
for s in 1 2 3 4 5; do RUNS="$RUNS noproto:$s"; done
for s in 1 2 3 4 5; do RUNS="$RUNS noentropy:$s"; done

for r in $RUNS; do
  # graceful stop between runs (never kill a TPU job mid-flight — the
  # tunnel wedges, CLAUDE.md): `touch campaigns/STOP` finishes the current
  # run and exits the queue.
  if [ -e /root/repo/campaigns/STOP ]; then
    echo "[driver] STOP file present — exiting before ${r}"; exit 0
  fi
  arm=${r%%:*}; seed=${r##*:}
  art="$OUT/${arm}_s${seed}.json"
  # skip only artifacts that parse as JSON (ADVICE r4: a non-empty but
  # truncated file must be re-run, not skipped forever). _write publishes
  # atomically now, but artifacts from older code may predate that.
  if python -c "import json,sys; json.load(open(sys.argv[1]))" "$art" \
      2>/dev/null; then
    echo "[driver] skip ${arm}_s${seed} (artifact valid)"; continue
  fi
  echo "[driver] $(date +%T) start ${arm}_s${seed}"
  # per-attempt log (ADVICE r4): a retry must not truncate the previous
  # failure's epoch-mIoU lines — those rebuild a killed run's entry.
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
  echo "[driver] $(date +%T) done ${arm}_s${seed} rc=$rc"
  if [ $rc -ne 0 ]; then
    # ADVICE r4: after a failure the tunnel may be wedged; launching the
    # next job immediately risks a 15-20 min hang or another wedge. Back
    # off long enough for the grant to expire before continuing.
    echo "[driver] ${arm}_s${seed} FAILED (log kept); backing off 180s"
    sleep 180
  fi
done
echo "[driver] campaign complete $(date +%T)"
