#!/usr/bin/env bash
# Launch SemanticKITTI weak-label training (reference: tasks/weak_segmentation/run.sh,
# which spawned one torch DDP process per GPU). On TPU, ONE process per host
# drives all local chips via mesh sharding; multi-host pods add --multihost.
set -euo pipefail

python -m coarse3d_tpu.tools.train \
    --config configs/semantic_kitti.yaml \
    --id "${EXPERIMENT_ID:-v1.0}" \
    "$@"
