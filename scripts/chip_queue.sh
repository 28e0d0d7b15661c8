#!/usr/bin/env bash
# Pending TPU-chip work queue (survives round boundaries — /tmp does not).
#
# The axon TPU tunnel died mid-campaign on 2026-08-17; this script waits for
# the chip to come back and then drains the remaining queue in order:
#   1. static knob A/B round 2 (d5w4 + d3w3 probes, auto full tuned grid)
#   2. static fine-tune 300k -> 420k in two exported legs + eval
#   3. 3-D plain + compose chip reruns (fixed per-task sphere metrics)
#   4. fresh bench
# Each stage is individually resumable (cached probe JSONs are skipped by
# static_probe_ab.sh). Run as:
#   nohup bash scripts/chip_queue.sh > logs/chip_queue.out 2>&1 &
set -u
cd "$(dirname "$0")/.."
mkdir -p logs

log() { echo "=== $(date -u +%H:%M:%S) $*"; }

log "waiting for the TPU tunnel"
until python -c "
from ramp_tpu.utils.platform import accelerator_available
import sys; sys.exit(0 if accelerator_available() else 1)"; do
  sleep 60
done
log "tunnel is back"

bash scripts/static_probe_ab.sh
bash scripts/finetune_static.sh
bash scripts/dynamic_probe_ab.sh

log "3d plain rerun (fixed sphere metrics)"
python scripts/inference3d.py --dataset dataset/EnvSmall3D_v2 \
    --checkpoints artifacts/weights/planner3d_v2.npz --n-samples 4 \
    --results eval_results_3d.json > logs/eval_3d_rerun.out 2>&1
log "3d compose rerun (fixed sphere metrics)"
python scripts/inference3d.py --dataset dataset/EnvSmall3D_v2 \
    --compose-dataset dataset/EnvSmall3D_v2b \
    --checkpoints artifacts/weights/planner3d_v2.npz --n-samples 4 \
    --results eval_results_3d_compose.json > logs/eval_3d_compose_rerun.out 2>&1

python bench.py > logs/bench_post2.json 2>logs/bench_post2.err
log "chip queue drained"
