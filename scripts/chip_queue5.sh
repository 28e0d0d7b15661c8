#!/usr/bin/env bash
# Scale-confirmation stage: waits for the final re-measurement stage
# (scripts/chip_queue4.sh) to drain, then runs the one probe winner that
# merits a full-grid test. Motivation: the 24x10 probe grid found DDIM-4
# w=5 at 0.854 success with QUALITY-tier tightness (collision 10.95, path
# 1.80 — vs quality's 0.842/10.42/1.74 and fast's 0.858/13.98/2.62,
# eval_ab_d4w5.json). The dynamic family just taught us probe-grid wins
# can be noise (RESULTS.md), so the preset only moves if the full
# 96x20x20 paper-shaped grid confirms it against
# eval_results_static_tuned.json (0.8495) / eval_results_static.json
# (0.795 parity).
# Run as:
#   nohup bash scripts/chip_queue5.sh <queue4_pid> > logs/chip_queue5.out 2>&1 &
set -u
cd "$(dirname "$0")/.."
mkdir -p logs

log() { echo "=== $(date -u +%H:%M:%S) $*"; }

WAIT_PID=${1:-}
if [ -n "$WAIT_PID" ]; then
  log "waiting for queue4 pid $WAIT_PID"
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 120; done
  log "queue4 drained"
fi

if [ ! -f eval_results_static_d4w5.json ]; then
  log "full static grid at DDIM-4 w=5"
  python scripts/inference_static.py --dataset dataset/EnvSimple2dquant_v2 \
      --checkpoints artifacts/weights/simple2d_v2.npz \
      --n-contexts 20 --n-samples 20 --ddim-steps 4 --cfg-weight 5 \
      --results eval_results_static_d4w5.json \
      > logs/eval_static_d4w5.out 2>&1 || echo "d4w5 full grid FAILED"
fi

log "scale-confirmation stage done"
