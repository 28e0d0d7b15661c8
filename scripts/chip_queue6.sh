#!/usr/bin/env bash
# Dynamic fast-preset confirmation: waits for the scale-confirmation stage
# (scripts/chip_queue5.sh), then runs the 100x10 paper grid with 3 STAGE-II
# refine steps (--ddim-steps-low 3). Motivation: the 20x2 probe
# (eval_dynab_l3.json) scored 0.80 at p50 26 ms vs parity's 0.700/35 ms —
# the latency cut (~26%, 2 fewer U-Net calls per replan) is real by
# construction; whether score holds needs 1000 episodes (small dynamic
# grids have ±0.18 CIs and have misled before, RESULTS.md). If score is
# within parity's paper CI, this becomes `--preset fast` for the dynamic
# family at parity CFG weight (w=3.5 already failed to transfer).
# Run as:
#   nohup bash scripts/chip_queue6.sh <queue5_pid> > logs/chip_queue6.out 2>&1 &
set -u
cd "$(dirname "$0")/.."
mkdir -p logs

log() { echo "=== $(date -u +%H:%M:%S) $*"; }

WAIT_PID=${1:-}
if [ -n "$WAIT_PID" ]; then
  log "waiting for queue5 pid $WAIT_PID"
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 120; done
  log "queue5 drained"
fi

if [ ! -f eval_results_dynamic_paper_l3.json ]; then
  log "dynamic paper grid at 3 STAGE-II refine steps"
  python scripts/inference_dynamic.py --dataset dataset/EnvPredator_v2 \
      --checkpoints artifacts/weights/predator_v2_60k.npz \
      --n-contexts 100 --n-experiments 10 --n-samples 35 \
      --ddim-steps-low 3 --results eval_results_dynamic_paper_l3.json \
      > logs/eval_dyn_paper_l3.out 2>&1 || echo "l3 paper grid FAILED"
fi

log "dynamic fast-preset confirmation done"
