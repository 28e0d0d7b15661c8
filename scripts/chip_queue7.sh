#!/usr/bin/env bash
# 3-D fast-preset compose check: waits for the dynamic fast-preset stage
# (scripts/chip_queue6.sh), then runs the scenes x contexts COMPOSE grid
# with the DDIM-5 sampler. Motivation: DDIM-5 dominates DDPM-25 on the
# single-model grid (success 1.000 vs 0.917, collision 0.00% vs 1.04%,
# p50 32.4 vs 39.1 ms, eval_results_3d_grid_ddim.json) and now ships as
# the 3-D `--preset fast`; compose mode (two obstacle-set latents summed
# in the guidance fold) is the remaining surface where the sampler swap
# is unmeasured on chip (DDPM compose baseline: 0.750 / 3.54%,
# eval_results_3d_grid_compose.json).
# Run as:
#   nohup bash scripts/chip_queue7.sh <queue6_pid> > logs/chip_queue7.out 2>&1 &
set -u
cd "$(dirname "$0")/.."
mkdir -p logs

log() { echo "=== $(date -u +%H:%M:%S) $*"; }

WAIT_PID=${1:-}
if [ -n "$WAIT_PID" ]; then
  log "waiting for queue6 pid $WAIT_PID"
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 120; done
  log "queue6 drained"
fi

if [ ! -f eval_results_3d_grid_compose_ddim.json ]; then
  log "3d compose grid with DDIM-5"
  python scripts/inference3d.py --dataset dataset/EnvSmall3D_v2 \
      --checkpoints artifacts/weights/planner3d_v2.npz --n-samples 4 \
      --max-envs 12 --n-contexts 5 --ddim \
      --compose-dataset dataset/EnvSmall3D_v2b \
      --results eval_results_3d_grid_compose_ddim.json \
      > logs/eval_3d_grid_compose_ddim.out 2>&1 \
      || echo "3d compose ddim grid FAILED"
fi

log "3d fast-preset compose check done"
