#!/usr/bin/env bash
# HONEST re-measurement of the 3-D DDIM grids after the clip_x0 repair.
#
# The pre-fix numbers (success 1.000 / 0.00% collision, path length ~122)
# were produced by the reference's numerically broken dormant DDIM path:
# under the exponential schedule alpha_bar(T-1) ~ 5.7e-11 the unclipped
# predict_start_from_noise amplifies model error ~1.3e5x, the chain
# saturates at the workspace boundary after the normalizer clip, and —
# because obstacles are interior — the diverged noise paths score a
# *perfect* collision intensity. Two repairs land together:
#   * sampler: ddim_sample_chain_3d clips x0-hat and recomputes the
#     direction from it (the static chain's recipe), default on
#   * harness: waypoints that left the normalized workspace are counted
#     as invalid even though clip-on-unnormalize saturates them
# This queue re-runs both grids so the 3-D `--preset fast` decision rests
# on real numbers.
# Run as:
#   nohup bash scripts/chip_queue8.sh > logs/chip_queue8.out 2>&1 &
#   echo $! > /tmp/queue8.pid
set -u
cd "$(dirname "$0")/.."
mkdir -p logs

log() { echo "=== $(date -u +%H:%M:%S) $*"; }

WAIT_PID=${1:-}
if [ -n "$WAIT_PID" ]; then
  log "waiting for pid $WAIT_PID"
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 120; done
  log "prior queue drained"
fi

# the pre-fix results are invalid; force both stages to re-run
rm -f eval_results_3d_grid_ddim.json eval_results_3d_grid_compose_ddim.json

log "3d grid ddim (post clip_x0 fix)"
python scripts/inference3d.py --dataset dataset/EnvSmall3D_v2 \
    --checkpoints artifacts/weights/planner3d_v2.npz --n-samples 4 \
    --max-envs 12 --n-contexts 5 --ddim \
    --results eval_results_3d_grid_ddim.json \
    > logs/eval_3d_grid_ddim.out 2>&1 || echo "3d ddim grid FAILED"

log "3d compose grid ddim (post clip_x0 fix)"
python scripts/inference3d.py --dataset dataset/EnvSmall3D_v2 \
    --checkpoints artifacts/weights/planner3d_v2.npz --n-samples 4 \
    --max-envs 12 --n-contexts 5 --ddim \
    --compose-dataset dataset/EnvSmall3D_v2b \
    --results eval_results_3d_grid_compose_ddim.json \
    > logs/eval_3d_grid_compose_ddim.out 2>&1 \
    || echo "3d compose ddim grid FAILED"

log "post-fix 3d ddim grids done"
