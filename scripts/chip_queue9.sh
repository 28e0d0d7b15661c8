#!/usr/bin/env bash
# 3-D DDIM step-count bracket after the clip_x0 repair. Post-fix DDIM-5
# scored 0.95 success at p50 32.8 ms but with loose, jagged plans
# (collision 2.14% and path length 9.34 vs the DDPM-25 baseline's 1.04% /
# 1.44) — too loose to ship as `--preset fast` unexamined. This brackets
# the step count (8, 12) to find where path quality recovers while the
# call count still beats DDPM-25.
# Run as:
#   nohup bash scripts/chip_queue9.sh <queue8_pid> > logs/chip_queue9.out 2>&1 &
#   echo $! > /tmp/queue9.pid
set -u
cd "$(dirname "$0")/.."
mkdir -p logs

log() { echo "=== $(date -u +%H:%M:%S) $*"; }

WAIT_PID=${1:-}
if [ -n "$WAIT_PID" ]; then
  log "waiting for queue8 pid $WAIT_PID"
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 60; done
  log "queue8 drained"
fi

for k in 8 12; do
  if [ ! -f "eval_results_3d_grid_ddim${k}.json" ]; then
    log "3d grid ddim-${k}"
    python scripts/inference3d.py --dataset dataset/EnvSmall3D_v2 \
        --checkpoints artifacts/weights/planner3d_v2.npz --n-samples 4 \
        --max-envs 12 --n-contexts 5 --ddim-steps "$k" \
        --results "eval_results_3d_grid_ddim${k}.json" \
        > "logs/eval_3d_grid_ddim${k}.out" 2>&1 \
        || echo "3d ddim-${k} grid FAILED"
  fi
done

log "3d ddim step bracket done"
