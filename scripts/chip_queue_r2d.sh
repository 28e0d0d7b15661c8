#!/usr/bin/env bash
# Round-2 stage D (best-effort tail — runs whatever fits before round end):
#   1. roofline profile of the guided replan (VERDICT r1 item 9)
#   2. 3-D compose quality probes with the new knobs (item 6): the
#      reference's resampling loop and the beyond-parity 3-D APF, on the
#      12x5x4 compose grid at the quality weight (w=4), plus plain-grid APF
#   3. a second bench measurement (variance band, item 4)
# Run as:
#   nohup bash scripts/chip_queue_r2d.sh <r2c_pid> > logs/chip_queue_r2d.out 2>&1 &
set -u
cd "$(dirname "$0")/.."
mkdir -p logs

log() { echo "=== $(date -u +%H:%M:%S) $*"; }

WAIT_PID=${1:-}
if [ -n "$WAIT_PID" ]; then
  log "waiting for stage C pid $WAIT_PID"
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 120; done
  log "stage C drained"
fi

if [ ! -f logs/profile_r2.json ]; then
  log "roofline profile of the guided replan"
  python scripts/profile_static.py > logs/profile_r2.json \
      2>logs/profile_r2.err || echo "PROFILE FAILED"
fi

if [ ! -f eval_results_3d_grid_compose_rs2.json ]; then
  log "3-D compose grid + resample_steps=2 (w=4)"
  python scripts/inference3d.py --dataset dataset/EnvSmall3D_v2 \
      --compose-dataset dataset/EnvSmall3D_v2b \
      --checkpoints artifacts/weights/planner3d_v2.npz \
      --max-envs 12 --n-contexts 5 --n-samples 4 --cfg-weight 4 \
      --resample-steps 2 \
      --results eval_results_3d_grid_compose_rs2.json \
      > logs/eval_3d_compose_rs2.out 2>&1 || echo "RS2 FAILED"
fi

if [ ! -f eval_results_3d_grid_compose_apf.json ]; then
  log "3-D compose grid + APF (w=4)"
  python scripts/inference3d.py --dataset dataset/EnvSmall3D_v2 \
      --compose-dataset dataset/EnvSmall3D_v2b \
      --checkpoints artifacts/weights/planner3d_v2.npz \
      --max-envs 12 --n-contexts 5 --n-samples 4 --cfg-weight 4 \
      --use-apf \
      --results eval_results_3d_grid_compose_apf.json \
      > logs/eval_3d_compose_apf.out 2>&1 || echo "COMPOSE APF FAILED"
fi

if [ ! -f eval_results_3d_grid_apf.json ]; then
  log "3-D plain grid + APF (parity w)"
  python scripts/inference3d.py --dataset dataset/EnvSmall3D_v2 \
      --checkpoints artifacts/weights/planner3d_v2.npz \
      --max-envs 12 --n-contexts 5 --n-samples 4 \
      --use-apf \
      --results eval_results_3d_grid_apf.json \
      > logs/eval_3d_apf.out 2>&1 || echo "PLAIN APF FAILED"
fi

if [ ! -f logs/bench_r2_2.json ]; then
  log "bench measurement 2"
  python bench.py > logs/bench_r2_2.json 2>logs/bench_r2_2.err \
      || echo "BENCH2 FAILED"
fi

log "stage D done"
