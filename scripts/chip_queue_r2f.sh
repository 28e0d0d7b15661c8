#!/usr/bin/env bash
# Round-2 stage F: remainder with the PC paper grid promoted ahead of the
# static retrain, so both VERDICT done-bars get their measurement even if
# the round clock cuts the tail. Fresh filename per the stage-C lesson.
# Run as:
#   nohup bash scripts/chip_queue_r2f.sh <obs_eval_pid> > logs/chip_queue_r2f.out 2>&1 &
set -u
cd "$(dirname "$0")/.."
mkdir -p logs
log() { echo "=== $(date -u +%H:%M:%S) $*"; }

WAIT_PID=${1:-}
if [ -n "$WAIT_PID" ]; then
  log "waiting for obs eval pid $WAIT_PID"
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 60; done
fi

if [ ! -f logs/bench_r2_1.json ]; then
  log "bench re-measurement"
  python bench.py > logs/bench_r2_1.json 2>logs/bench_r2_1.err \
      || echo "BENCH FAILED"
fi

if [ ! -f eval_results_dynamic_pc_paper.json ]; then
  log "PC model on the 100x10 paper grid"
  python scripts/inference_dynamic.py --dataset dataset/EnvPredator_v2 \
      --checkpoints artifacts/weights/predator_pc_v1.npz \
      --pursuer-conditioned --n-contexts 100 --n-experiments 10 \
      --results eval_results_dynamic_pc_paper.json \
      > logs/eval_dynamic_pc_paper.out 2>&1 || echo "PC PAPER FAILED"
fi

if [ ! -f artifacts/weights/simple2d_v4.npz ]; then
  log "static 8x-data retrain 120k"
  python scripts/train.py \
      --dataset dataset/EnvSimple2dquant_v2,dataset/EnvSimple2dquant_v2b,dataset/EnvSimple2dquant_xl,dataset/EnvSimple2dquant_v3 \
      --checkpoints checkpoints/simple2d_v4 --steps 120000 \
      --batch-size 128 --normalizer-dataset dataset/EnvSimple2dquant_v2 \
      --log-file logs/train_simple2d_v4.jsonl \
      > logs/train_simple2d_v4.out 2>&1 || echo "STATIC TRAIN FAILED"
  python scripts/export_weights.py --checkpoints checkpoints/simple2d_v4 \
      --dataset dataset/EnvSimple2dquant_v2 \
      --out artifacts/weights/simple2d_v4.npz \
      > logs/export_v4.out 2>&1 || echo "STATIC EXPORT FAILED"
fi

if [ ! -f eval_results_static_v4.json ]; then
  log "static v4 parity full grid"
  python scripts/inference_static.py --dataset dataset/EnvSimple2dquant_v2 \
      --checkpoints artifacts/weights/simple2d_v4.npz \
      --n-contexts 20 --n-samples 20 \
      --results eval_results_static_v4.json \
      > logs/eval_static_v4.out 2>&1 || echo "V4 PARITY FAILED"
fi

if [ ! -f eval_results_static_v4_d4w5.json ]; then
  log "static v4 d4w5 full grid"
  python scripts/inference_static.py --dataset dataset/EnvSimple2dquant_v2 \
      --checkpoints artifacts/weights/simple2d_v4.npz \
      --n-contexts 20 --n-samples 20 --ddim-steps 4 --cfg-weight 5 \
      --results eval_results_static_v4_d4w5.json \
      > logs/eval_static_v4_d4w5.out 2>&1 || echo "V4 D4W5 FAILED"
fi

if [ ! -f logs/profile_r2.json ]; then
  log "roofline profile"
  python scripts/profile_static.py > logs/profile_r2.json \
      2>logs/profile_r2.err || echo "PROFILE FAILED"
fi

if [ ! -f eval_results_3d_grid_compose_rs2.json ]; then
  log "3-D compose resample_steps=2 w=4"
  python scripts/inference3d.py --dataset dataset/EnvSmall3D_v2 \
      --compose-dataset dataset/EnvSmall3D_v2b \
      --checkpoints artifacts/weights/planner3d_v2.npz \
      --max-envs 12 --n-contexts 5 --n-samples 4 --cfg-weight 4 \
      --resample-steps 2 \
      --results eval_results_3d_grid_compose_rs2.json \
      > logs/eval_3d_compose_rs2.out 2>&1 || echo "RS2 FAILED"
fi

if [ ! -f eval_results_3d_grid_compose_apf.json ]; then
  log "3-D compose APF w=4"
  python scripts/inference3d.py --dataset dataset/EnvSmall3D_v2 \
      --compose-dataset dataset/EnvSmall3D_v2b \
      --checkpoints artifacts/weights/planner3d_v2.npz \
      --max-envs 12 --n-contexts 5 --n-samples 4 --cfg-weight 4 \
      --use-apf \
      --results eval_results_3d_grid_compose_apf.json \
      > logs/eval_3d_compose_apf.out 2>&1 || echo "COMPOSE APF FAILED"
fi

if [ ! -f logs/bench_r2_2.json ]; then
  log "bench measurement 2"
  python bench.py > logs/bench_r2_2.json 2>logs/bench_r2_2.err \
      || echo "BENCH2 FAILED"
fi

log "stage F done"
