#!/usr/bin/env bash
# Round-2 stage C (replaces the tail of chip_queue_r2b.sh after the
# obstacle-rich train turned out 2.3x slower per step than planned —
# 106 ms vs 46: the 9-row clouds double the encoder tokens). Reordered so
# a bench measurement lands early, and the static retrain is time-boxed
# to 120k steps (resume can extend it next round):
#   export obs -> PC 50x4 -> obs 50x4 -> bench -> PC paper grid ->
#   static train 120k -> export -> static parity eval -> d4w5 eval
# (reordered: the 100x10 paper grid runs LAST — it is the piece that can
# be cut at round end without losing the static data-scaling eval)
# Run as:
#   nohup bash scripts/chip_queue_r2c.sh <obs_train_pid> > logs/chip_queue_r2c.out 2>&1 &
set -u
cd "$(dirname "$0")/.."
mkdir -p logs

log() { echo "=== $(date -u +%H:%M:%S) $*"; }

WAIT_PID=${1:-}
if [ -n "$WAIT_PID" ]; then
  log "waiting for obs train pid $WAIT_PID"
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 60; done
  log "obs train drained"
fi

if [ ! -f artifacts/weights/predator_obs_v1.npz ]; then
  python scripts/export_weights.py --checkpoints checkpoints/predator_obs_v1 \
      --dataset dataset/EnvPredatorObs_v1 \
      --out artifacts/weights/predator_obs_v1.npz \
      > logs/export_obs.out 2>&1 || echo "OBS EXPORT FAILED"
fi

if [ ! -f eval_results_dynamic_pc_50x4.json ]; then
  log "PC model on the flagship 50x4 grid (EnvPredator_v2 scene 0)"
  python scripts/inference_dynamic.py --dataset dataset/EnvPredator_v2 \
      --checkpoints artifacts/weights/predator_pc_v1.npz \
      --pursuer-conditioned --n-contexts 50 --n-experiments 4 \
      --results eval_results_dynamic_pc_50x4.json \
      > logs/eval_dynamic_pc_50x4.out 2>&1 || echo "PC 50x4 FAILED"
fi

if [ ! -f eval_results_predator_obs.json ]; then
  log "obstacle-rich model on its own scene (50x4)"
  python scripts/inference_dynamic.py --dataset dataset/EnvPredatorObs_v1 \
      --checkpoints artifacts/weights/predator_obs_v1.npz \
      --pursuer-conditioned --n-contexts 50 --n-experiments 4 \
      --results eval_results_predator_obs.json \
      > logs/eval_predator_obs.out 2>&1 || echo "OBS 50x4 FAILED"
fi

if [ ! -f logs/bench_r2_1.json ]; then
  log "bench re-measurement"
  python bench.py > logs/bench_r2_1.json 2>logs/bench_r2_1.err \
      || echo "BENCH FAILED"
fi


if [ ! -f artifacts/weights/simple2d_v4.npz ]; then
  log "train static on 8x scenes (120k, time-boxed; resumable)"
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
  log "static v4 full-grid parity eval (96x20x20, v2 eval root)"
  python scripts/inference_static.py --dataset dataset/EnvSimple2dquant_v2 \
      --checkpoints artifacts/weights/simple2d_v4.npz \
      --n-contexts 20 --n-samples 20 \
      --results eval_results_static_v4.json \
      > logs/eval_static_v4.out 2>&1 || echo "V4 PARITY FAILED"
fi

if [ ! -f eval_results_static_v4_d4w5.json ]; then
  log "static v4 full grid at the d4w5 quality preset"
  python scripts/inference_static.py --dataset dataset/EnvSimple2dquant_v2 \
      --checkpoints artifacts/weights/simple2d_v4.npz \
      --n-contexts 20 --n-samples 20 --ddim-steps 4 --cfg-weight 5 \
      --results eval_results_static_v4_d4w5.json \
      > logs/eval_static_v4_d4w5.out 2>&1 || echo "V4 D4W5 FAILED"
fi

if [ ! -f eval_results_dynamic_pc_paper.json ]; then
  log "PC model on the 100x10 paper grid"
  python scripts/inference_dynamic.py --dataset dataset/EnvPredator_v2 \
      --checkpoints artifacts/weights/predator_pc_v1.npz \
      --pursuer-conditioned --n-contexts 100 --n-experiments 10 \
      --results eval_results_dynamic_pc_paper.json \
      > logs/eval_dynamic_pc_paper.out 2>&1 || echo "PC PAPER FAILED"
fi

log "stage C done"
