#!/usr/bin/env bash
# Round-4 stage B: the two training legs (VERDICT r3 items 4 and 5).
#  B1. De-confound the dynamic flagship: train the SWEPT conditioning recipe
#      on a 384-scene subset of EnvPredatorPC_v2 (same scenes the 3072
#      flagship saw, 1/8 the data), then the 100x10 paper grid. Completes
#      the attribution square: position@384 (0.680) / swept@384 (this leg) /
#      swept@3072 (0.725) — "sweep worth X, data worth Y".
#  B2. Obstacle-rich flagship treatment: train the twice-proven recipe
#      (swept K=8 conditioning + 8x data, dataset/EnvPredatorObs_v2 =
#      3072 scenes x 16 demos x 8 boxes) and run 50x4 + the 100x10 paper
#      grid on the same EnvPredatorObs_v1 scene every obs baseline used.
#      Waits for the CPU-side dataset generation to finish (3072 dirs).
# Run as:
#   nohup bash scripts/chip_queue_r4b.sh <r4a_pid> > logs/chip_queue_r4b.out 2>&1 &
set -u
cd "$(dirname "$0")/.."
mkdir -p logs
log() { echo "=== $(date -u +%H:%M:%S) $*"; }

WAIT_PID=${1:-}
if [ -n "$WAIT_PID" ]; then
  log "waiting for stage A pid $WAIT_PID"
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 60; done
fi

# ---- B1: swept conditioning at 384 scenes (controlled data-scale leg)
if [ ! -f artifacts/weights/predator_pc_v2_sub384.npz ]; then
  log "B1: train swept@384 (60k)"
  python scripts/train.py --dataset dataset/EnvPredatorPC_v2_sub384 \
      --checkpoints checkpoints/predator_pc_v2_sub384 --steps 60000 \
      --batch-size 128 --normalizer-dataset dataset/EnvPredator_v2 \
      --log-file logs/train_pc_v2_sub384.jsonl \
      > logs/train_pc_v2_sub384.out 2>&1 || echo "SUB384 TRAIN FAILED"
  python scripts/export_weights.py \
      --checkpoints checkpoints/predator_pc_v2_sub384 \
      --dataset dataset/EnvPredatorPC_v2_sub384 \
      --out artifacts/weights/predator_pc_v2_sub384.npz \
      > logs/export_pc_v2_sub384.out 2>&1 || echo "SUB384 EXPORT FAILED"
fi

if [ ! -f eval_results_dynamic_pc_v2_sub384_paper.json ] && \
   [ -f artifacts/weights/predator_pc_v2_sub384.npz ]; then
  log "B1: swept@384 on the 100x10 paper grid"
  python scripts/inference_dynamic.py --dataset dataset/EnvPredator_v2 \
      --checkpoints artifacts/weights/predator_pc_v2_sub384.npz \
      --pursuer-conditioned --pursuer-sweep-steps 8 \
      --n-contexts 100 --n-experiments 10 \
      --results eval_results_dynamic_pc_v2_sub384_paper.json \
      > logs/eval_pc_v2_sub384_paper.out 2>&1 || echo "SUB384 PAPER FAILED"
fi

# ---- B2: obstacle-rich swept + 8x data
log "B2: waiting for dataset/EnvPredatorObs_v2 generation (3072 dirs)"
for _ in $(seq 1 240); do
  n=$(ls dataset/EnvPredatorObs_v2 2>/dev/null | wc -l)
  [ -f dataset/EnvPredatorObs_v2/.done ] && break
  sleep 60
done
if [ ! -f dataset/EnvPredatorObs_v2/.done ]; then
  log "B2: dataset generation never finished ($(ls dataset/EnvPredatorObs_v2 2>/dev/null | wc -l) dirs) — skipping obs leg"
  log "stage B done (partial)"
  exit 0
fi

if [ ! -f artifacts/weights/predator_obs_v2.npz ]; then
  log "B2: train obs swept+8x (60k)"
  python scripts/train.py --dataset dataset/EnvPredatorObs_v2 \
      --checkpoints checkpoints/predator_obs_v2 --steps 60000 \
      --batch-size 128 --normalizer-dataset dataset/EnvPredatorObs_v1 \
      --log-file logs/train_predator_obs_v2.jsonl \
      > logs/train_predator_obs_v2.out 2>&1 || echo "OBS V2 TRAIN FAILED"
  python scripts/export_weights.py --checkpoints checkpoints/predator_obs_v2 \
      --dataset dataset/EnvPredatorObs_v2 \
      --out artifacts/weights/predator_obs_v2.npz \
      > logs/export_obs_v2.out 2>&1 || echo "OBS V2 EXPORT FAILED"
fi

if [ ! -f eval_results_predator_obs_v2_50x4.json ] && \
   [ -f artifacts/weights/predator_obs_v2.npz ]; then
  log "B2: obs v2 on the 50x4 grid (swept conditioning)"
  python scripts/inference_dynamic.py --dataset dataset/EnvPredatorObs_v1 \
      --checkpoints artifacts/weights/predator_obs_v2.npz \
      --pursuer-conditioned --pursuer-sweep-steps 8 \
      --n-contexts 50 --n-experiments 4 \
      --results eval_results_predator_obs_v2_50x4.json \
      > logs/eval_obs_v2_50x4.out 2>&1 || echo "OBS V2 50x4 FAILED"
fi

if [ ! -f eval_results_predator_obs_v2_paper.json ] && \
   [ -f artifacts/weights/predator_obs_v2.npz ]; then
  log "B2: obs v2 on the 100x10 paper grid"
  python scripts/inference_dynamic.py --dataset dataset/EnvPredatorObs_v1 \
      --checkpoints artifacts/weights/predator_obs_v2.npz \
      --pursuer-conditioned --pursuer-sweep-steps 8 \
      --n-contexts 100 --n-experiments 10 \
      --results eval_results_predator_obs_v2_paper.json \
      > logs/eval_obs_v2_paper.out 2>&1 || echo "OBS V2 PAPER FAILED"
fi

log "stage B done"
