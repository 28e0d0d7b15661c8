#!/usr/bin/env bash
# Round-3 stage B: the swept pursuer-conditioning push (VERDICT item 3).
# Train on EnvPredatorPC_v2 (3072 scenes x 16 demos, 8x round-2 scale,
# sweep_steps=8 predictive capsules), eval 50x4, and if the probe holds up
# run the 100x10 paper grid (the twice-missed done-bar: CI excludes 0.646).
# Then continue to 120k and eval that leg too.
# Run as:
#   nohup bash scripts/chip_queue_r3b.sh <r3a_pid> > logs/chip_queue_r3b.out 2>&1 &
set -u
cd "$(dirname "$0")/.."
mkdir -p logs
log() { echo "=== $(date -u +%H:%M:%S) $*"; }

WAIT_PID=${1:-}
if [ -n "$WAIT_PID" ]; then
  log "waiting for stage A pid $WAIT_PID"
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 60; done
fi

if [ ! -f artifacts/weights/predator_pc_v2_60k.npz ]; then
  log "PC v2 train 60k (swept, 8x data)"
  python scripts/train.py --dataset dataset/EnvPredatorPC_v2 \
      --checkpoints checkpoints/predator_pc_v2 --steps 60000 \
      --batch-size 128 --normalizer-dataset dataset/EnvPredator_v2 \
      --log-file logs/train_predator_pc_v2.jsonl \
      > logs/train_predator_pc_v2.out 2>&1 || echo "PC V2 TRAIN FAILED"
  python scripts/export_weights.py --checkpoints checkpoints/predator_pc_v2 \
      --dataset dataset/EnvPredatorPC_v2 \
      --out artifacts/weights/predator_pc_v2_60k.npz \
      > logs/export_pc_v2_60k.out 2>&1 || echo "PC V2 EXPORT FAILED"
fi

if [ ! -f eval_results_dynamic_pc_v2_50x4.json ]; then
  log "PC v2 60k on the 50x4 grid"
  python scripts/inference_dynamic.py --dataset dataset/EnvPredator_v2 \
      --checkpoints artifacts/weights/predator_pc_v2_60k.npz \
      --pursuer-conditioned --pursuer-sweep-steps 8 \
      --n-contexts 50 --n-experiments 4 \
      --results eval_results_dynamic_pc_v2_50x4.json \
      > logs/eval_dynamic_pc_v2_50x4.out 2>&1 || echo "PC V2 50x4 FAILED"
fi

score=$(python -c "import json;print(json.load(open('eval_results_dynamic_pc_v2_50x4.json'))['aggregate']['score'])" 2>/dev/null || echo 0)
log "PC v2 60k 50x4 score: $score"
good=$(python -c "print(1 if float('$score' or 0) >= 0.70 else 0)")

if [ "$good" = "1" ] && [ ! -f eval_results_dynamic_pc_v2_paper.json ]; then
  log "PC v2 60k on the 100x10 paper grid"
  python scripts/inference_dynamic.py --dataset dataset/EnvPredator_v2 \
      --checkpoints artifacts/weights/predator_pc_v2_60k.npz \
      --pursuer-conditioned --pursuer-sweep-steps 8 \
      --n-contexts 100 --n-experiments 10 \
      --results eval_results_dynamic_pc_v2_paper.json \
      > logs/eval_dynamic_pc_v2_paper.out 2>&1 || echo "PC V2 PAPER FAILED"
fi

# (The 120k continuation leg was cut for round-3 chip budget: round 2
# measured extra steps HURTING closed-loop dynamic score, and stage C's
# attribution/gate/profile work ranks higher. checkpoints/predator_pc_v2
# resumes if a later round wants the leg.)

log "stage B done"
