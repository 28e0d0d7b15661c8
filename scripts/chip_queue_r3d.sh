#!/usr/bin/env bash
# Round-3 stage D: opportunistic tail (runs only if the round clock allows).
#  - attention-lowering A/B at real shapes (roofline item)
#  - PC v2 120k continuation + 50x4 (the data-scaled family's step sweep)
#  - final bench measurement for session stability
# Run as:
#   nohup bash scripts/chip_queue_r3d.sh <r3c_pid> > logs/chip_queue_r3d.out 2>&1 &
set -u
cd "$(dirname "$0")/.."
mkdir -p logs
log() { echo "=== $(date -u +%H:%M:%S) $*"; }

WAIT_PID=${1:-}
if [ -n "$WAIT_PID" ]; then
  log "waiting for stage C pid $WAIT_PID"
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 60; done
fi

if [ ! -f logs/bench_attn_ab_r3.out ]; then
  log "attention lowering A/B"
  python scripts/bench_attn_ab.py > logs/bench_attn_ab_r3.out 2>&1 \
      || echo "ATTN AB FAILED"
fi

if [ ! -f artifacts/weights/predator_pc_v2_120k.npz ]; then
  log "PC v2 resume to 120k"
  python scripts/train.py --dataset dataset/EnvPredatorPC_v2 \
      --checkpoints checkpoints/predator_pc_v2 --steps 120000 \
      --batch-size 128 --normalizer-dataset dataset/EnvPredator_v2 \
      --log-file logs/train_predator_pc_v2_120k.jsonl \
      > logs/train_predator_pc_v2_120k.out 2>&1 || echo "PC V2 120K FAILED"
  python scripts/export_weights.py --checkpoints checkpoints/predator_pc_v2 \
      --dataset dataset/EnvPredatorPC_v2 \
      --out artifacts/weights/predator_pc_v2_120k.npz \
      > logs/export_pc_v2_120k.out 2>&1 || echo "PC V2 120K EXPORT FAILED"
fi

if [ ! -f eval_results_dynamic_pc_v2_120k_50x4.json ]; then
  log "PC v2 120k on the 50x4 grid"
  python scripts/inference_dynamic.py --dataset dataset/EnvPredator_v2 \
      --checkpoints artifacts/weights/predator_pc_v2_120k.npz \
      --pursuer-conditioned --pursuer-sweep-steps 8 \
      --n-contexts 50 --n-experiments 4 \
      --results eval_results_dynamic_pc_v2_120k_50x4.json \
      > logs/eval_dynamic_pc_v2_120k_50x4.out 2>&1 \
      || echo "PC V2 120K 50x4 FAILED"
fi

if [ ! -f logs/bench_r3_final.json ]; then
  log "final bench"
  python bench.py > logs/bench_r3_final.json 2>logs/bench_r3_final.err \
      || echo "BENCH FAILED"
fi

log "stage D done"
