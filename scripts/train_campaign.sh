#!/usr/bin/env bash
# Sequential training campaign on the single TPU chip: all four model
# families, checkpoints under checkpoints/, JSONL logs under logs/.
# Usage: bash scripts/train_campaign.sh
set -u
cd "$(dirname "$0")/.."
mkdir -p logs

run() {
  name=$1; shift
  echo "=== $(date -u +%H:%M:%S) training $name ==="
  python scripts/train.py "$@" --log-file "logs/${name}.jsonl" \
    > "logs/${name}.out" 2>&1
  echo "=== $(date -u +%H:%M:%S) $name exit=$? ==="
}

run simple2d_v2 --dataset dataset/EnvSimple2dquant_v2 \
    --checkpoints checkpoints/simple2d_v2 --steps 100000 --batch-size 128
run hard2d --dataset dataset/EnvHard2dquant \
    --checkpoints checkpoints/hard2d --steps 60000 --batch-size 128
run predator --dataset dataset/EnvPredator \
    --checkpoints checkpoints/predator --steps 60000 --batch-size 128
run planner3d --dataset dataset/EnvSmall3D --threed \
    --checkpoints checkpoints/planner3d --steps 40000 --batch-size 64
echo "=== campaign done $(date -u +%H:%M:%S) ==="
