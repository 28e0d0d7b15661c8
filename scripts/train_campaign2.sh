#!/usr/bin/env bash
# Follow-up campaign: waits for the static run (pid in /tmp/run1.pid, if any)
# to release the TPU, then trains the remaining model families on the v2
# (via-point diversity, 96-scene) datasets.
set -u
cd "$(dirname "$0")/.."
mkdir -p logs

if [ -f /tmp/run1.pid ]; then
  P=$(cat /tmp/run1.pid)
  while kill -0 "$P" 2>/dev/null; do sleep 30; done
fi

run() {
  name=$1; shift
  echo "=== $(date -u +%H:%M:%S) training $name ==="
  python scripts/train.py "$@" --log-file "logs/${name}.jsonl" \
    > "logs/${name}.out" 2>&1
  echo "=== $(date -u +%H:%M:%S) $name exit=$? ==="
}

run hard2d_v2 --dataset dataset/EnvHard2dquant_v2 \
    --checkpoints checkpoints/hard2d_v2 --steps 60000 --batch-size 128
run predator_v2 --dataset dataset/EnvPredator_v2 \
    --checkpoints checkpoints/predator_v2 --steps 60000 --batch-size 128
run planner3d_v2 --dataset dataset/EnvSmall3D_v2 --threed \
    --checkpoints checkpoints/planner3d_v2 --steps 40000 --batch-size 64
echo "=== campaign2 done $(date -u +%H:%M:%S) ==="
