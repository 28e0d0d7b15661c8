#!/usr/bin/env bash
# Continuation campaign (round-1 session 2): waits for the static v2 run
# (pid in /tmp/train.pid) to release the TPU, then:
#   1. exports the 300k static weights,
#   2. A/Bs the attention lowering on the real chip,
#   3. continues hard2d/predator/3d training,
#   4. runs the combined v2+v2b static data run.
set -u
cd "$(dirname "$0")/.."
mkdir -p logs artifacts/weights

if [ -f /tmp/train.pid ]; then
  P=$(cat /tmp/train.pid)
  while kill -0 "$P" 2>/dev/null; do sleep 30; done
fi

log() { echo "=== $(date -u +%H:%M:%S) $*"; }

log export simple2d 300k weights
python scripts/export_weights.py --checkpoints checkpoints/simple2d_v2 \
    --dataset dataset/EnvSimple2dquant_v2 --out artifacts/weights/simple2d_v2.npz \
    >> logs/export.out 2>&1

log attention A/B on chip
python scripts/bench_attn_ab.py --impls default bnhd flash \
    > logs/attn_ab.json 2> logs/attn_ab.err

run() {
  name=$1; shift
  log training "$name"
  python scripts/train.py "$@" --log-file "logs/${name}.jsonl" \
    > "logs/${name}.out" 2>&1
  log "$name" exit=$?
}

run hard2d_v2 --dataset dataset/EnvHard2dquant_v2 \
    --checkpoints checkpoints/hard2d_v2 --steps 120000 --batch-size 128
run predator_v2 --dataset dataset/EnvPredator_v2 \
    --checkpoints checkpoints/predator_v2 --steps 120000 --batch-size 128
run planner3d_v2 --dataset dataset/EnvSmall3D_v2 --threed \
    --checkpoints checkpoints/planner3d_v2 --steps 80000 --batch-size 64

log combined-data static run v2+v2b
# --normalizer-dataset keeps the combined run in the v2 normalization space
# so the 300k-vs-400k eval A/B (and the resumed checkpoint) stay comparable
run simple2d_v2ab --dataset dataset/EnvSimple2dquant_v2,dataset/EnvSimple2dquant_v2b \
    --normalizer-dataset dataset/EnvSimple2dquant_v2 \
    --checkpoints checkpoints/simple2d_v2 --steps 400000 --batch-size 128

log session2 campaign done
