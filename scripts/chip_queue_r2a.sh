#!/usr/bin/env bash
# Round-2 training stage A: the three retrains motivated by VERDICT.md
# ("scale the dataset, not the steps" / "make the dynamic model see a
# pursuer" / "cover the obstacle-rich predator scenario"), shortest first
# so eval work can start while the long static run grinds:
#   1. pursuer-conditioned dynamic model on EnvPredatorPC_v1
#      (384 scenes x 16 pursuer-aware demos, 5-row clouds), 60k steps
#      (the measured dynamic sweet spot — 120k scored WORSE, RESULTS.md)
#   2. obstacle-rich pursuit model on EnvPredatorObs_v1 (8 boxes +
#      pursuer row), 60k steps
#   3. static model from scratch on 8x scenes (v2+v2b+xl+v3 = 768),
#      180k steps, normalizer pinned to the v2 eval root
# Each run exports an .npz immediately so evals never depend on orbax dirs.
# Run as:
#   nohup bash scripts/chip_queue_r2a.sh > logs/chip_queue_r2a.out 2>&1 &
set -u
cd "$(dirname "$0")/.."
mkdir -p logs

log() { echo "=== $(date -u +%H:%M:%S) $*"; }

if [ ! -f artifacts/weights/predator_pc_v1.npz ]; then
  log "train pursuer-conditioned predator (60k)"
  python scripts/train.py --dataset dataset/EnvPredatorPC_v1 \
      --checkpoints checkpoints/predator_pc_v1 --steps 60000 \
      --batch-size 128 --normalizer-dataset dataset/EnvPredator_v2 \
      --log-file logs/train_predator_pc_v1.jsonl \
      > logs/train_predator_pc_v1.out 2>&1 || echo "PC TRAIN FAILED"
  python scripts/export_weights.py --checkpoints checkpoints/predator_pc_v1 \
      --dataset dataset/EnvPredatorPC_v1 \
      --out artifacts/weights/predator_pc_v1.npz \
      > logs/export_pc.out 2>&1 || echo "PC EXPORT FAILED"
fi

if [ ! -f artifacts/weights/predator_obs_v1.npz ]; then
  log "train obstacle-rich predator (60k)"
  python scripts/train.py --dataset dataset/EnvPredatorObs_v1 \
      --checkpoints checkpoints/predator_obs_v1 --steps 60000 \
      --batch-size 128 \
      --log-file logs/train_predator_obs_v1.jsonl \
      > logs/train_predator_obs_v1.out 2>&1 || echo "OBS TRAIN FAILED"
  python scripts/export_weights.py --checkpoints checkpoints/predator_obs_v1 \
      --dataset dataset/EnvPredatorObs_v1 \
      --out artifacts/weights/predator_obs_v1.npz \
      > logs/export_obs.out 2>&1 || echo "OBS EXPORT FAILED"
fi

if [ ! -f artifacts/weights/simple2d_v4.npz ]; then
  log "train static on 8x scenes (180k)"
  python scripts/train.py \
      --dataset dataset/EnvSimple2dquant_v2,dataset/EnvSimple2dquant_v2b,dataset/EnvSimple2dquant_xl,dataset/EnvSimple2dquant_v3 \
      --checkpoints checkpoints/simple2d_v4 --steps 180000 \
      --batch-size 128 --normalizer-dataset dataset/EnvSimple2dquant_v2 \
      --log-file logs/train_simple2d_v4.jsonl \
      > logs/train_simple2d_v4.out 2>&1 || echo "STATIC TRAIN FAILED"
  python scripts/export_weights.py --checkpoints checkpoints/simple2d_v4 \
      --dataset dataset/EnvSimple2dquant_v2 \
      --out artifacts/weights/simple2d_v4.npz \
      > logs/export_v4.out 2>&1 || echo "STATIC EXPORT FAILED"
fi

log "stage A done"
