#!/usr/bin/env bash
# Round-3 stage A: settle the static flagship (VERDICT item 4).
# Resume simple2d_v4 from 120k to 300k (the checkpoint was saved for exactly
# this), export a separate 300k npz, run the full 96x20x20 grid at parity and
# d4w5, then probe-sweep CFG/DDIM knobs ON the 300k weights (the v2-derived
# presets demonstrably don't transfer).
# Run as:
#   nohup bash scripts/chip_queue_r3a.sh > logs/chip_queue_r3a.out 2>&1 &
set -u
cd "$(dirname "$0")/.."
mkdir -p logs
log() { echo "=== $(date -u +%H:%M:%S) $*"; }

if [ ! -d checkpoints/simple2d_v4/300000 ]; then
  log "v4 resume 120k -> 300k"
  python scripts/train.py \
      --dataset dataset/EnvSimple2dquant_v2,dataset/EnvSimple2dquant_v2b,dataset/EnvSimple2dquant_xl,dataset/EnvSimple2dquant_v3 \
      --checkpoints checkpoints/simple2d_v4 --steps 300000 \
      --batch-size 128 --normalizer-dataset dataset/EnvSimple2dquant_v2 \
      --log-file logs/train_simple2d_v4_300k.jsonl \
      > logs/train_simple2d_v4_300k.out 2>&1 || echo "V4 RESUME FAILED"
fi

if [ ! -f artifacts/weights/simple2d_v4_300k.npz ]; then
  log "export v4_300k"
  python scripts/export_weights.py --checkpoints checkpoints/simple2d_v4 \
      --dataset dataset/EnvSimple2dquant_v2 \
      --out artifacts/weights/simple2d_v4_300k.npz \
      > logs/export_v4_300k.out 2>&1 || echo "EXPORT FAILED"
fi

if [ ! -f eval_results_static_v4_300k.json ]; then
  log "v4_300k parity full grid"
  python scripts/inference_static.py --dataset dataset/EnvSimple2dquant_v2 \
      --checkpoints artifacts/weights/simple2d_v4_300k.npz \
      --n-contexts 20 --n-samples 20 \
      --results eval_results_static_v4_300k.json \
      > logs/eval_static_v4_300k.out 2>&1 || echo "PARITY FAILED"
fi

if [ ! -f eval_results_static_v4_300k_d4w5.json ]; then
  log "v4_300k d4w5 full grid"
  python scripts/inference_static.py --dataset dataset/EnvSimple2dquant_v2 \
      --checkpoints artifacts/weights/simple2d_v4_300k.npz \
      --n-contexts 20 --n-samples 20 --ddim-steps 4 --cfg-weight 5 \
      --results eval_results_static_v4_300k_d4w5.json \
      > logs/eval_static_v4_300k_d4w5.out 2>&1 || echo "D4W5 FAILED"
fi

# CFG/DDIM probe sweep on the 300k weights (24x10x20 subgrid, ~3 min each).
for cfg in "5 3" "5 4" "4 3" "4 4" "4 6" "3 5"; do
  set -- $cfg
  d=$1; w=$2
  out="eval_ab_v4300k_d${d}w${w}.json"
  if [ ! -f "$out" ]; then
    log "v4_300k probe d=$d w=$w"
    python scripts/inference_static.py --dataset dataset/EnvSimple2dquant_v2 \
        --checkpoints artifacts/weights/simple2d_v4_300k.npz \
        --max-envs 24 --n-contexts 10 --n-samples 20 \
        --ddim-steps "$d" --cfg-weight "$w" \
        --results "$out" \
        > "logs/eval_v4300k_d${d}w${w}.out" 2>&1 || echo "PROBE $d/$w FAILED"
  fi
done

log "stage A done"
