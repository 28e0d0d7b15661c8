#!/usr/bin/env bash
# Continue the flagship static model (v2-only lineage) past 300k steps using
# --init-weights from the committed npz export, in two 60k legs with an
# export + committable snapshot after each leg (checkpoints/ is ephemeral;
# artifacts/weights/ is what survives).
#
# Waits for the quality A/B (pid in /tmp/qab2.pid) to release the TPU.
set -u
cd "$(dirname "$0")/.."
mkdir -p logs artifacts/weights

if [ -f /tmp/qab2.pid ]; then
  P=$(cat /tmp/qab2.pid)
  while kill -0 "$P" 2>/dev/null; do sleep 60; done
fi

log() { echo "=== $(date -u +%H:%M:%S) $*"; }
DS=dataset/EnvSimple2dquant_v2
CKPT=checkpoints/simple2d_v2ft

for leg in 60000 120000; do
  log "fine-tune leg to step $leg"
  python scripts/train.py --dataset $DS --checkpoints $CKPT \
      --init-weights artifacts/weights/simple2d_v2.npz --batch-size 128 \
      --steps $leg --log-file logs/simple2d_v2ft.jsonl \
      > logs/simple2d_v2ft.out 2>&1 || { echo "train leg $leg FAILED"; exit 1; }
  log "export at step $leg"
  # per-leg snapshot so a later leg (or a round boundary wiping
  # checkpoints/) cannot destroy the earlier one
  python scripts/export_weights.py --checkpoints $CKPT --dataset $DS \
      --out artifacts/weights/simple2d_v2_ft_${leg}.npz \
      >> logs/simple2d_v2ft.out 2>&1
  cp artifacts/weights/simple2d_v2_ft_${leg}.npz \
     artifacts/weights/simple2d_v2_ft.npz
done

log "eval fine-tuned plain grid (parity w=2)"
python scripts/inference_static.py --dataset $DS \
    --checkpoints artifacts/weights/simple2d_v2_ft.npz --n-contexts 20 \
    --n-samples 20 --results eval_results_static_ft.json \
    > logs/eval_static_ft.out 2>&1
log "eval fine-tuned plain grid (tuned w=3)"
python scripts/inference_static.py --dataset $DS \
    --checkpoints artifacts/weights/simple2d_v2_ft.npz --n-contexts 20 \
    --n-samples 20 --cfg-weight 3 --results eval_results_static_ft_w3.json \
    > logs/eval_static_ft_w3.out 2>&1
log "fine-tune campaign done"
