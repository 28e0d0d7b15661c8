#!/usr/bin/env bash
# Post-training pipeline: waits for the training campaign (pid in
# /tmp/campaign_s2.pid) to release the TPU, then exports committable
# weights and runs the full evaluation grid on the real chip.
set -u
cd "$(dirname "$0")/.."
mkdir -p logs artifacts/weights gifs

if [ -f /tmp/campaign_s2.pid ]; then
  P=$(cat /tmp/campaign_s2.pid)
  while kill -0 "$P" 2>/dev/null; do sleep 60; done
fi

log() { echo "=== $(date -u +%H:%M:%S) $*"; }

log export weights
# NOTE: simple2d_v2.npz (the 300k v2-only snapshot) is exported by
# session2_campaign.sh BEFORE the combined-data run overwrites the
# checkpoint lineage; here we export the rest + the combined run.
python scripts/export_weights.py --checkpoints checkpoints/simple2d_v2 \
    --dataset dataset/EnvSimple2dquant_v2 --out artifacts/weights/simple2d_v2ab.npz
python scripts/export_weights.py --checkpoints checkpoints/hard2d_v2 \
    --dataset dataset/EnvHard2dquant_v2 --out artifacts/weights/hard2d_v2.npz
python scripts/export_weights.py --checkpoints checkpoints/predator_v2 \
    --dataset dataset/EnvPredator_v2 --out artifacts/weights/predator_v2.npz
python scripts/export_weights.py --checkpoints checkpoints/planner3d_v2 --threed \
    --dataset dataset/EnvSmall3D_v2 --out artifacts/weights/planner3d_v2.npz

for w in artifacts/weights/simple2d_v2.npz; do
  [ -f "$w" ] || { echo "FATAL: $w missing (session2_campaign export did not run)" >&2; exit 1; }
done

log static eval simple2d plain - 300k v2-only weights
python scripts/inference_static.py --dataset dataset/EnvSimple2dquant_v2 \
    --checkpoints artifacts/weights/simple2d_v2.npz --n-contexts 20 \
    --n-samples 20 --results eval_results_static_300k.json \
    > logs/eval_static_300k.out 2>&1
log static eval simple2d plain - combined v2+v2b weights
python scripts/inference_static.py --dataset dataset/EnvSimple2dquant_v2 \
    --checkpoints artifacts/weights/simple2d_v2ab.npz --n-contexts 20 \
    --n-samples 20 --results eval_results_static_400k.json \
    --plots-dir plots_eval > logs/eval_static_400k.out 2>&1
log static eval simple2d apf - combined weights
python scripts/inference_static.py --dataset dataset/EnvSimple2dquant_v2 \
    --checkpoints artifacts/weights/simple2d_v2ab.npz --n-contexts 20 \
    --n-samples 20 --use-apf --results eval_results_static_apf.json \
    > logs/eval_static_apf.out 2>&1
log static eval hard2d compose+apf
python scripts/inference_static.py --dataset dataset/EnvHard2dquant_v2 \
    --checkpoints checkpoints/hard2d_v2 --max-envs 48 --n-contexts 10 \
    --n-samples 20 --compose --use-apf \
    --results eval_results_compose.json > logs/eval_compose.out 2>&1
log dynamic eval predator
python scripts/inference_dynamic.py --dataset dataset/EnvPredator_v2 \
    --checkpoints checkpoints/predator_v2 --n-contexts 50 --n-experiments 4 \
    --n-samples 35 --results eval_results_dynamic.json --gif-dir gifs \
    > logs/eval_dynamic.out 2>&1
log 3d eval
python scripts/inference3d.py --dataset dataset/EnvSmall3D_v2 \
    --checkpoints checkpoints/planner3d_v2 --n-samples 4 \
    --results eval_results_3d.json > logs/eval_3d.out 2>&1
log 3d compose eval
python scripts/inference3d.py --dataset dataset/EnvSmall3D_v2 \
    --compose-dataset dataset/EnvSmall3D_v2b \
    --checkpoints checkpoints/planner3d_v2 --n-samples 4 \
    --results eval_results_3d_compose.json > logs/eval_3d_compose.out 2>&1
log bench
python bench.py > logs/bench_post.json 2>logs/bench_post.err
log eval campaign done
