#!/usr/bin/env bash
# Round-4 stage D: clock-aware takeover of the B2 obs leg + stage-C tail.
# The obs-v2 training measured 109 ms/step (9-row clouds) — 60k steps would
# have eaten the remaining round; the PreemptionGuard checkpointed the 60k
# run at step 1600 and this stage resumes it to a 30k budget, then runs the
# remaining measurements in strict priority order (paper grid > serving
# bench > 50x4 > gated APF reruns > compose sweep > final bench) so the
# clock cuts the least important tail.
# Run as:
#   nohup bash scripts/chip_queue_r4d.sh > logs/chip_queue_r4d.out 2>&1 &
set -u
cd "$(dirname "$0")/.."
mkdir -p logs
log() { echo "=== $(date -u +%H:%M:%S) $*"; }

if [ ! -f artifacts/weights/predator_obs_v2.npz ]; then
  log "D1: resume obs swept+8x train to 30k (109 ms/step; 60k would bust the clock)"
  python scripts/train.py --dataset dataset/EnvPredatorObs_v2 \
      --checkpoints checkpoints/predator_obs_v2 --steps 30000 \
      --batch-size 128 --normalizer-dataset dataset/EnvPredatorObs_v1 \
      --log-file logs/train_predator_obs_v2.jsonl \
      > logs/train_predator_obs_v2_30k.out 2>&1 || echo "OBS V2 TRAIN FAILED"
  python scripts/export_weights.py --checkpoints checkpoints/predator_obs_v2 \
      --dataset dataset/EnvPredatorObs_v2 \
      --out artifacts/weights/predator_obs_v2.npz \
      > logs/export_obs_v2.out 2>&1 || echo "OBS V2 EXPORT FAILED"
fi

if [ ! -f eval_results_predator_obs_v2_paper.json ] && \
   [ -f artifacts/weights/predator_obs_v2.npz ]; then
  log "D2: obs v2 on the 100x10 paper grid (the VERDICT item-5 bar)"
  python scripts/inference_dynamic.py --dataset dataset/EnvPredatorObs_v1 \
      --checkpoints artifacts/weights/predator_obs_v2.npz \
      --pursuer-conditioned --pursuer-sweep-steps 8 \
      --n-contexts 100 --n-experiments 10 \
      --results eval_results_predator_obs_v2_paper.json \
      > logs/eval_obs_v2_paper.out 2>&1 || echo "OBS V2 PAPER FAILED"
fi

if [ ! -f artifacts/bench_serve.json ]; then
  log "D3: bench_serve retry (warm calls now pass timeout=1800)"
  python scripts/bench_serve.py --out artifacts/bench_serve.json \
      > logs/bench_serve.out 2>&1 || echo "BENCH SERVE FAILED AGAIN"
fi

if [ ! -f eval_results_predator_obs_v2_50x4.json ] && \
   [ -f artifacts/weights/predator_obs_v2.npz ]; then
  log "D4: obs v2 on the 50x4 grid"
  python scripts/inference_dynamic.py --dataset dataset/EnvPredatorObs_v1 \
      --checkpoints artifacts/weights/predator_obs_v2.npz \
      --pursuer-conditioned --pursuer-sweep-steps 8 \
      --n-contexts 50 --n-experiments 4 \
      --results eval_results_predator_obs_v2_50x4.json \
      > logs/eval_obs_v2_50x4.out 2>&1 || echo "OBS V2 50x4 FAILED"
fi

if [ ! -f eval_results_static_v4_300k_apf.json ]; then
  log "D5: APF on the v4_300k flagship under the gate"
  python scripts/inference_static.py --dataset dataset/EnvSimple2dquant_v2 \
      --checkpoints artifacts/weights/simple2d_v4_300k.npz \
      --n-contexts 20 --n-samples 20 --use-apf \
      --results eval_results_static_v4_300k_apf.json \
      > logs/eval_static_v4_300k_apf.out 2>&1 || echo "V4 APF FAILED"
fi

if [ ! -f eval_results_compose_gated.json ]; then
  log "D6: hard2d compose rerun under the gate"
  python scripts/inference_static.py --dataset dataset/EnvHard2dquant_v2 \
      --checkpoints artifacts/weights/hard2d_v2.npz \
      --compose --use-apf --n-contexts 10 --n-samples 20 \
      --results eval_results_compose_gated.json \
      > logs/eval_compose_gated.out 2>&1 || echo "COMPOSE GATED FAILED"
fi

for ws in "3 5" "5 3" "4 6" "6 4"; do
  set -- $ws
  w1=$1; w2=$2
  out="eval_results_3d_grid_compose_w${w1}${w2}.json"
  if [ ! -f "$out" ]; then
    log "D7: 3-D compose sweep w1=$w1 w2=$w2"
    python scripts/inference3d.py --dataset dataset/EnvSmall3D_v2 \
        --compose-dataset dataset/EnvSmall3D_v2b \
        --checkpoints artifacts/weights/planner3d_v2.npz \
        --max-envs 12 --n-contexts 5 --n-samples 4 \
        --compose-weights "$w1" "$w2" \
        --results "$out" \
        > "logs/eval_3d_compose_w${w1}${w2}.out" 2>&1 \
        || echo "SWEEP $w1/$w2 FAILED"
  fi
done

if [ ! -f eval_results_3d_grid_compose_rs4.json ]; then
  log "D7: 3-D compose resample_steps=4"
  python scripts/inference3d.py --dataset dataset/EnvSmall3D_v2 \
      --compose-dataset dataset/EnvSmall3D_v2b \
      --checkpoints artifacts/weights/planner3d_v2.npz \
      --max-envs 12 --n-contexts 5 --n-samples 4 --cfg-weight 4 \
      --resample-steps 4 \
      --results eval_results_3d_grid_compose_rs4.json \
      > logs/eval_3d_compose_rs4.out 2>&1 || echo "RS4 FAILED"
fi

if [ ! -f logs/bench_r4_final.json ]; then
  log "D8: final bench"
  python bench.py > logs/bench_r4_final.json 2>logs/bench_r4_final.err \
      || echo "BENCH FAILED"
fi

log "stage D done"
