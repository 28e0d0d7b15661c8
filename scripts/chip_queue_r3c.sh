#!/usr/bin/env bash
# Round-3 stage C: attribution + honest-metric reruns + perf measurements.
#  1. obstacle-rich family: non-live-conditioned 50x4 A/B + 100x10 paper grid
#     (VERDICT item 6 — attribute the 0.755)
#  2. 3-D compose baseline + APF reruns under the round-3 path-sanity gate
#     (+ per-row start/goal for analyze_3d_cells) and the (w1,w2) sweep
#     (items 2 & 8)
#  3. static APF full grid under the gate (the 1.000/8.96-path headline
#     needs an honest number)
#  4. serving-path latency (bench_serve) + per-kernel profile trace (items
#     5 & 7)
# Run as:
#   nohup bash scripts/chip_queue_r3c.sh <r3b_pid> > logs/chip_queue_r3c.out 2>&1 &
set -u
cd "$(dirname "$0")/.."
mkdir -p logs
log() { echo "=== $(date -u +%H:%M:%S) $*"; }

WAIT_PID=${1:-}
if [ -n "$WAIT_PID" ]; then
  log "waiting for stage B pid $WAIT_PID"
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 60; done
fi

if [ ! -f eval_results_predator_obs_noncond.json ]; then
  log "obs 50x4 WITHOUT live conditioning (attribution A/B)"
  python scripts/inference_dynamic.py --dataset dataset/EnvPredatorObs_v1 \
      --checkpoints artifacts/weights/predator_obs_v1.npz \
      --n-contexts 50 --n-experiments 4 \
      --results eval_results_predator_obs_noncond.json \
      > logs/eval_predator_obs_noncond.out 2>&1 || echo "OBS NONCOND FAILED"
fi

if [ ! -f eval_results_3d_grid_compose_r3.json ]; then
  log "3-D compose baseline rerun (gate + start/goal rows)"
  python scripts/inference3d.py --dataset dataset/EnvSmall3D_v2 \
      --compose-dataset dataset/EnvSmall3D_v2b \
      --checkpoints artifacts/weights/planner3d_v2.npz \
      --max-envs 12 --n-contexts 5 --n-samples 4 --cfg-weight 4 \
      --results eval_results_3d_grid_compose_r3.json \
      > logs/eval_3d_compose_r3.out 2>&1 || echo "COMPOSE R3 FAILED"
  python scripts/analyze_3d_cells.py \
      --results eval_results_3d_grid_compose_r3.json \
      --dataset dataset/EnvSmall3D_v2 \
      --compose-dataset dataset/EnvSmall3D_v2b \
      --out artifacts/analysis_3d_compose_cells.json \
      > logs/analyze_3d_cells.out 2>&1 || echo "CELL ANALYSIS FAILED"
fi

if [ ! -f eval_results_3d_grid_compose_apf_r3.json ]; then
  log "3-D compose APF rerun under the path gate"
  python scripts/inference3d.py --dataset dataset/EnvSmall3D_v2 \
      --compose-dataset dataset/EnvSmall3D_v2b \
      --checkpoints artifacts/weights/planner3d_v2.npz \
      --max-envs 12 --n-contexts 5 --n-samples 4 --cfg-weight 4 \
      --use-apf \
      --results eval_results_3d_grid_compose_apf_r3.json \
      > logs/eval_3d_compose_apf_r3.out 2>&1 || echo "COMPOSE APF R3 FAILED"
fi

if [ ! -f eval_results_static_apf_r3.json ]; then
  log "static APF full grid under the path gate"
  python scripts/inference_static.py --dataset dataset/EnvSimple2dquant_v2 \
      --checkpoints artifacts/weights/simple2d_v2.npz \
      --n-contexts 20 --n-samples 20 --use-apf \
      --results eval_results_static_apf_r3.json \
      > logs/eval_static_apf_r3.out 2>&1 || echo "STATIC APF R3 FAILED"
fi

if [ ! -f artifacts/bench_serve.json ]; then
  log "serving-path latency"
  python scripts/bench_serve.py --out artifacts/bench_serve.json \
      > logs/bench_serve.out 2>&1 || echo "BENCH SERVE FAILED"
fi

if [ ! -d logs/prof_r3 ]; then
  log "per-kernel profile trace"
  python scripts/profile_static.py --trace logs/prof_r3 \
      > logs/profile_r3.json 2>logs/profile_r3.err || echo "PROFILE FAILED"
  python scripts/analyze_trace.py --trace-dir logs/prof_r3 \
      --out artifacts/trace_top_kernels.json \
      > logs/analyze_trace.out 2>&1 || echo "TRACE ANALYZE FAILED"
fi

if [ ! -f logs/bench_remat_ab.out ]; then
  log "eps_remat A/B"
  python scripts/bench_remat_ab.py > logs/bench_remat_ab.out 2>&1 \
      || echo "REMAT AB FAILED"
fi

if [ ! -f eval_results_predator_obs_paper.json ]; then
  log "obs 100x10 paper grid (conditioned)"
  python scripts/inference_dynamic.py --dataset dataset/EnvPredatorObs_v1 \
      --checkpoints artifacts/weights/predator_obs_v1.npz \
      --pursuer-conditioned --n-contexts 100 --n-experiments 10 \
      --results eval_results_predator_obs_paper.json \
      > logs/eval_predator_obs_paper.out 2>&1 || echo "OBS PAPER FAILED"
fi

# compose (w1,w2) sweep — asymmetric weights around the w=4 plateau
for ws in "3 5" "5 3" "4 6" "6 4"; do
  set -- $ws
  w1=$1; w2=$2
  out="eval_results_3d_grid_compose_w${w1}${w2}.json"
  if [ ! -f "$out" ]; then
    log "3-D compose sweep w1=$w1 w2=$w2"
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
  log "3-D compose resample_steps=4"
  python scripts/inference3d.py --dataset dataset/EnvSmall3D_v2 \
      --compose-dataset dataset/EnvSmall3D_v2b \
      --checkpoints artifacts/weights/planner3d_v2.npz \
      --max-envs 12 --n-contexts 5 --n-samples 4 --cfg-weight 4 \
      --resample-steps 4 \
      --results eval_results_3d_grid_compose_rs4.json \
      > logs/eval_3d_compose_rs4.out 2>&1 || echo "RS4 FAILED"
fi

log "stage C done"
