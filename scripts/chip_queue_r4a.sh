#!/usr/bin/env bash
# Round-4 stage A: the stranded round-3 measurement queue, reordered
# CHEAPEST-FIRST (VERDICT r3 item 1 — three rounds ended with an unexecuted
# tail; the minutes-scale measurements now run before any hour-scale grid so
# a clock-out strands the least information).
#   A1. per-kernel profile trace + analyze_trace   (~3 min)  — items 2/3
#   A2. serving-path latency (bench_serve)         (~5 min)  — item 7
#   A3. eps_remat A/B on the replan bench          (~5 min)  — item 3
#   A4. attention-lowering A/B                     (~5 min)  — item 3
#   A5. static APF full grid under the path gate   (~30 min) — items 1/2
#   A6. 3-D compose baseline rerun + cell analysis (~30 min) — items 1/6
#   A7. 3-D compose APF rerun under the gate       (~30 min) — items 1/2
#   A9. obs 100x10 paper grid (conditioned)        (~1-2 h)  — item 5 prereq
# (A8, the compose (w1,w2) sweep + rs4, moved to chip_queue_r4c.sh: it is
#  only needed if A6's cell analysis says model-failure dominates, and the
#  round-4 training legs in chip_queue_r4b.sh rank higher.)
# Run as:
#   nohup bash scripts/chip_queue_r4a.sh > logs/chip_queue_r4a.out 2>&1 &
set -u
cd "$(dirname "$0")/.."
mkdir -p logs artifacts
log() { echo "=== $(date -u +%H:%M:%S) $*"; }

if [ ! -d logs/prof_r3 ]; then
  log "A1: per-kernel profile trace"
  python scripts/profile_static.py --trace logs/prof_r3 \
      > logs/profile_r3.json 2>logs/profile_r3.err || echo "PROFILE FAILED"
fi
if [ ! -f artifacts/trace_top_kernels.json ]; then
  python scripts/analyze_trace.py --trace-dir logs/prof_r3 \
      --out artifacts/trace_top_kernels.json \
      > logs/analyze_trace.out 2>&1 || echo "TRACE ANALYZE FAILED"
fi

if [ ! -f artifacts/bench_serve.json ]; then
  log "A2: serving-path latency"
  python scripts/bench_serve.py --out artifacts/bench_serve.json \
      > logs/bench_serve.out 2>&1 || echo "BENCH SERVE FAILED"
fi

if [ ! -f logs/bench_remat_ab.out ]; then
  log "A3: eps_remat A/B"
  python scripts/bench_remat_ab.py > logs/bench_remat_ab.out 2>&1 \
      || echo "REMAT AB FAILED"
fi

if [ ! -f logs/bench_attn_ab_r3.out ]; then
  log "A4: attention lowering A/B"
  python scripts/bench_attn_ab.py > logs/bench_attn_ab_r3.out 2>&1 \
      || echo "ATTN AB FAILED"
fi

if [ ! -f eval_results_static_apf_r3.json ]; then
  log "A5: static APF full grid under the path gate"
  python scripts/inference_static.py --dataset dataset/EnvSimple2dquant_v2 \
      --checkpoints artifacts/weights/simple2d_v2.npz \
      --n-contexts 20 --n-samples 20 --use-apf \
      --results eval_results_static_apf_r3.json \
      > logs/eval_static_apf_r3.out 2>&1 || echo "STATIC APF R3 FAILED"
fi

if [ ! -f eval_results_3d_grid_compose_r3.json ]; then
  log "A6: 3-D compose baseline rerun (gate + start/goal rows)"
  python scripts/inference3d.py --dataset dataset/EnvSmall3D_v2 \
      --compose-dataset dataset/EnvSmall3D_v2b \
      --checkpoints artifacts/weights/planner3d_v2.npz \
      --max-envs 12 --n-contexts 5 --n-samples 4 --cfg-weight 4 \
      --results eval_results_3d_grid_compose_r3.json \
      > logs/eval_3d_compose_r3.out 2>&1 || echo "COMPOSE R3 FAILED"
fi
if [ ! -f artifacts/analysis_3d_compose_cells.json ]; then
  python scripts/analyze_3d_cells.py \
      --results eval_results_3d_grid_compose_r3.json \
      --dataset dataset/EnvSmall3D_v2 \
      --compose-dataset dataset/EnvSmall3D_v2b \
      --out artifacts/analysis_3d_compose_cells.json \
      > logs/analyze_3d_cells.out 2>&1 || echo "CELL ANALYSIS FAILED"
fi

if [ ! -f eval_results_3d_grid_compose_apf_r3.json ]; then
  log "A7: 3-D compose APF rerun under the path gate"
  python scripts/inference3d.py --dataset dataset/EnvSmall3D_v2 \
      --compose-dataset dataset/EnvSmall3D_v2b \
      --checkpoints artifacts/weights/planner3d_v2.npz \
      --max-envs 12 --n-contexts 5 --n-samples 4 --cfg-weight 4 \
      --use-apf \
      --results eval_results_3d_grid_compose_apf_r3.json \
      > logs/eval_3d_compose_apf_r3.out 2>&1 || echo "COMPOSE APF R3 FAILED"
fi

if [ ! -f eval_results_predator_obs_paper.json ]; then
  log "A9: obs 100x10 paper grid (conditioned)"
  python scripts/inference_dynamic.py --dataset dataset/EnvPredatorObs_v1 \
      --checkpoints artifacts/weights/predator_obs_v1.npz \
      --pursuer-conditioned --n-contexts 100 --n-experiments 10 \
      --results eval_results_predator_obs_paper.json \
      > logs/eval_predator_obs_paper.out 2>&1 || echo "OBS PAPER FAILED"
fi

log "stage A done"
