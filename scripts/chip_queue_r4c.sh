#!/usr/bin/env bash
# Round-4 stage C: opportunistic tail — runs only if the round clock allows.
#  C1. 3-D compose (w1,w2) sweep + resample_steps=4 probe (VERDICT r3 item
#      6's push levers — only meaningful alongside the stage-A cell analysis)
#  C2. final bench for session stability
# Run as:
#   nohup bash scripts/chip_queue_r4c.sh <r4b_pid> > logs/chip_queue_r4c.out 2>&1 &
set -u
cd "$(dirname "$0")/.."
mkdir -p logs
log() { echo "=== $(date -u +%H:%M:%S) $*"; }

WAIT_PID=${1:-}
if [ -n "$WAIT_PID" ]; then
  log "waiting for stage B pid $WAIT_PID"
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 60; done
fi

if [ ! -f artifacts/bench_serve.json ]; then
  log "C0: bench_serve retry (first attempt died: 120 s HTTP timeout vs the"
  log "    dynamic episode compile; warm calls now pass timeout=1800)"
  python scripts/bench_serve.py --out artifacts/bench_serve.json \
      > logs/bench_serve.out 2>&1 || echo "BENCH SERVE FAILED AGAIN"
fi

if [ ! -f eval_results_static_v4_300k_apf.json ]; then
  log "C1b: APF on the v4_300k flagship under the gate (the relevant pairing
       now that the v2 APF headline failed adjudication at 0.790)"
  python scripts/inference_static.py --dataset dataset/EnvSimple2dquant_v2 \
      --checkpoints artifacts/weights/simple2d_v4_300k.npz \
      --n-contexts 20 --n-samples 20 --use-apf \
      --results eval_results_static_v4_300k_apf.json \
      > logs/eval_static_v4_300k_apf.out 2>&1 || echo "V4 APF FAILED"
fi

if [ ! -f eval_results_compose_gated.json ]; then
  log "C1c: hard2d compose rerun under the gate (the 1.000/0.036% row is
       pre-gate DDIM-8+APF — same suspect class as the static APF headline)"
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
    log "C1: 3-D compose sweep w1=$w1 w2=$w2"
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
  log "C1: 3-D compose resample_steps=4"
  python scripts/inference3d.py --dataset dataset/EnvSmall3D_v2 \
      --compose-dataset dataset/EnvSmall3D_v2b \
      --checkpoints artifacts/weights/planner3d_v2.npz \
      --max-envs 12 --n-contexts 5 --n-samples 4 --cfg-weight 4 \
      --resample-steps 4 \
      --results eval_results_3d_grid_compose_rs4.json \
      > logs/eval_3d_compose_rs4.out 2>&1 || echo "RS4 FAILED"
fi

if [ ! -f logs/bench_r4_final.json ]; then
  log "C2: final bench"
  python bench.py > logs/bench_r4_final.json 2>logs/bench_r4_final.err \
      || echo "BENCH FAILED"
fi

log "stage C done"
