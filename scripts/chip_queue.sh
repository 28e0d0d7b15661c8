#!/usr/bin/env bash
# Pending TPU-chip work queue (survives round boundaries — /tmp does not).
#
# The axon TPU tunnel died mid-campaign on 2026-08-17; this script waits for
# the chip to come back and then drains the remaining queue CHEAP-FIRST so a
# late tunnel return still lands the most results before the round ends:
#   1. static knob A/B round 2 (w3..w6 + DDIM-3 rows, auto full tuned grid)
#   2. dynamic CFG probes (20x2)
#   3. 3-D plain/compose reruns + scenes x contexts grids
#   4. APF backend A/B + fresh bench
#   5. EXPENSIVE: dynamic full paper grid (100x10, ~1-2 h), static
#      fine-tune 300k -> 420k (~2 h), paper grid at the quality preset
# Each stage is individually resumable (cached probe JSONs are skipped).
# Run as:
#   nohup bash scripts/chip_queue.sh > logs/chip_queue.out 2>&1 &
set -u
cd "$(dirname "$0")/.."
mkdir -p logs

log() { echo "=== $(date -u +%H:%M:%S) $*"; }

log "waiting for the TPU tunnel"
until python -c "
from ramp_tpu.utils.platform import accelerator_available
import sys; sys.exit(0 if accelerator_available() else 1)"; do
  sleep 60
done
log "tunnel is back"

bash scripts/static_probe_ab.sh
bash scripts/dynamic_probe_ab.sh

log "3d plain rerun (fixed sphere metrics)"
python scripts/inference3d.py --dataset dataset/EnvSmall3D_v2 \
    --checkpoints artifacts/weights/planner3d_v2.npz --n-samples 4 \
    --results eval_results_3d.json > logs/eval_3d_rerun.out 2>&1
log "3d compose rerun (fixed sphere metrics)"
python scripts/inference3d.py --dataset dataset/EnvSmall3D_v2 \
    --compose-dataset dataset/EnvSmall3D_v2b \
    --checkpoints artifacts/weights/planner3d_v2.npz --n-samples 4 \
    --results eval_results_3d_compose.json > logs/eval_3d_compose_rerun.out 2>&1

# 3-D scenes x contexts grids (CPU proxies: parity 0.917, w4 0.933 on 12x5)
for p in "grid|" "grid_w4|--cfg-weight 4" "grid_w5|--cfg-weight 5"; do
  name=${p%%|*}; flags=${p#*|}
  [ -f "eval_results_3d_${name}.json" ] && continue
  log "3d $name"
  # shellcheck disable=SC2086
  python scripts/inference3d.py --dataset dataset/EnvSmall3D_v2 \
      --checkpoints artifacts/weights/planner3d_v2.npz --n-samples 4 \
      --max-envs 12 --n-contexts 5 $flags \
      --results "eval_results_3d_${name}.json" \
      > "logs/eval_3d_${name}.out" 2>&1 || echo "3d $name FAILED"
done
log "3d compose grids (CPU proxy: parity scored 0.750 on 12x5 — probe a
lower compose weight too)"
for p in "grid_compose|" "grid_compose_w4|--cfg-weight 4"; do
  name=${p%%|*}; flags=${p#*|}
  [ -f "eval_results_3d_${name}.json" ] && continue
  # shellcheck disable=SC2086
  python scripts/inference3d.py --dataset dataset/EnvSmall3D_v2 \
      --compose-dataset dataset/EnvSmall3D_v2b \
      --checkpoints artifacts/weights/planner3d_v2.npz --n-samples 4 \
      --max-envs 12 --n-contexts 5 $flags \
      --results "eval_results_3d_${name}.json" \
      > "logs/eval_3d_${name}.out" 2>&1 || echo "3d $name FAILED"
done

# dynamic CFG probe (w=2.5 parity vs w=3.5/w=4.5) on the 20x2 grid
# (CPU proxies: base 0.70, w3.5 0.80, w4.5 0.70). dynamic_probe_ab.sh
# above already ran these exact evals (same dataset/weights/grid/seed) —
# copy its probe JSONs instead of burning three 40-episode chip evals.
for pair in "dbase|base" "dw35|w35" "dw45|w45"; do
  dst=${pair%%|*}; src=${pair#*|}
  [ -f "eval_results_dynamic_${dst}.json" ] && continue
  [ -f "eval_dynab_${src}.json" ] \
    && cp "eval_dynab_${src}.json" "eval_results_dynamic_${dst}.json" \
    || echo "dynamic $dst: probe eval_dynab_${src}.json missing"
done

# QCar non-holonomic closed loop (both physical scenarios, 10 episodes
# each — minutes at chip speed) + a README GIF
if [ ! -f eval_results_qcar.json ]; then
  log "qcar demo"
  python scripts/qcar_demo.py --dataset dataset/EnvPredator_v2 \
      --checkpoints artifacts/weights/predator_v2_60k.npz \
      --n-episodes 10 --gif-dir gifs \
      --results eval_results_qcar.json > logs/qcar.out 2>&1 \
      || echo "qcar FAILED"
fi

# APF backend A/B (XLA-fused vs the Pallas kernel) — rerun on the
# post-parity-fix code (pre-fix chip numbers: 18.97 vs 18.85 ms).
# Write to a tmp file and mv only on success: redirecting straight to the
# guard file would create it even when the run fails, skipping retries.
if [ ! -f logs/apf_ab.json ]; then
  if python scripts/bench_apf_ab.py > logs/apf_ab.json.tmp 2>logs/apf_ab.err
  then mv logs/apf_ab.json.tmp logs/apf_ab.json
  else echo "apf A/B FAILED"; fi
fi

python bench.py > logs/bench_post2.json 2>logs/bench_post2.err

# ---- EXPENSIVE stages (hours each), most valuable first ----

# Full paper-size dynamic grid at parity (100 contexts x 10 experiments,
# ref inference_dynamic.py:429-430) — the headline parity number.
run_paper_grid() {  # $1 name, $2.. flags
  name=$1; shift
  [ -f "eval_results_dynamic_${name}.json" ] && return 0
  log "dynamic full paper grid: $name"
  python scripts/inference_dynamic.py --dataset dataset/EnvPredator_v2 \
      --checkpoints artifacts/weights/predator_v2_60k.npz \
      --n-contexts 100 --n-experiments 10 --n-samples 35 "$@" \
      --results "eval_results_dynamic_${name}.json" \
      > "logs/eval_dyn_${name}.out" 2>&1 || echo "dynamic $name FAILED"
}
run_paper_grid paper

# static fine-tune 300k -> 420k in two exported legs + eval (~2 h)
bash scripts/finetune_static.sh

run_paper_grid paper_quality --preset quality
log "chip queue drained"
