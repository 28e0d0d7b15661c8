#!/usr/bin/env bash
# Follow-up probe batch: waits for the main chip queue (scripts/chip_queue.sh)
# to drain, then brackets the 2026-08-19 on-chip winners with a few cheap
# probes (cached compiles, ~10-16 min each):
#   static:  is w=5 the DDIM-3 plateau (d3w6/d3w7)? does DDIM-4 offer a
#            success/tightness middle ground (d4w5)?
#   dynamic: bracket the w=3.5 score peak (w30/w40).
# Probes only — no automatic full-grid rerun (the winner logic in
# static_probe_ab.sh would overwrite eval_results_static_tuned.json).
# Run as:
#   nohup bash scripts/chip_queue3.sh <main_queue_pid> > logs/chip_queue3.out 2>&1 &
set -u
cd "$(dirname "$0")/.."
mkdir -p logs

log() { echo "=== $(date -u +%H:%M:%S) $*"; }

MAIN_PID=${1:-}
if [ -n "$MAIN_PID" ]; then
  log "waiting for main queue pid $MAIN_PID"
  while kill -0 "$MAIN_PID" 2>/dev/null; do sleep 120; done
  log "main queue done"
fi

W=artifacts/weights/simple2d_v2.npz
DS=dataset/EnvSimple2dquant_v2
PROBE_GRID="--max-envs 24 --n-contexts 10 --n-samples 20"
for p in "d3w6|--ddim-steps 3 --cfg-weight 6" \
         "d3w7|--ddim-steps 3 --cfg-weight 7" \
         "d4w5|--ddim-steps 4 --cfg-weight 5"; do
  name=${p%%|*}; flags=${p#*|}
  [ -f "eval_ab_${name}.json" ] && continue
  log "static probe $name: $flags"
  # shellcheck disable=SC2086
  python scripts/inference_static.py --dataset $DS --checkpoints $W \
      $PROBE_GRID $flags --results "eval_ab_${name}.json" \
      > "logs/ab_${name}.out" 2>&1 || echo "probe $name FAILED"
done

DW=artifacts/weights/predator_v2_60k.npz
DDS=dataset/EnvPredator_v2
# h15 is a retry: its first run died on a remote-compile tunnel flake
# ("response body closed before all bytes were read"), not a code error.
# l3 grounds a possible dynamic `fast` preset: 3 STAGE-II refine steps
# instead of 5 (~40% less U-Net work per replan).
for p in "w30|--cfg-weight 3.0" "w40|--cfg-weight 4.0" \
         "h15|--ddim-steps-high 15" \
         "l3|--ddim-steps-low 3" \
         "l3w35|--ddim-steps-low 3 --cfg-weight 3.5"; do
  name=${p%%|*}; flags=${p#*|}
  [ -f "eval_dynab_${name}.json" ] && continue
  log "dynamic probe $name: $flags"
  # shellcheck disable=SC2086
  python scripts/inference_dynamic.py --dataset $DDS --checkpoints $DW \
      --n-contexts 20 --n-experiments 2 --n-samples 35 $flags \
      --results "eval_dynab_${name}.json" \
      > "logs/dynab_${name}.out" 2>&1 || echo "probe $name FAILED"
done
# 3-D DDIM-5 vs the parity DDPM-25 on the scenes x contexts grid: 5x
# fewer U-Net calls per plan — a measured 3-D `fast` preset candidate.
if [ ! -f eval_results_3d_grid_ddim.json ]; then
  log "3d grid ddim"
  python scripts/inference3d.py --dataset dataset/EnvSmall3D_v2 \
      --checkpoints artifacts/weights/planner3d_v2.npz --n-samples 4 \
      --max-envs 12 --n-contexts 5 --ddim \
      --results eval_results_3d_grid_ddim.json \
      > logs/eval_3d_grid_ddim.out 2>&1 || echo "3d ddim grid FAILED"
fi

log "follow-up probe batch done"
