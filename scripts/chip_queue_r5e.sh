#!/usr/bin/env bash
# Round-5 queue, spare-time control leg (r5e).
#
# The F2 pair on hard2d_v4 split cleanly: compose+APF gated 0.369 (93 %
# wander, collisions ~0) vs plain-DDIM-8 gated 0.722 (zero wander,
# collision intensity 16 %).  The 0.722 is the best honest compositional
# number in the repo, but it changes TWO variables vs the old 0.285 row
# (weights AND guidance).  This leg runs the missing control — hard2d_v2
# with the same plain-DDIM-8 settings — so the attribution square
# (weights x guidance) closes.  Waits for the r5d queue to exit so it
# never contends for the chip; clock-guarded.
#
# Run as:
#   nohup bash scripts/chip_queue_r5e.sh <r5d_pid> > logs/chip_queue_r5e.out 2>&1 &
set -u
cd "$(dirname "$0")/.."
mkdir -p logs
log() { echo "=== $(date -u +%H:%M:%S) $*"; }

DEADLINE=$(date -u -d "today 09:10" +%s)

note() { echo "| $(date -u +%H:%M:%S) | $1 | $2 | ${3:-} |" >> QUEUE_STATUS.md; }

commit_result() {
  local msg="$1"; shift
  local try
  for try in 1 2 3 4 5; do
    git add -- "$@" QUEUE_STATUS.md >/dev/null 2>&1
    if git commit -q -m "$msg" -- "$@" QUEUE_STATUS.md >/dev/null 2>&1; then
      return 0
    fi
    sleep 3
  done
  echo "COMMIT FAILED after retries: $msg"
}

R5D_PID=${1:-}
if [ -n "$R5D_PID" ]; then
  log "waiting for r5d queue pid $R5D_PID"
  while kill -0 "$R5D_PID" 2>/dev/null; do sleep 30; done
  log "r5d queue done"
fi

now=$(date +%s)
if [ $(( DEADLINE - now )) -gt 1080 ] && \
   [ ! -f eval_results_compose_v2_plain.json ]; then
  log "F2c: hard2d_v2 compose plain (attribution control)"
  note F2c running "v2 compose plain 96x10x20"
  python scripts/inference_static.py --dataset dataset/EnvHard2dquant_v2 \
      --checkpoints artifacts/weights/hard2d_v2.npz \
      --compose --ddim-steps 8 --n-contexts 10 --n-samples 20 \
      --results eval_results_compose_v2_plain.json \
      > logs/eval_compose_v2_plain.out 2>&1 || echo "COMPOSE V2 PLAIN FAILED"
  note F2c done "$(python -c "import json;a=json.load(open('eval_results_compose_v2_plain.json'))['aggregate'];print('success %.3f coll %.2f%% wander %d'%(a['success_rate'],a['collision_intensity'],a['n_wander_trajectories']))" 2>/dev/null || echo '?')"
  commit_result "Measure hard2d_v2 plain compose (the guidance-vs-weights attribution control)" \
      eval_results_compose_v2_plain.json QUEUE_STATUS.md scripts/chip_queue_r5e.sh
else
  note F2c skipped "clock guard (needs >18 min)"
  commit_result "Queue status: v2-plain control leg skipped by the clock guard" \
      QUEUE_STATUS.md scripts/chip_queue_r5e.sh
fi
