#!/usr/bin/env bash
# Round-5 queue, last-mile leg (r5f).
#
# The r5c queue shell survived an incomplete kill (its pid file recorded
# the nohup wrapper pid, not the script shell) and silently trained
# hard2d_v4 a further 20k steps before it was found and stopped: the
# committed npz is now the 60k-effective export while the published F2
# rows were measured on the 40k export (still reachable at commit
# 793d07ea).  This leg re-runs the compose evals on the 60k weights so
# the committed npz and the published rows agree — and the 40k rows
# become a training-curve point.  Runs after r5e (pid $1); every item is
# clock-guarded and committed as it lands.
#
# Run as:
#   nohup bash scripts/chip_queue_r5f.sh <r5e_pid> > logs/chip_queue_r5f.out 2>&1 &
set -u
cd "$(dirname "$0")/.."
mkdir -p logs
log() { echo "=== $(date -u +%H:%M:%S) $*"; }

DEADLINE=$(date -u -d "today 09:15" +%s)

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

R5E_PID=${1:-}
if [ -n "$R5E_PID" ]; then
  log "waiting for r5e queue pid $R5E_PID"
  while kill -0 "$R5E_PID" 2>/dev/null; do sleep 20; done
  log "r5e queue done"
fi

now=$(date +%s)
if [ $(( DEADLINE - now )) -gt 660 ] && \
   [ ! -f eval_results_compose_v4_60k_plain.json ]; then
  log "F2d: hard2d_v4 60k compose plain"
  note F2d running "60k compose plain 96x10x20"
  python scripts/inference_static.py --dataset dataset/EnvHard2dquant_v2 \
      --checkpoints artifacts/weights/hard2d_v4.npz \
      --compose --ddim-steps 8 --n-contexts 10 --n-samples 20 \
      --results eval_results_compose_v4_60k_plain.json \
      > logs/eval_compose_v4_60k_plain.out 2>&1 || echo "COMPOSE V4 60K PLAIN FAILED"
  note F2d done "$(python -c "import json;a=json.load(open('eval_results_compose_v4_60k_plain.json'))['aggregate'];print('success %.3f coll %.2f%% wander %d'%(a['success_rate'],a['collision_intensity'],a['n_wander_trajectories']))" 2>/dev/null || echo '?')"
  commit_result "Measure plain compose on the 60k hard2d_v4 export (training-curve point)" \
      eval_results_compose_v4_60k_plain.json QUEUE_STATUS.md scripts/chip_queue_r5f.sh
else
  note F2d skipped "clock guard (needs >11 min)"
  commit_result "Queue status: 60k plain-compose leg skipped by the clock guard" \
      QUEUE_STATUS.md scripts/chip_queue_r5f.sh
fi

now=$(date +%s)
if [ $(( DEADLINE - now )) -gt 660 ] && \
   [ ! -f eval_results_compose_v4_60k_gated.json ]; then
  log "F2e: hard2d_v4 60k compose + APF"
  note F2e running "60k compose+APF 96x10x20"
  python scripts/inference_static.py --dataset dataset/EnvHard2dquant_v2 \
      --checkpoints artifacts/weights/hard2d_v4.npz \
      --compose --use-apf --n-contexts 10 --n-samples 20 \
      --results eval_results_compose_v4_60k_gated.json \
      > logs/eval_compose_v4_60k_gated.out 2>&1 || echo "COMPOSE V4 60K APF FAILED"
  note F2e done "$(python -c "import json;a=json.load(open('eval_results_compose_v4_60k_gated.json'))['aggregate'];print('success %.3f wander %d'%(a['success_rate'],a['n_wander_trajectories']))" 2>/dev/null || echo '?')"
  commit_result "Measure compose+APF on the 60k hard2d_v4 export" \
      eval_results_compose_v4_60k_gated.json QUEUE_STATUS.md
else
  note F2e skipped "clock guard (needs >11 min)"
  commit_result "Queue status: 60k compose+APF leg skipped by the clock guard" QUEUE_STATUS.md
fi

note r5f done "last-mile legs accounted for"
commit_result "Queue status: r5f last-mile queue complete" QUEUE_STATUS.md
