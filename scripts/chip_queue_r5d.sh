#!/usr/bin/env bash
# Round-5 queue, final handover (r5d).
#
# Replaces the tail of chip_queue_r5c.sh: the r5b training log showed a
# 20k chunk costs ~51 min wall (data load + compile + 105 ms/step), not
# the ~35 min the r5c plan assumed, so its second 20k chunk would have
# pushed the K=16 paper grid (VERDICT r4 item 5's one remaining lever)
# past the clock guard.  This queue keeps both: it waits for the running
# chunk-1 train (pid passed as $1), exports+commits it, trains a SHORT
# second chunk (+12k steps, resumed from the orbax checkpoint), then runs
# the gated compose evals, the K=16 paper grid, and the final bench.
# r5c's shell was killed before its post-loop items parsed; every item
# here is guarded by its result file, so nothing double-runs.
#
# Run as:
#   nohup bash scripts/chip_queue_r5d.sh <train_pid> > logs/chip_queue_r5d.out 2>&1 &
set -u
cd "$(dirname "$0")/.."
mkdir -p logs artifacts/weights checkpoints
log() { echo "=== $(date -u +%H:%M:%S) $*"; }

DEADLINE=$(date -u -d "today 09:10" +%s)

note() {  # note <item> <status> <detail>
  echo "| $(date -u +%H:%M:%S) | $1 | $2 | ${3:-} |" >> QUEUE_STATUS.md
}

commit_result() {  # commit_result "<msg>" <paths...>
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

note r5d handover "chunk2 shortened to +12k so the K=16 grid fits the clock"

# ---------------------------------------------------------------- F1 (cont.)
TRAIN_PID=${1:-}
if [ -n "$TRAIN_PID" ]; then
  log "waiting for chunk-1 train pid $TRAIN_PID"
  while kill -0 "$TRAIN_PID" 2>/dev/null; do sleep 30; done
  log "chunk-1 train done"
fi
python scripts/export_weights.py --checkpoints checkpoints/hard2d_v4r5c \
    --dataset dataset/EnvHard2dquant_v2 \
    --out artifacts/weights/hard2d_v4.npz \
    > logs/export_hard2d_v4r5c.out 2>&1 || echo "HARD2D V4 EXPORT FAILED"
note F1 chunk "exported at eff 40000 steps"
commit_result "Train hard2d_v4 to 40000 effective steps (npz warm restart after the second reboot)" \
    artifacts/weights/hard2d_v4.npz QUEUE_STATUS.md scripts/chip_queue_r5d.sh

now=$(date +%s)
if [ $(( DEADLINE - now )) -gt $(( 2100 + 4800 )) ]; then
  log "F1: short chunk 2 to 32000 local steps (eff 52000)"
  note F1 running "chunk to 32000 local steps (eff 52000)"
  python scripts/train.py \
      --dataset dataset/EnvHard2dquant_v2,dataset/EnvHard2dquant_v3 \
      --normalizer-dataset dataset/EnvHard2dquant_v2 \
      --checkpoints checkpoints/hard2d_v4r5c --steps 32000 \
      --batch-size 128 --log-file logs/train_hard2d_v4r5c.jsonl \
      > logs/train_hard2d_v4r5c_32000.out 2>&1 || echo "HARD2D V4 CHUNK 2 FAILED"
  python scripts/export_weights.py --checkpoints checkpoints/hard2d_v4r5c \
      --dataset dataset/EnvHard2dquant_v2 \
      --out artifacts/weights/hard2d_v4.npz \
      > logs/export_hard2d_v4r5c.out 2>&1 || echo "HARD2D V4 EXPORT FAILED"
  note F1 chunk "exported at eff 52000 steps"
  commit_result "Train hard2d_v4 to 52000 effective steps (short chunk so the K=16 grid fits)" \
      artifacts/weights/hard2d_v4.npz QUEUE_STATUS.md
else
  note F1 clock-stop "second chunk skipped; evals run on the 40k export"
  commit_result "Queue status: hard2d_v4 second chunk skipped by the clock guard" QUEUE_STATUS.md
fi

# ---------------------------------------------------------------- F2
if [ -f artifacts/weights/hard2d_v4.npz ] && \
   [ ! -f eval_results_compose_v4_gated.json ]; then
  log "F2a: hard2d_v4 compose + APF under the gate"
  note F2a running "compose+APF 96x10x20"
  python scripts/inference_static.py --dataset dataset/EnvHard2dquant_v2 \
      --checkpoints artifacts/weights/hard2d_v4.npz \
      --compose --use-apf --n-contexts 10 --n-samples 20 \
      --results eval_results_compose_v4_gated.json \
      > logs/eval_compose_v4_gated.out 2>&1 || echo "COMPOSE V4 FAILED"
  note F2a done "$(python -c "import json;a=json.load(open('eval_results_compose_v4_gated.json'))['aggregate'];print('success %.3f wander %d'%(a['success_rate'],a['n_wander_trajectories']))" 2>/dev/null || echo '?')"
  commit_result "Measure hard2d_v4 gated compose+APF on the 96x10x20 grid" \
      eval_results_compose_v4_gated.json QUEUE_STATUS.md
fi
if [ -f artifacts/weights/hard2d_v4.npz ] && \
   [ ! -f eval_results_compose_v4_plain.json ]; then
  log "F2b: hard2d_v4 compose plain (no APF)"
  note F2b running "compose plain 96x10x20"
  python scripts/inference_static.py --dataset dataset/EnvHard2dquant_v2 \
      --checkpoints artifacts/weights/hard2d_v4.npz \
      --compose --ddim-steps 8 --n-contexts 10 --n-samples 20 \
      --results eval_results_compose_v4_plain.json \
      > logs/eval_compose_v4_plain.out 2>&1 || echo "COMPOSE V4 PLAIN FAILED"
  note F2b done "$(python -c "import json;a=json.load(open('eval_results_compose_v4_plain.json'))['aggregate'];print('success %.3f wander %d'%(a['success_rate'],a['n_wander_trajectories']))" 2>/dev/null || echo '?')"
  commit_result "Measure hard2d_v4 plain compose on the 96x10x20 grid" \
      eval_results_compose_v4_plain.json QUEUE_STATUS.md
fi

# ---------------------------------------------------------------- E2a
now=$(date +%s)
if [ $(( DEADLINE - now )) -gt 2700 ] && \
   [ ! -f eval_results_dynamic_pc_v2_k16_paper.json ]; then
  log "E2a: pc_v2 K=16 capsule on the 100x10 paper grid"
  note E2a running "K=16 paper grid"
  python scripts/inference_dynamic.py --dataset dataset/EnvPredator_v2 \
      --checkpoints artifacts/weights/predator_pc_v2_60k.npz \
      --pursuer-conditioned --pursuer-sweep-steps 16 \
      --n-contexts 100 --n-experiments 10 \
      --results eval_results_dynamic_pc_v2_k16_paper.json \
      > logs/eval_pc_v2_k16_paper.out 2>&1 || echo "K16 FAILED"
  note E2a done "$(python -c "import json;a=json.load(open('eval_results_dynamic_pc_v2_k16_paper.json'))['aggregate'];print('score %.3f capture %.3f'%(a['score'],a['capture_rate']))" 2>/dev/null || echo '?')"
  commit_result "Measure the K=16 pursuer capsule at paper scale" \
      eval_results_dynamic_pc_v2_k16_paper.json QUEUE_STATUS.md
else
  [ -f eval_results_dynamic_pc_v2_k16_paper.json ] || { note E2a skipped "clock guard (needs >45 min)"; \
    commit_result "Queue status: K=16 leg skipped by the clock guard" QUEUE_STATUS.md; }
fi

# ---------------------------------------------------------------- G2
if [ ! -f logs/bench_r5_final.json ]; then
  log "G2: final bench"
  note G2 running "bench.py"
  python bench.py > logs/bench_r5_final.json 2>logs/bench_r5_final.err \
      || echo "BENCH FAILED"
  cp logs/bench_r5_final.json artifacts/bench_r5_final.json 2>/dev/null
  note G2 done "$(python -c "import json;d=json.load(open('logs/bench_r5_final.json'));print('%.2f ms'%d['value'])" 2>/dev/null || echo '?')"
  commit_result "Record the round-5 final bench" artifacts/bench_r5_final.json QUEUE_STATUS.md
fi

# ---------------------------------------------------------------- E2b
now=$(date +%s)
if [ $(( DEADLINE - now )) -gt 3000 ] && \
   [ ! -f eval_results_dynamic_pc_v2_k4_paper.json ]; then
  log "E2b: pc_v2 K=4 capsule on the 100x10 paper grid"
  note E2b running "K=4 paper grid"
  python scripts/inference_dynamic.py --dataset dataset/EnvPredator_v2 \
      --checkpoints artifacts/weights/predator_pc_v2_60k.npz \
      --pursuer-conditioned --pursuer-sweep-steps 4 \
      --n-contexts 100 --n-experiments 10 \
      --results eval_results_dynamic_pc_v2_k4_paper.json \
      > logs/eval_pc_v2_k4_paper.out 2>&1 || echo "K4 FAILED"
  note E2b done "$(python -c "import json;a=json.load(open('eval_results_dynamic_pc_v2_k4_paper.json'))['aggregate'];print('score %.3f'%a['score'])" 2>/dev/null || echo '?')"
  commit_result "Measure the K=4 pursuer capsule at paper scale" \
      eval_results_dynamic_pc_v2_k4_paper.json QUEUE_STATUS.md
else
  [ -f eval_results_dynamic_pc_v2_k4_paper.json ] || { note E2b skipped "clock guard (needs >50 min)"; \
    commit_result "Queue status: K=4 leg skipped by the clock guard" QUEUE_STATUS.md; }
fi

note queue done "all items accounted for"
commit_result "Queue status: round-5 r5d queue complete" QUEUE_STATUS.md
