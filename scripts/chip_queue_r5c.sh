#!/usr/bin/env bash
# Round-5 measurement queue, third launch (r5c).
#
# The r5b queue died when the host rebooted a second time (05:59 UTC),
# again losing logs/ and checkpoints/.  The chunked-training design did
# its job: the 20k-step hard2d_v4 npz export was committed before the
# reboot, so this relaunch resumes from it via `train.py --init-weights`
# (params-only warm restart; Adam/EMA state restarts, acceptable for a
# constant-LR run).  Changes vs r5b:
#   * F1 resumes from the committed npz instead of starting from scratch;
#     each chunk still exports + commits, so a third reboot strands at
#     most one chunk;
#   * the checkpoint tarball is no longer committed (1.1 GB; see commit
#     6c68fe79) — the npz IS the reboot-resume path, as exercised here;
#   * compose evals (F2) run on whatever npz exists when the clock says
#     training must stop, so the round always ends with a gated number
#     for the retrained compose family.
#
# Run as:
#   nohup bash scripts/chip_queue_r5c.sh > logs/chip_queue_r5c.out 2>&1 &
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

cat >> QUEUE_STATUS.md <<'EOF'

## r5c relaunch (second reboot killed r5b mid-F1 at 20k steps)

| UTC | item | status | detail |
|---|---|---|---|
EOF
note boot started "deadline $(date -u -d @"$DEADLINE" +%H:%M); resuming F1 from committed 20k npz"
commit_result "Relaunch the round-5 queue a second time, resuming training from the committed npz" \
    QUEUE_STATUS.md scripts/chip_queue_r5c.sh

# ---------------------------------------------------------------- F1
# Resume hard2d_v4 from the committed 20k-step npz.  Each chunk is 20k
# steps (~35 min at the measured 105 ms/step); before each chunk the
# clock guard requires the chunk plus a 70-min reserve for F2+E2a+G2.
BASE_STEPS=20000
for tgt in 20000 40000; do
  now=$(date +%s)
  if [ $(( DEADLINE - now )) -lt $(( 2400 + 4200 )) ]; then
    note F1 "clock-stop" "skipping chunk to $((BASE_STEPS + tgt)) eff steps"
    commit_result "Queue status: F1 chunk skipped by the clock guard" QUEUE_STATUS.md
    break
  fi
  eff=$(( BASE_STEPS + tgt ))
  log "F1: hard2d_v4 chunk to $tgt (effective $eff incl. pre-reboot 20k)"
  note F1 running "chunk to $tgt local steps (eff $eff)"
  python scripts/train.py \
      --dataset dataset/EnvHard2dquant_v2,dataset/EnvHard2dquant_v3 \
      --normalizer-dataset dataset/EnvHard2dquant_v2 \
      --init-weights artifacts/weights/hard2d_v4.npz \
      --checkpoints checkpoints/hard2d_v4r5c --steps "$tgt" \
      --batch-size 128 --log-file logs/train_hard2d_v4r5c.jsonl \
      > "logs/train_hard2d_v4r5c_$tgt.out" 2>&1 || { echo "HARD2D V4 CHUNK $tgt FAILED"; break; }
  python scripts/export_weights.py --checkpoints checkpoints/hard2d_v4r5c \
      --dataset dataset/EnvHard2dquant_v2 \
      --out artifacts/weights/hard2d_v4.npz \
      > logs/export_hard2d_v4r5c.out 2>&1 || echo "HARD2D V4 EXPORT FAILED"
  note F1 chunk "exported at eff $eff steps"
  commit_result "Train hard2d_v4 to $eff effective steps (npz warm restart after the second reboot)" \
      artifacts/weights/hard2d_v4.npz QUEUE_STATUS.md
done

# ---------------------------------------------------------------- F2
# Gated compose evals on the retrained weights — same grid as the r4-D6
# adjudication (EnvHard2dquant_v2, 10 contexts x 20 samples) so the rows
# are directly comparable with the hard2d_v2 0.285 collapse.
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
# Dynamic-margin lever (VERDICT item 5): K=16 capsule at paper scale.
now=$(date +%s)
if [ $(( DEADLINE - now )) -gt 3300 ] && \
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
  [ -f eval_results_dynamic_pc_v2_k16_paper.json ] || { note E2a skipped "clock guard (needs >55 min)"; \
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
# K=4 leg — droppable; only with >50 min of clock left.
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
commit_result "Queue status: round-5 r5c queue complete" QUEUE_STATUS.md
