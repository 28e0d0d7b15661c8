#!/usr/bin/env bash
# Round-5 measurement queue, second launch (r5b).
#
# The r5a queue died when the host rebooted mid-F1: logs/, checkpoints/,
# and the untracked EnvHard2dquant_v3 dataset were all lost (only
# git-tracked state survived).  Changes vs r5a:
#   * the v3 dataset is regenerated first (by the builder, CPU-side) and
#     COMMITTED before training starts, so a second reboot cannot lose it;
#   * training runs in 20k-step chunks, each chunk followed by an npz
#     export + checkpoint tarball commit, so a reboot strands at most one
#     chunk (~35 min) instead of the whole training leg;
#   * the cheap chip items (serve bench, narrow probe) run FIRST while the
#     dataset commit is still in flight, so the chip is never idle;
#   * obs_v2 equal-budget resume is off the table (its orbax checkpoint
#     was untracked and is gone); the from-scratch 60k retrain does not
#     fit the final-round clock alongside the compose training leg, which
#     VERDICT r4 item 1 names as the round's training priority.  The loss
#     is documented in RESULTS.md instead.
#
# Run as:
#   nohup bash scripts/chip_queue_r5b.sh > logs/chip_queue_r5b.out 2>&1 &
set -u
cd "$(dirname "$0")/.."
mkdir -p logs artifacts/weights checkpoints
log() { echo "=== $(date -u +%H:%M:%S) $*"; }

DEADLINE=$(date -u -d "today 09:30" +%s)

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

## r5b relaunch (after host reboot killed r5a mid-F1)

| UTC | item | status | detail |
|---|---|---|---|
EOF
note boot started "deadline $(date -u -d @"$DEADLINE" +%H:%M); r5a lost logs/, checkpoints/, v3 dataset"
commit_result "Relaunch the round-5 queue after the reboot (chunked training, committed dataset)" \
    QUEUE_STATUS.md scripts/chip_queue_r5b.sh

# ---------------------------------------------------------------- E1
# Serving-path bench on the fused-fetch serve layer (VERDICT item 3).
if [ ! -f artifacts/bench_serve_r5.json ]; then
  log "E1: bench_serve on the fused-fetch serve path"
  note E1 running "serve bench (fused dispatch+fetch)"
  python scripts/bench_serve.py --out artifacts/bench_serve_r5.json \
      > logs/bench_serve_r5.out 2>&1 || echo "BENCH SERVE R5 FAILED"
  note E1 done "$(python -c "import json;d=json.load(open('artifacts/bench_serve_r5.json'));print('plan p50 %.1f ms, step p50 %.1f ms'%(d['plan_sequential_p50_ms'],d['episode_step_p50_ms']))" 2>/dev/null || echo '?')"
  commit_result "Measure the serving path after fusing unnormalize+fetch into one round trip" \
      artifacts/bench_serve_r5.json QUEUE_STATUS.md
fi

# ---------------------------------------------------------------- G1
# Beyond-parity byte-count probe (VERDICT item 8): narrow-U-Net latency.
if [ ! -f artifacts/bench_narrow_ab.json ]; then
  log "G1: narrow U-Net marginal-replan probe"
  note G1 running "narrow-dim latency probe"
  python scripts/bench_narrow_ab.py --out artifacts/bench_narrow_ab.json \
      > logs/bench_narrow_ab.out 2>&1 || echo "NARROW PROBE FAILED"
  note G1 done "$(python -c "import json;d=json.load(open('artifacts/bench_narrow_ab.json'));print(' '.join('%s:%.1fms'%(r.get('label',r.get('unet_input_dim','?')),r['per_replan_ms']) for r in d['rows']))" 2>/dev/null || echo '?')"
  commit_result "Measure marginal replan latency of bf16-narrow U-Nets (byte-count lever)" \
      artifacts/bench_narrow_ab.json QUEUE_STATUS.md
fi

# ---------------------------------------------------------------- F1
# The round's training leg: hard2d_v4 from scratch on 768 scenes
# (v2 96 + regenerated v3 672), chunked so a reboot cannot strand it.
# Wait (bounded) for the builder to finish+commit the v3 dataset.
wait_until=$(( $(date +%s) + 1800 ))
while [ ! -f dataset/EnvHard2dquant_v3/.complete ] && [ "$(date +%s)" -lt "$wait_until" ]; do
  sleep 30
done
if [ ! -f dataset/EnvHard2dquant_v3/.complete ]; then
  note F1 SKIPPED "v3 dataset never appeared"
  commit_result "Queue status: F1 skipped, v3 dataset missing" QUEUE_STATUS.md
else
  now=$(date +%s); remain=$(( DEADLINE - now - 9000 ))   # reserve 2h30 for F2/E2a/G2
  steps=$(( remain * 1000 / 105 ))                       # 105 ms/step measured
  [ "$steps" -gt 100000 ] && steps=100000
  [ "$steps" -lt 30000 ] && steps=30000
  steps=$(( steps / 1000 * 1000 ))
  log "F1: hard2d_v4 from-scratch train, $steps steps (clock-derived), 20k chunks"
  note F1 running "train $steps steps on 768 scenes, chunked"
  commit_result "Queue status: hard2d_v4 chunked training started ($steps steps)" QUEUE_STATUS.md
  tgt=0
  while [ "$tgt" -lt "$steps" ]; do
    tgt=$(( tgt + 20000 )); [ "$tgt" -gt "$steps" ] && tgt=$steps
    python scripts/train.py \
        --dataset dataset/EnvHard2dquant_v2,dataset/EnvHard2dquant_v3 \
        --normalizer-dataset dataset/EnvHard2dquant_v2 \
        --checkpoints checkpoints/hard2d_v4 --steps "$tgt" \
        --batch-size 128 --log-file logs/train_hard2d_v4.jsonl \
        > "logs/train_hard2d_v4_$tgt.out" 2>&1 || { echo "HARD2D V4 CHUNK $tgt FAILED"; break; }
    python scripts/export_weights.py --checkpoints checkpoints/hard2d_v4 \
        --dataset dataset/EnvHard2dquant_v2 \
        --out artifacts/weights/hard2d_v4.npz \
        > logs/export_hard2d_v4.out 2>&1 || echo "HARD2D V4 EXPORT FAILED"
    tar czf artifacts/ckpt_hard2d_v4.tgz checkpoints/hard2d_v4 2>/dev/null
    note F1 chunk "exported at $tgt steps"
    commit_result "Train hard2d_v4 to $tgt steps (chunked; 768 scenes, 8x data)" \
        artifacts/weights/hard2d_v4.npz artifacts/ckpt_hard2d_v4.tgz QUEUE_STATUS.md
  done
  if [ "$tgt" -ge "$steps" ]; then
    note F1 done "hard2d_v4.npz at $steps steps"
    commit_result "Queue status: hard2d_v4 training complete at $steps steps" QUEUE_STATUS.md
  fi
fi

# ---------------------------------------------------------------- F2
# Gated compose evals on the new weights (same grids as the r4-D6
# adjudication so the rows are directly comparable).
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
if [ ! -f eval_results_dynamic_pc_v2_k16_paper.json ]; then
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
  note E2b skipped "clock guard (needs >50 min)"
  commit_result "Queue status: K=4 leg skipped by the clock guard" QUEUE_STATUS.md
fi

note queue done "all items accounted for"
commit_result "Queue status: round-5 r5b queue complete" QUEUE_STATUS.md
