#!/usr/bin/env bash
# Round-5 measurement queue — the queue-stranding fix (VERDICT r4 item 7).
#
# Process changes vs rounds 1-4 (four consecutive dead tails):
#   * every result is git-committed THE MOMENT it lands (path-scoped commit,
#     retried under index-lock contention), so a clock cut can strand at
#     most the currently-running item and never an orphaned finished one;
#   * QUEUE_STATUS.md is rewritten+committed with each item so the driver
#     (and the next round) can read exactly where the queue stood;
#   * the one long training leg computes its step budget from the wall
#     clock instead of assuming the round lasts forever;
#   * items are ordered by VERDICT priority with the droppable ones last.
#
# Run as:
#   nohup bash scripts/chip_queue_r5a.sh > logs/chip_queue_r5a.out 2>&1 &
set -u
cd "$(dirname "$0")/.."
mkdir -p logs artifacts/weights
log() { echo "=== $(date -u +%H:%M:%S) $*"; }

# Hard deadline for chip work this round (driver bench + judge follow).
DEADLINE=$(date -u -d "today 08:55" +%s)

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

cat > QUEUE_STATUS.md <<'EOF'
# QUEUE_STATUS — round-5 measurement queue (chip_queue_r5a.sh)

Live log, rewritten at queue start and appended per item; each row is
committed together with the result file it names. Item letters:
F1 hard2d 8x-data retrain, F2 gated compose evals on it, E1 serving
bench (fused-fetch serve path), E3 obs_v2 equal-budget leg + grids,
E2 pursuer-capsule K-sweep at paper scale, G1 narrow-U-Net latency
probe, G2 final bench.

| UTC | item | status | detail |
|---|---|---|---|
EOF
note boot started "deadline $(date -u -d @"$DEADLINE" +%H:%M)"
commit_result "Start the round-5 chip queue with per-result commits" QUEUE_STATUS.md

# Wait for the round-4 tail (D7 sweep/D8 bench) to release the chip.
# R4D_PID is exported by the launcher (the round-4 driver bash, known by
# exact pid — never matched by pattern); default to the observed pid.
R4PID="${R4D_PID:-29543}"
while kill -0 "$R4PID" 2>/dev/null; do
  sleep 60
done
# give any straggler python child of the r4 queue a moment to flush
sleep 10

# ---------------------------------------------------------------- F1
# The round's training leg (VERDICT item 1 follow-up): the gated compose
# rerun collapsed to 0.285, and the compose family is single-sourced at
# 96 scenes / no 8x variant. Apply the static family's proven recipe:
# 768 scenes (v2 + 672 new v3) from scratch, budget set by the clock.
if [ ! -f artifacts/weights/hard2d_v4.npz ]; then
  now=$(date +%s); remain=$(( DEADLINE - now - 13500 ))   # reserve 3h45 for E/F2/G
  steps=$(( remain * 1000 / 105 ))                        # 105 ms/step measured
  [ "$steps" -gt 100000 ] && steps=100000
  [ "$steps" -lt 30000 ] && steps=30000
  steps=$(( steps / 1000 * 1000 ))
  log "F1: hard2d_v4 from-scratch train, $steps steps (clock-derived)"
  note F1 running "train $steps steps on 768 scenes"
  commit_result "Queue status: hard2d_v4 training started" QUEUE_STATUS.md
  python scripts/train.py \
      --dataset dataset/EnvHard2dquant_v2,dataset/EnvHard2dquant_v3 \
      --normalizer-dataset dataset/EnvHard2dquant_v2 \
      --checkpoints checkpoints/hard2d_v4 --steps "$steps" \
      --batch-size 128 --log-file logs/train_hard2d_v4.jsonl \
      > logs/train_hard2d_v4.out 2>&1 || echo "HARD2D V4 TRAIN FAILED"
  python scripts/export_weights.py --checkpoints checkpoints/hard2d_v4 \
      --dataset dataset/EnvHard2dquant_v2 \
      --out artifacts/weights/hard2d_v4.npz \
      > logs/export_hard2d_v4.out 2>&1 || echo "HARD2D V4 EXPORT FAILED"
  if [ -f artifacts/weights/hard2d_v4.npz ]; then
    note F1 done "hard2d_v4.npz exported ($steps steps)"
    commit_result "Train hard2d_v4: 768 scenes (8x data) from scratch, $steps steps" \
        artifacts/weights/hard2d_v4.npz QUEUE_STATUS.md
  else
    note F1 FAILED "see logs/train_hard2d_v4.out"
    commit_result "Queue status: hard2d_v4 training failed" QUEUE_STATUS.md
  fi
fi

# ---------------------------------------------------------------- F2
# Gated compose evals on the new weights: the reference-default DDIM-8+APF
# leg (comparable to eval_results_compose_gated.json) and a plain leg that
# separates APF wander from model ability.
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

# ---------------------------------------------------------------- E3
# obs_v2 equal-budget leg (VERDICT item 4): resume 30k -> 60k, regrid.
if [ -d checkpoints/predator_obs_v2 ]; then
  if [ ! -f artifacts/weights/predator_obs_v2_60k.npz ]; then
    log "E3: resume obs_v2 30k -> 60k (equal budget)"
    note E3 running "resume obs_v2 to 60k"
    commit_result "Queue status: obs_v2 equal-budget resume started" QUEUE_STATUS.md
    python scripts/train.py --dataset dataset/EnvPredatorObs_v2 \
        --checkpoints checkpoints/predator_obs_v2 --steps 60000 \
        --batch-size 128 --normalizer-dataset dataset/EnvPredatorObs_v1 \
        --log-file logs/train_predator_obs_v2.jsonl \
        > logs/train_predator_obs_v2_60k.out 2>&1 || echo "OBS V2 60K FAILED"
    python scripts/export_weights.py --checkpoints checkpoints/predator_obs_v2 \
        --dataset dataset/EnvPredatorObs_v2 \
        --out artifacts/weights/predator_obs_v2_60k.npz \
        > logs/export_obs_v2_60k.out 2>&1 || echo "OBS V2 60K EXPORT FAILED"
    if [ -f artifacts/weights/predator_obs_v2_60k.npz ]; then
      note E3 trained "predator_obs_v2_60k.npz exported"
      commit_result "Resume obs_v2 to the equal 60k budget (de-confound the swept-recipe wash)" \
          artifacts/weights/predator_obs_v2_60k.npz QUEUE_STATUS.md
    fi
  fi
  if [ -f artifacts/weights/predator_obs_v2_60k.npz ] && \
     [ ! -f eval_results_predator_obs_v2_60k_paper.json ]; then
    log "E3b: obs_v2 60k on the 100x10 paper grid"
    note E3b running "obs_v2_60k paper grid"
    python scripts/inference_dynamic.py --dataset dataset/EnvPredatorObs_v1 \
        --checkpoints artifacts/weights/predator_obs_v2_60k.npz \
        --pursuer-conditioned --pursuer-sweep-steps 8 \
        --n-contexts 100 --n-experiments 10 \
        --results eval_results_predator_obs_v2_60k_paper.json \
        > logs/eval_obs_v2_60k_paper.out 2>&1 || echo "OBS V2 60K PAPER FAILED"
    note E3b done "$(python -c "import json;a=json.load(open('eval_results_predator_obs_v2_60k_paper.json'))['aggregate'];print('score %.3f capture %.3f'%(a['score'],a['capture_rate']))" 2>/dev/null || echo '?')"
    commit_result "Measure obs_v2 at equal budget on the 100x10 paper grid" \
        eval_results_predator_obs_v2_60k_paper.json QUEUE_STATUS.md
  fi
  if [ -f artifacts/weights/predator_obs_v2_60k.npz ] && \
     [ ! -f eval_results_predator_obs_v2_60k_50x4.json ]; then
    log "E3c: obs_v2 60k on the 50x4 grid"
    note E3c running "obs_v2_60k 50x4"
    python scripts/inference_dynamic.py --dataset dataset/EnvPredatorObs_v1 \
        --checkpoints artifacts/weights/predator_obs_v2_60k.npz \
        --pursuer-conditioned --pursuer-sweep-steps 8 \
        --n-contexts 50 --n-experiments 4 \
        --results eval_results_predator_obs_v2_60k_50x4.json \
        > logs/eval_obs_v2_60k_50x4.out 2>&1 || echo "OBS V2 60K 50X4 FAILED"
    note E3c done "committed"
    commit_result "Measure obs_v2 equal-budget on the 50x4 grid" \
        eval_results_predator_obs_v2_60k_50x4.json QUEUE_STATUS.md
  fi
fi

# ---------------------------------------------------------------- E2
# Dynamic-margin lever (VERDICT item 5): inference-side K-sweep of the
# swept capsule at paper scale (the pc_v2 orbax checkpoint no longer
# exists, so the 120k continuation is off the table; K is the other
# named lever). K=16 first (longer anticipation) — K=4 only if the
# clock allows.
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

# ---------------------------------------------------------------- G1
# Beyond-parity byte-count probe (VERDICT item 8): narrow-U-Net latency.
if [ ! -f artifacts/bench_narrow_ab.json ]; then
  log "G1: narrow U-Net marginal-replan probe (dims 32/24/16)"
  note G1 running "narrow-dim latency probe"
  python scripts/bench_narrow_ab.py --out artifacts/bench_narrow_ab.json \
      > logs/bench_narrow_ab.out 2>&1 || echo "NARROW PROBE FAILED"
  note G1 done "$(python -c "import json;d=json.load(open('artifacts/bench_narrow_ab.json'));print(' '.join('%d:%.1fms'%(r['unet_input_dim'],r['per_replan_ms']) for r in d['rows']))" 2>/dev/null || echo '?')"
  commit_result "Measure marginal replan latency of bf16-narrow U-Nets (byte-count lever)" \
      artifacts/bench_narrow_ab.json QUEUE_STATUS.md
fi

# ---------------------------------------------------------------- G2
if [ ! -f logs/bench_r5_final.json ]; then
  log "G2: final bench"
  note G2 running "bench.py"
  python bench.py > logs/bench_r5_final.json 2>logs/bench_r5_final.err \
      || echo "BENCH FAILED"
  note G2 done "$(python -c "import json;d=json.load(open('logs/bench_r5_final.json'));print('%.2f ms'%d['value'])" 2>/dev/null || echo '?')"
  commit_result "Record the round-5 final bench" logs/bench_r5_final.json QUEUE_STATUS.md
fi

# ---------------------------------------------------------------- E2b
# K=4 leg — explicitly droppable; only start with >50 min of clock left.
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
commit_result "Queue status: round-5 queue complete" QUEUE_STATUS.md
log "stage r5a done"
