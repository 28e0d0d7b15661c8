#!/usr/bin/env bash
# Dynamic-weights A/B: the 120k predator export scored 0.645 on the 50x4
# grid while the earlier 60k export scored 0.80 on its first-20-context
# subset — re-run the full 50x4 grid with the 60k snapshot (restored from
# git history) so the flagship dynamic weights are picked on like-for-like
# evidence.
#
# Waits for the fine-tune campaign (pid in /tmp/ft.pid) to release the TPU.
set -u
cd "$(dirname "$0")/.."
mkdir -p logs

if [ -f /tmp/ft.pid ]; then
  P=$(cat /tmp/ft.pid)
  while kill -0 "$P" 2>/dev/null; do sleep 60; done
fi

log() { echo "=== $(date -u +%H:%M:%S) $*"; }
log "dynamic 50x4 grid with 60k weights"
python scripts/inference_dynamic.py --dataset dataset/EnvPredator_v2 \
    --checkpoints artifacts/weights/predator_v2_60k.npz \
    --n-contexts 50 --n-experiments 4 --n-samples 35 \
    --results eval_results_dynamic_60k.json \
    > logs/eval_dynamic_60k.out 2>&1 || echo "60k eval FAILED"
python - <<'EOF'
import json
for name, path in (("120k", "eval_results_dynamic.json"),
                   ("60k", "eval_results_dynamic_60k.json")):
    try:
        a = json.load(open(path))["aggregate"]
        print(name, {k: a[k] for k in ("score", "goal_success_rate",
                                       "capture_rate")})
    except Exception as e:
        print(name, "unavailable:", e)
EOF
log "dynamic A/B done"
