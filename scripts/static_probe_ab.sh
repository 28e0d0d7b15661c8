#!/usr/bin/env bash
# Static-planner inference knob A/B with a SINGLE probe table: each probe is
# "name|flags"; the same table drives the runs and the winner picker, so the
# winning full-grid rerun can never execute different flags than the probe
# that won. First row is the baseline (reference-parity defaults).
#
# Usage: static_probe_ab.sh [probe ...]   e.g. "d5w4|--cfg-weight 4"
# With no args, runs the round-2 table below.
set -u
cd "$(dirname "$0")/.."
mkdir -p logs

PROBES=("${@:-}")
if [ -z "${PROBES[0]}" ]; then
  PROBES=(
    "base|"
    "d5w3|--cfg-weight 3"
    "d5w4|--cfg-weight 4"
    "d5w5|--cfg-weight 5"
    "d5w6|--cfg-weight 6"
    "d3w3|--ddim-steps 3 --cfg-weight 3"
    "d3w4|--ddim-steps 3 --cfg-weight 4"
    "d3w5|--ddim-steps 3 --cfg-weight 5"
  )
fi

log() { echo "=== $(date -u +%H:%M:%S) $*"; }
W=artifacts/weights/simple2d_v2.npz
DS=dataset/EnvSimple2dquant_v2
PROBE_GRID="--max-envs 24 --n-contexts 10 --n-samples 20"

for p in "${PROBES[@]}"; do
  name=${p%%|*}; flags=${p#*|}
  if [ -f "eval_ab_${name}.json" ]; then
    log "probe $name: cached (eval_ab_${name}.json exists)"
    continue
  fi
  log "probe $name: $flags"
  # shellcheck disable=SC2086
  python scripts/inference_static.py --dataset $DS --checkpoints $W \
      $PROBE_GRID $flags --results "eval_ab_${name}.json" \
      > "logs/ab_${name}.out" 2>&1 || echo "probe $name FAILED"
done

log "picking winner"
WINNER_FLAGS=$(PROBE_TABLE="$(printf '%s\n' "${PROBES[@]}")" python - <<'EOF'
import json, os, sys
rows = [l for l in os.environ["PROBE_TABLE"].splitlines() if l.strip()]
res = {}
for row in rows:
    name = row.split("|", 1)[0]
    try:
        res[name] = json.load(open(f"eval_ab_{name}.json"))["aggregate"]["success_rate"]
    except Exception:
        res[name] = -1.0
print(json.dumps(res), file=sys.stderr)
base_name = rows[0].split("|", 1)[0]
best = max(res, key=res.get)
if best != base_name and res[best] > res[base_name] + 0.01:
    print(dict(r.split("|", 1) for r in rows)[best])
EOF
)
if [ -f eval_results_static_tuned.json ]; then
  log "tuned grid: cached (eval_results_static_tuned.json exists)"
elif [ -n "$WINNER_FLAGS" ]; then
  log "full tuned grid with: $WINNER_FLAGS"
  # shellcheck disable=SC2086
  python scripts/inference_static.py --dataset $DS --checkpoints $W \
      --n-contexts 20 --n-samples 20 $WINNER_FLAGS \
      --results eval_results_static_tuned.json \
      > logs/eval_static_tuned.out 2>&1 || echo "tuned grid FAILED"
else
  log "no probe beat the baseline by >1%"
fi
log "probe A/B done"
