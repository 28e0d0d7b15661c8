#!/usr/bin/env bash
# Dynamic-planner inference knob A/B with a single probe table (same pattern
# as static_probe_ab.sh): each probe is "name|flags"; the same table drives
# the runs and the winner picker. First row is the reference-parity baseline
# (DDIM 10+5, CFG w=2.5). Probes run a 20x2 subgrid on the flagship 60k
# weights with a fixed seed (identical contexts across probes); if a
# non-baseline probe wins on score, the full 50x4 grid reruns with it.
#
# Usage: dynamic_probe_ab.sh [probe ...]   e.g. "w35|--cfg-weight 3.5"
set -u
cd "$(dirname "$0")/.."
mkdir -p logs

PROBES=("${@:-}")
if [ -z "${PROBES[0]}" ]; then
  PROBES=(
    "base|"
    "w35|--cfg-weight 3.5"
    "w45|--cfg-weight 4.5"
    "w15|--cfg-weight 1.5"
    "h15|--ddim-steps-high 15"
  )
fi

log() { echo "=== $(date -u +%H:%M:%S) $*"; }
W=artifacts/weights/predator_v2_60k.npz
DS=dataset/EnvPredator_v2
PROBE_GRID="--n-contexts 20 --n-experiments 2 --n-samples 35"

for p in "${PROBES[@]}"; do
  name=${p%%|*}; flags=${p#*|}
  if [ -f "eval_dynab_${name}.json" ]; then
    log "probe $name: cached (eval_dynab_${name}.json exists)"
    continue
  fi
  log "probe $name: $flags"
  # shellcheck disable=SC2086
  python scripts/inference_dynamic.py --dataset $DS --checkpoints $W \
      $PROBE_GRID $flags --results "eval_dynab_${name}.json" \
      > "logs/dynab_${name}.out" 2>&1 || echo "probe $name FAILED"
done

log "picking winner"
WINNER_FLAGS=$(PROBE_TABLE="$(printf '%s\n' "${PROBES[@]}")" python - <<'EOF'
import json, os
rows = [l for l in os.environ["PROBE_TABLE"].splitlines() if l.strip()]
res = {}
for row in rows:
    name = row.split("|", 1)[0]
    try:
        res[name] = json.load(open(f"eval_dynab_{name}.json"))["aggregate"]["score"]
    except Exception:
        pass
for name, score in sorted(res.items(), key=lambda kv: -kv[1]):
    print(f"  {name}: score={score:.3f}", flush=True)
if not res:
    raise SystemExit(0)
best = max(res, key=res.get)
if best != "base" and res[best] > res.get("base", 0.0):
    flags = {r.split("|", 1)[0]: r.split("|", 1)[1] for r in rows}
    print("WINNER " + flags[best])
EOF
)
echo "$WINNER_FLAGS"
WIN=$(echo "$WINNER_FLAGS" | sed -n 's/^WINNER //p')
if [ -n "$WIN" ] && [ ! -f eval_results_dynamic_tuned.json ]; then
  log "full 50x4 grid with tuned flags: $WIN"
  # shellcheck disable=SC2086
  python scripts/inference_dynamic.py --dataset $DS --checkpoints $W \
      --n-contexts 50 --n-experiments 4 --n-samples 35 $WIN \
      --results eval_results_dynamic_tuned.json \
      > logs/eval_dynamic_tuned.out 2>&1 || echo "tuned full grid FAILED"
fi
log "dynamic probe A/B done"
