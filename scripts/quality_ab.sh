#!/usr/bin/env bash
# Beyond-parity quality A/B on the static planner: probes inference-time
# knobs (DDIM step count, CFG weight) on a 24-env x 10-context subgrid with
# the flagship v2 weights, then re-runs the FULL 96x20 grid with the best
# probe config if it beats the parity default by >1% success.
#
# Waits for the eval campaign (pid in /tmp/evalcamp.pid) to release the TPU.
set -u
cd "$(dirname "$0")/.."
mkdir -p logs

if [ -f /tmp/evalcamp.pid ]; then
  P=$(cat /tmp/evalcamp.pid)
  while kill -0 "$P" 2>/dev/null; do sleep 60; done
fi

log() { echo "=== $(date -u +%H:%M:%S) $*"; }
W=artifacts/weights/simple2d_v2.npz
DS=dataset/EnvSimple2dquant_v2
PROBE="--max-envs 24 --n-contexts 10 --n-samples 20"

run_probe() {  # name, extra flags...
  local name=$1; shift
  log "probe $name: $*"
  python scripts/inference_static.py --dataset $DS --checkpoints $W $PROBE \
      --results "eval_ab_${name}.json" "$@" \
      > "logs/ab_${name}.out" 2>&1 || echo "probe $name FAILED"
}

run_probe base
run_probe d10w2 --ddim-steps 10
run_probe d5w3 --cfg-weight 3
run_probe d10w3 --ddim-steps 10 --cfg-weight 3

log "picking winner"
python - <<'EOF' > /tmp/ab_winner.txt
import json
probes = {
    "base": [],
    "d10w2": ["--ddim-steps", "10"],
    "d5w3": ["--cfg-weight", "3"],
    "d10w3": ["--ddim-steps", "10", "--cfg-weight", "3"],
}
res = {}
for name in probes:
    try:
        res[name] = json.load(open(f"eval_ab_{name}.json"))["aggregate"]["success_rate"]
    except Exception:
        res[name] = -1.0
print(json.dumps(res))
best = max(res, key=res.get)
if best != "base" and res[best] > res["base"] + 0.01:
    print("WINNER " + " ".join(probes[best]))
else:
    print("NOWINNER")
EOF
cat /tmp/ab_winner.txt

FLAGS=$(grep ^WINNER /tmp/ab_winner.txt | cut -d' ' -f2-)
if [ -n "${FLAGS:-}" ]; then
  log "full tuned grid with: $FLAGS"
  python scripts/inference_static.py --dataset $DS --checkpoints $W \
      --n-contexts 20 --n-samples 20 $FLAGS \
      --results eval_results_static_tuned.json \
      > logs/eval_static_tuned.out 2>&1 || echo "tuned grid FAILED"
fi
log "quality A/B done"
