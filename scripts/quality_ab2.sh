#!/usr/bin/env bash
# Follow-up to quality_ab.sh: DDIM-10 reduced plain success (0.679 vs 0.721
# base) while CFG w=3 improved it (0.750, diversity up too). Push further
# along the winning axis (w=4) and probe a fewer-steps variant.
set -u
cd "$(dirname "$0")/.."
mkdir -p logs

if [ -f /tmp/qab.pid ]; then
  P=$(cat /tmp/qab.pid)
  while kill -0 "$P" 2>/dev/null; do sleep 60; done
fi

log() { echo "=== $(date -u +%H:%M:%S) $*"; }
W=artifacts/weights/simple2d_v2.npz
DS=dataset/EnvSimple2dquant_v2
PROBE="--max-envs 24 --n-contexts 10 --n-samples 20"

run_probe() {
  local name=$1; shift
  log "probe $name: $*"
  python scripts/inference_static.py --dataset $DS --checkpoints $W $PROBE \
      --results "eval_ab_${name}.json" "$@" \
      > "logs/ab_${name}.out" 2>&1 || echo "probe $name FAILED"
}

run_probe d5w4 --cfg-weight 4
run_probe d3w3 --ddim-steps 3 --cfg-weight 3

python - <<'EOF' > /tmp/ab2_winner.txt
import json
probes = {
    "base": [],
    "d5w3": ["--cfg-weight", "3"],
    "d5w4": ["--cfg-weight", "4"],
    "d3w3": ["--ddim-steps", "3", "--cfg-weight", "3"],
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
cat /tmp/ab2_winner.txt

FLAGS=$(grep ^WINNER /tmp/ab2_winner.txt | cut -d' ' -f2-)
if [ -n "${FLAGS:-}" ]; then
  log "full tuned grid with: $FLAGS"
  python scripts/inference_static.py --dataset $DS --checkpoints $W \
      --n-contexts 20 --n-samples 20 $FLAGS \
      --results eval_results_static_tuned.json \
      > logs/eval_static_tuned.out 2>&1 || echo "tuned grid FAILED"
fi
log "quality A/B 2 done"
