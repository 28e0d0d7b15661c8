#!/usr/bin/env bash
# Multi-host data-parallel training demo: two OS processes, one global mesh.
#
# This is the DCN-topology analog runnable on a single machine: each process
# owns its local CPU devices, `jax.distributed.initialize` performs the
# rendezvous (replacing the reference's NCCL MASTER_ADDR/port-retry dance,
# scripts/train/trainddp.py:25-65), and the gradient all-reduce runs as a
# cross-process collective (Gloo on CPU; ICI/DCN on real TPU pods). Success
# criterion: both processes print IDENTICAL global losses each log step and
# exit 0 — the loss is all-reduced over the global batch, so agreement means
# the sharded training step really spans both processes.
#
# On real TPU pods the same flags apply per host:
#   python scripts/train.py ... --coordinator <host0>:1234 \
#       --num-processes <n_hosts> --process-id $HOST_ID
#
# Note: checkpointing is disabled here — orbax's CheckpointManager runs a
# 30s-deadline collective barrier at init, which a 1-core test box can miss
# while the second process is still importing. With one core per process
# (any real deployment) checkpointing works multi-host unchanged.
set -eu
cd "$(dirname "$0")/.."

DS=${1:-/tmp/ramp_mh_ds}
PORT=${PORT:-12675}
OUT=/tmp/ramp_mh
mkdir -p "$OUT"

if [ ! -d "$DS" ]; then
  python scripts/generate_data.py --out "$DS" --n-tasks 3 --n-trajs 6 \
      --horizon 16 --points-per-obstacle 16
fi

common=(--dataset "$DS" --steps 10 --batch-size 8 --n-diffusion-steps 10
        --steps-per-dispatch 5 --unet-dim 8 --dim-mults-option 0
        --platform cpu --coordinator "localhost:$PORT" --num-processes 2)

python scripts/train.py "${common[@]}" --process-id 0 \
    --log-file "$OUT/p0.jsonl" > "$OUT/p0.out" 2>&1 &
P0=$!
python scripts/train.py "${common[@]}" --process-id 1 \
    --log-file "$OUT/p1.jsonl" > "$OUT/p1.out" 2>&1 &
P1=$!
s0=0; s1=0
wait $P0 || s0=$?
wait $P1 || s1=$?

echo "--- process 0 losses"; cat "$OUT/p0.jsonl" || true
echo "--- process 1 losses"; cat "$OUT/p1.jsonl" || true
if [ "$s0" -ne 0 ] || [ "$s1" -ne 0 ]; then
  echo "FAIL: process exit codes p0=$s0 p1=$s1 (see $OUT/p*.out)" >&2
  exit 1
fi
# compare every per-step metric except the host-local wall time
if python - "$OUT/p0.jsonl" "$OUT/p1.jsonl" <<'EOF'
import json, sys
rows = []
for path in sys.argv[1:3]:
    with open(path) as f:
        rows.append([{k: v for k, v in json.loads(l).items()
                      if k != "time_per_step"} for l in f])
sys.exit(0 if rows[0] and rows[0] == rows[1] else 1)
EOF
then
  echo "OK: global losses identical across both processes"
else
  echo "FAIL: losses diverge between processes" >&2
  exit 1
fi
