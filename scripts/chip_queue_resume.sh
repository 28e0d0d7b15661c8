#!/usr/bin/env bash
# Resume wrapper for the 2026-08-19 chip session: the main queue shell died
# with the previous driver session, leaving one orphan probe running. Wait
# for that probe (by pid) to exit, then re-enter the main queue (every stage
# guards on its cached result file, so completed work is skipped) and the
# follow-up probe batch.
# Run as:
#   nohup bash scripts/chip_queue_resume.sh <orphan_pid> > logs/chip_queue_resume.out 2>&1 &
set -u
cd "$(dirname "$0")/.."
mkdir -p logs

log() { echo "=== $(date -u +%H:%M:%S) $*"; }

ORPHAN=${1:-}
if [ -n "$ORPHAN" ]; then
  log "waiting for orphan probe pid $ORPHAN"
  while kill -0 "$ORPHAN" 2>/dev/null; do sleep 60; done
  log "orphan probe done"
fi

bash scripts/chip_queue.sh
bash scripts/chip_queue3.sh
log "resume queue drained"
