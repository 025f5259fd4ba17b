#!/usr/bin/env bash
# Bench session wrapper: run the standing device regression gates FIRST,
# record their outcome, then the headline bench.  The round-1 lesson
# (a kernel VMEM-budget bug shipped and survived two rounds because device
# paths only ran at manual bench time) is why the gate is part of every
# session, with its pass/fail written to the session log.
#
#   bash scripts/bench_session.sh [logfile]
set -u
cd "$(dirname "$0")/.."
LOG="${1:-/tmp/bench_session.log}"

echo "[bench-session] device gates..." | tee -a "$LOG"
GVI_DEVICE_TESTS=1 timeout 3000 python -m pytest tests/device/ -q -n 0 \
    2>&1 | tail -3 | tee -a "$LOG"
GATE=${PIPESTATUS[0]}
TS=$(date -u +%FT%TZ)
echo "{\"ts\": \"$TS\", \"event\": \"device_gate\", \"exit\": $GATE}" \
    | tee -a "$LOG"
if [ "$GATE" -ne 0 ]; then
    echo "[bench-session] DEVICE GATES FAILED - aborting bench" | tee -a "$LOG"
    exit "$GATE"
fi

echo "[bench-session] bench..." | tee -a "$LOG"
timeout 4000 python bench.py 2>>"$LOG" | tee -a "$LOG"
exit "${PIPESTATUS[0]}"
