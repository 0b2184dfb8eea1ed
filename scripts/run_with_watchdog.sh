#!/bin/bash
# Stall watchdog for long chip-bound jobs on the axon tunnel: transient
# tunnel blips can wedge a JAX client forever (observed round 5: training
# froze mid-step with zero CPU advance while a fresh process reached the
# chip fine).  Runs CMD in its own process group, tails its log, and if the
# log goes silent for STALL_S seconds kills the group and relaunches.  The
# wrapped job must be idempotent-resumable (seed_spread.py skips seeds
# whose result JSONs already exist).
#
# Usage: run_with_watchdog.sh LOGFILE STALL_S MAX_RESTARTS CMD...
set -u
LOG=$1; STALL_S=$2; MAX_RESTARTS=$3; shift 3

attempt=0
while :; do
  attempt=$((attempt + 1))
  echo "[watchdog] launch attempt $attempt: $*" >> "$LOG"
  setsid "$@" >> "$LOG" 2>&1 &
  pid=$!
  while kill -0 "$pid" 2>/dev/null; do
    sleep 60
    now=$(date +%s)
    mt=$(stat -c %Y "$LOG" 2>/dev/null || echo "$now")
    if [ $((now - mt)) -ge "$STALL_S" ]; then
      echo "[watchdog] stall: log silent $((now - mt))s, killing pgid $pid" >> "$LOG"
      kill -TERM -- -"$pid" 2>/dev/null
      sleep 5
      kill -KILL -- -"$pid" 2>/dev/null
      break
    fi
  done
  wait "$pid" 2>/dev/null
  rc=$?
  echo "[watchdog] attempt $attempt exited rc=$rc" >> "$LOG"
  if [ "$rc" -eq 0 ]; then
    echo "[watchdog] done" >> "$LOG"
    exit 0
  fi
  if [ "$attempt" -ge "$MAX_RESTARTS" ]; then
    echo "[watchdog] giving up after $attempt attempts" >> "$LOG"
    exit 1
  fi
done
