#!/usr/bin/env bash
# Stall watchdog for long TPU jobs on the single-client tunnel.
#
# The tunnel occasionally wedges the first RPC of a freshly-registered client
# (observed: a new process connecting seconds after the previous client
# disconnected blocks forever in the remote-compile wait with ~zero CPU).
# Because every long-running entry point here is phase-idempotent
# (accuracy_loop.py resumes from artifacts), the safe fix is: detect the
# stall (log silent AND process CPU flat) and restart after a cooldown.
#
# Usage: scripts/run_watchdog.sh LOGFILE -- python scripts/accuracy_loop.py ...
set -u

LOG="$1"; shift
[ "$1" = "--" ] && shift

STALL_SECS="${STALL_SECS:-900}"   # log silence required to call it a stall
CPU_DELTA_MIN=5                   # jiffies of CPU growth that count as alive
COOLDOWN="${COOLDOWN:-60}"        # tunnel settle time before relaunch
MAX_RESTARTS="${MAX_RESTARTS:-20}"

# Sum CPU jiffies over a pid and ALL its descendants: a wrapped command
# (`run_watchdog.sh LOG -- bash -c '...'`) parks the direct child in wait()
# with flat CPU, which would read as a stall while the grandchild works.
total_cpu() {
  pids="$1"; all=""
  while [ -n "$pids" ]; do
    all="$all $pids"
    pids=$(ps -o pid= --ppid "$(echo "$pids" | tr ' ' ',' | sed 's/^,//;s/,$//')" 2>/dev/null | tr '\n' ' ' | sed 's/^ *//;s/ *$//')
  done
  sum=0
  for p in $all; do
    j=$(awk '{print $14+$15}' "/proc/$p/stat" 2>/dev/null) || j=0
    sum=$((sum + ${j:-0}))
  done
  echo "$sum"
}

restarts=0
while [ "$restarts" -le "$MAX_RESTARTS" ]; do
  # setsid: the job gets its own process group (pgid = pid), so a stall-kill
  # can take down DESCENDANTS too — killing only the direct child leaves a
  # wedged grandchild holding the single-client tunnel registration, which
  # wedges every relaunch (and its log writes keep resetting the stall clock)
  setsid "$@" >> "$LOG" 2>&1 &
  pid=$!
  echo "[watchdog] started pid=$pid (restart #$restarts)" >> "$LOG"
  last_cpu=0
  while kill -0 "$pid" 2>/dev/null; do
    sleep 60
    kill -0 "$pid" 2>/dev/null || break
    now=$(date +%s)
    mtime=$(stat -c %Y "$LOG" 2>/dev/null || echo "$now")
    cpu=$(total_cpu "$pid")
    if [ $((now - mtime)) -ge "$STALL_SECS" ] \
       && [ $((cpu - last_cpu)) -lt "$CPU_DELTA_MIN" ]; then
      echo "[watchdog] stall: log silent $((now - mtime))s, cpu flat" \
           "($last_cpu -> $cpu) - restarting" >> "$LOG"
      kill -- "-$pid" 2>/dev/null; sleep 5; kill -9 -- "-$pid" 2>/dev/null
      break
    fi
    last_cpu=$cpu
  done
  # capture wait's status DIRECTLY: `rc=$?` after an if-statement reads the
  # if-block's status (0 when the condition is false and there is no else),
  # which made stall-kills exit 0 here instead of restarting
  wait "$pid" 2>/dev/null
  rc=$?
  if [ "$rc" -eq 0 ]; then
    echo "[watchdog] job finished cleanly" >> "$LOG"
    exit 0
  fi
  echo "[watchdog] exit rc=$rc; cooldown ${COOLDOWN}s then restart" >> "$LOG"
  sleep "$COOLDOWN"
  restarts=$((restarts + 1))
done
echo "[watchdog] gave up after $MAX_RESTARTS restarts" >> "$LOG"
exit 1
