#!/bin/bash
# Restart-safe TPU watcher: probe the chip every 10 min; when it answers,
# wait for any running CPU suite (pid in /tmp/suite.pid), then run the
# on-chip measurement sequence (scripts/measure.sh $ROUND) exactly once.
#
# Usage: bash scripts/tpu_watch_and_measure.sh [round-tag] &   (default: r4)
#
# Idempotent: exits immediately if the round's completion stamp exists or
# another watcher instance is alive (pid in /tmp/tpu_watch.pid). Safe to
# re-launch at session start — the stamp, not the process, records progress.
# Logs append to /tmp/tpu_watch.log (never truncated, so restarts keep
# history).
set -u
ROUND="${1:-r4}"
cd /root/repo
LOG=/tmp/tpu_watch.log
PIDFILE=/tmp/tpu_watch.pid
STAMP=/tmp/measure_${ROUND}.done

if [ -f "$STAMP" ]; then
  echo "[$ROUND] already measured ($(cat "$STAMP")); nothing to do" >> "$LOG"
  exit 0
fi
if [ -f "$PIDFILE" ] && kill -0 "$(cat "$PIDFILE")" 2>/dev/null; then
  echo "[$ROUND] watcher already running (pid $(cat "$PIDFILE"))" >> "$LOG"
  exit 0
fi
echo $$ > "$PIDFILE"
echo "[$ROUND] watcher started pid $$ at $(date +%H:%M:%S)" >> "$LOG"

probe() {
  timeout 240 python - <<'EOF' >> "$LOG" 2>&1
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/or4d_jax_cache_tpu")
import jax.numpy as jnp
x = jnp.ones((128, 128))
print("probe ok:", float((x @ x).sum()), jax.devices())
EOF
}

while true; do
  echo "=== probe $(date +%H:%M:%S) ===" >> "$LOG"
  if probe; then
    echo "TPU BACK at $(date +%H:%M:%S)" >> "$LOG"
    break
  fi
  sleep 600
done
# Wait for the CPU suite so host contention doesn't skew bench timings.
if [ -f /tmp/suite.pid ]; then
  SP=$(cat /tmp/suite.pid)
  while kill -0 "$SP" 2>/dev/null; do
    echo "waiting for CPU suite pid $SP $(date +%H:%M:%S)" >> "$LOG"
    sleep 120
  done
fi
echo "starting measure.sh $ROUND at $(date +%H:%M:%S)" >> "$LOG"
bash scripts/measure.sh "$ROUND" >> "$LOG" 2>&1
echo "measure.sh $ROUND done at $(date +%H:%M:%S)" >> "$LOG"
