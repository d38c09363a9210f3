#!/bin/bash
# Probe the TPU every 10 min; when it answers, wait for any running CPU
# suite (pid in /tmp/suite.pid) to finish, then run the round-3 on-chip
# measurement sequence (scripts/r3_measure.sh). Logs to /tmp/tpu_watch.log.
set -u
cd /root/repo
LOG=/tmp/tpu_watch.log
: > "$LOG"
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
echo "starting r3_measure at $(date +%H:%M:%S)" >> "$LOG"
bash scripts/r3_measure.sh >> "$LOG" 2>&1
echo "r3_measure done at $(date +%H:%M:%S)" >> "$LOG"
