#!/bin/bash
# Round-3 on-chip measurement sequence (run when the TPU backend is healthy).
# One process at a time — each step owns the chip (CLAUDE.md: single-process
# timings only). Logs to /tmp/r3_measure.log.
set -u
cd /root/repo
LOG=/tmp/r3_measure.log
: > "$LOG"
run() {
  echo "=== $(date +%H:%M:%S) $* ===" | tee -a "$LOG"
  timeout 3000 "$@" >> "$LOG" 2>&1
  echo "--- rc=$? ---" | tee -a "$LOG"
}

# 1. paired-vs-plain parity + timing at bench shapes
run python scripts/check_paired_parity_tpu.py --scenes 8
# 2. unpaired-kernel guardrail (regression check)
run python scripts/perf_guardrail.py
# 3. bench sweep: default S=16, then 8 and 32 for the amortization curve
run python bench.py --scenes 16
run python bench.py --scenes 8
run python bench.py --scenes 32
run python bench.py --scenes 64
# 4. train-path number for the PERF table
run python bench.py --train --scenes 8
# 5. A/B: SA2 pair sharing (exact, opt-in; run last so a compile failure
#    cannot cost the main numbers)
run python bench.py --scenes 16 --paired-sa2
# 6. train amortization: does S=16 lift the 11.2 at S=8?
run python bench.py --train --scenes 16
# 7. A/B: lane-packed train BN/MLP chain (exact; halves C=64 plane traffic
#    AND peak grouped-plane memory)
run python bench.py --train --scenes 8 --packed-chain
run python bench.py --train --scenes 16 --packed-chain

echo "=== DONE $(date +%H:%M:%S) ===" | tee -a "$LOG"
