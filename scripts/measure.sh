#!/bin/bash
# On-chip measurement sequence (run when the TPU backend is healthy).
# Usage: scripts/measure.sh [round-tag]   (default: r4)
#
# One process at a time — each step owns the chip (CLAUDE.md: single-process
# timings only). Logs to /tmp/measure_${ROUND}.log. On completion writes a
# stamp (/tmp/measure_${ROUND}.done) and copies the default-config bench JSON
# line to /root/repo/BENCH_LATEST.json so a mid-outage round can still hand
# the driver a fresh number the moment the tunnel blinks on.
set -u
ROUND="${1:-r4}"
cd /root/repo
LOG=/tmp/measure_${ROUND}.log
STAMP=/tmp/measure_${ROUND}.done
: > "$LOG"
run() {
  echo "=== $(date +%H:%M:%S) $* ===" | tee -a "$LOG"
  timeout 3000 "$@" >> "$LOG" 2>&1
  echo "--- rc=$? ---" | tee -a "$LOG"
}

# 1. paired-vs-plain parity at bench shapes (correctness gate for the new
#    bench default) + unpaired-kernel perf guardrail
run python scripts/check_paired_parity_tpu.py --scenes 8
run python scripts/perf_guardrail.py
# 2. headline bench FIRST so BENCH_LATEST.json exists even if later steps
#    hit a fresh outage (default S=64 — the measured 2026-08-19 sweet spot,
#    unlocked by v4 raw mode)
echo "=== $(date +%H:%M:%S) python bench.py (headline) ===" | tee -a "$LOG"
timeout 3000 python bench.py 2>> "$LOG" | tee -a "$LOG" | tail -1 > /tmp/bench_headline.json
if python -c "import json,sys; json.load(open('/tmp/bench_headline.json'))" 2>/dev/null; then
  cp /tmp/bench_headline.json /root/repo/BENCH_LATEST.json
  echo "BENCH_LATEST.json written" | tee -a "$LOG"
fi
# 3. bench sweep for the amortization curve
run python bench.py --scenes 8
run python bench.py --scenes 16
run python bench.py --scenes 32
# 4. train-path numbers (defaults measured 2026-08-19: S=10 + train_raw
#    + packed_slots = 12.38 scenes/s; S>=11 OOMs HBM; remat of any policy
#    cannot cut the bwd peak — PERF.md round-8.
#    packed_chain measured -10% on 2026-08-18 and was dropped)
run python bench.py --train
run python bench.py --train --no-train-raw
run python bench.py --train --no-packed-slots
# train per-scale sort: measured 12.83 vs 12.48 scenes/s (2026-08-19,
# measure_r5j) — default ON; keep the A/B honest with the off row
run python bench.py --train --no-train-per-scale-sort
# 5. serving mode: precomputed SA1 geometry (separate, clearly-labeled
#    metric — fixed-eval-set / validate-every-epoch access pattern)
run python bench.py --serving --scenes 16
run python bench.py --serving --scenes 32
run python bench.py --serving --scenes 64
# 6. A/B knobs (exact, opt-in; last so a compile failure cannot cost the
#    main numbers). serving_fused and packed_chain were DELETED in round 5
#    (measured −26% / −10%, PERF.md round-8).
run python bench.py --scenes 16 --paired-sa2
run python bench.py --no-per-scale-sort
# (the 2026-08-18 per_scale_sort / eval-subtile-64 worker crashes did NOT
# reproduce on the raw-mode kernels — isolated repros scripts/crash_repro.py
# and full bench runs were clean 2026-08-19, and per_scale_sort measured
# 68.3 vs 66.1 and is now the default. If a kernel fault ever recurs, run
# crash repros LAST: a fault poisons ~4 min of subsequent steps.)
# 7. attribution passes (inform the next lever, cost nothing above):
#    serving stage split (cache build / steady-state / SA1-alone vs tail)
run python scripts/bench_serving.py
# summary table straight into the log
run python scripts/summarize_measure.py "$LOG"

date > "$STAMP"
echo "=== DONE $(date +%H:%M:%S) ===" | tee -a "$LOG"
