#!/bin/sh
# Chip-session runbook. Strictly ONE TPU process at a time (memory:
# tpu-tunnel-wedge). Order: the reference operating point runs FIRST
# (VERDICT r4 #1 — it is the highest-information item and must never again
# be starved by the A/B material); everything after it is diagnostics.
set -x
cd "$(dirname "$0")/.."

# 1. Reference operating point prefix: 800^2, 131k capacity, real budget
#    cadences. Scene cached to disk; stage-1 state checkpointed so a second
#    invocation with --resume times stage 2 alone. Record the JSON line in
#    BASELINE.md.
timeout 5400 python scripts/run_refpoint.py 2>&1 | tee /tmp/refpoint.log
sleep 10

# 2. Driver bench at the default (fitted-ladder) config.
timeout 1200 python bench.py 2>&1 | tee /tmp/bench_default.json
sleep 10

# 3. Full-train-step decomposition (loss prefixes, adam, piped/synced/
#    hostloop/autoloop) — the round-5 lens that found the KNN/SSIM sinks.
timeout 3600 python scripts/perf_matrix.py step 2>&1 | tee /tmp/pm_step.log
sleep 10

# 4. A/B regression check of the remaining knobs + ladder fits.
timeout 2400 python scripts/perf_matrix.py variants 2>&1 | tee /tmp/pm_variants.log
sleep 10

# 5. Rasterizer stage decomposition for BASELINE.md.
timeout 1200 python scripts/perf_matrix.py stages 2>&1 | tee /tmp/pm_stages.log
sleep 10

# 6. On-chip test tier (Mosaic legality, VMEM, real-MXU parity).
#    Measured wall: ~9.5 min cold (first-compile), ~8 min warm (r4 judge).
RIGGS_TPU_TESTS=1 timeout 2400 python -m pytest -m tpu -n0 -q 2>&1 | tee /tmp/tpu_tier.log
