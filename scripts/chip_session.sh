#!/bin/sh
# Chip-session runbook. Strictly ONE TPU process at a time (memory:
# tpu-tunnel-wedge). Order = highest information first, so a session cut
# short still yields the decisions.
#
# Round-4 session already decided the opt-in knobs (BASELINE.md table):
# struct-bwd DELETED (33.8 ms), packed-sort DELETED (25.4 ms), gm made
# unconditional (21.3 ms), fitted 6-bucket margin-1.0 ladder now the bench
# default (20.75 ms), BWD_CHUNK stays 128 (256/384 regress).
set -x
cd "$(dirname "$0")/.."

# 1. Driver bench at the default (fitted-ladder) config.
timeout 1200 python bench.py 2>&1 | tee /tmp/bench_default.json
sleep 10

# 2. A/B regression check of the remaining knobs + ladder fits.
timeout 2400 python scripts/perf_matrix.py variants 2>&1 | tee /tmp/pm_variants.log
sleep 10

# 3. Stage decomposition for BASELINE.md.
timeout 1200 python scripts/perf_matrix.py stages 2>&1 | tee /tmp/pm_stages.log
sleep 10

# 4. On-chip test tier (Mosaic legality, VMEM, real-MXU parity).
RIGGS_TPU_TESTS=1 timeout 2400 python -m pytest -m tpu -n0 -q 2>&1 | tee /tmp/tpu_tier.log
sleep 10

# 5. Reference operating point prefix: 800^2, 131k capacity, real budget
#    cadences; ~30-45 min. Record the JSON line in BASELINE.md.
timeout 5400 python scripts/run_refpoint.py 2>&1 | tee /tmp/refpoint.log
