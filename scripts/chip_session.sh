#!/bin/sh
# Next-chip-session runbook (round 4). Strictly ONE TPU process at a time
# (memory: tpu-tunnel-wedge). Order = highest information first, so a
# session cut short still yields the A/B decisions.
set -x
cd "$(dirname "$0")/.."

# 1. A/B every opt-in knob, in-process (parity+overflow-checked). Decisions:
#    default-on or DELETE each of struct-bwd / gm / packed-sort.
timeout 2400 python scripts/perf_matrix.py variants 2>&1 | tee /tmp/pm_variants.log
sleep 10

# 2. Stage decomposition for BASELINE.md.
timeout 1200 python scripts/perf_matrix.py stages 2>&1 | tee /tmp/pm_stages.log
sleep 10

# 3. Driver bench at the (possibly updated) default config.
timeout 1200 python bench.py 2>&1 | tee /tmp/bench_default.json
sleep 10

# 4. On-chip test tier (Mosaic legality, VMEM, parity).
RIGGS_TPU_TESTS=1 timeout 1800 python -m pytest -m tpu -n0 -q 2>&1 | tee /tmp/tpu_tier.log
sleep 10

# 5. Reference operating point prefix: 800^2, 131k capacity, real budget
#    cadences; ~30-45 min. Record the JSON line in BASELINE.md.
timeout 3600 python scripts/run_refpoint.py 2>&1 | tee /tmp/refpoint.log
