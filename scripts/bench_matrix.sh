#!/bin/bash
# Bench matrix on the real chip: default vs laddered windows vs MXU-quadratic.
# Also the recovery sequence after a TPU outage (see BASELINE.md round-2 note).
set -x
cd /root/repo
# 1) quick sanity
timeout 300 python -c "import jax; print(jax.devices())" || exit 1
# 2) bench A/B: default vs laddered windows
timeout 1200 python bench.py            2>&1 | tee /tmp/bench_default.json
timeout 1200 python bench.py --ladder   2>&1 | tee /tmp/bench_ladder.json
timeout 1200 python bench.py --quad-mxu 2>&1 | tee /tmp/bench_quad.json
timeout 1200 python bench.py --ladder --quad-mxu 2>&1 | tee /tmp/bench_ladder_quad.json
# 3) forward-only FPS (ladder)
timeout 1200 python scripts/test_speed.py --synthetic --renders 200 --size 800 2>&1 | tee /tmp/speed_plain.log
# 4) refscale resume is NOT auto-started: a long background training would
# contend with the driver's end-of-round bench run (single-tenant chip).
# Start manually with an explicit wall-clock budget:
#   nohup timeout 5400 python scripts/resume_stage2.py --model_path output/refscale \
#     --test_every 4000 > output/refscale_s2_resume.log 2>&1 &
echo "chipback benches complete"
