#!/bin/sh
# Bench matrix on the real chip: default (tier4+ladder) vs every A/B knob.
# Run variants strictly in sequence — two TPU processes wedge the tunnel
# (memory: tpu-tunnel-wedge). EVERY opt-in knob on main must appear here
# (VERDICT r3 Weak #3: unmeasured flags rot — measure, then default-on or
# delete, within the round the code lands).
set -x
cd "$(dirname "$0")/.."
timeout 1200 python bench.py 2>&1 | tee /tmp/bench_default.json
sleep 10
timeout 1200 python bench.py --no-ladder 2>&1 | tee /tmp/bench_noladder.json
sleep 10
timeout 1200 python bench.py --no-tiers 2>&1 | tee /tmp/bench_notiers.json
sleep 10
timeout 1200 python bench.py --no-ladder --no-tiers 2>&1 | tee /tmp/bench_plain.json
