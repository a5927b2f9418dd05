"""The reference operating point on the chip (VERDICT r1 item 3 / r2 #2 / r3 #3).

The reference trains 800x800 scenes with >=100k-gaussian clouds for
10k node-rendering + 80k full stage-1 iterations and 100k stage-2
iterations with densification 5k->70k
(/root/reference/scripts/run_demo.py:20-52,
/root/reference/arguments/__init__.py:111,167-186). This script runs those
SHAPES — 800², capacity 131072, real budget schedule constants — for a
wall-clock-bounded prefix of the iteration budgets and reports:

  - steady-state ms/iter per phase (median of per-step deltas — compile
    time excluded structurally, not statistically);
  - extrapolated full-budget wall-clock;
  - peak device memory;
  - ladder refit count under densification pressure (printed by the loops).

Usage (chip session):
  python scripts/run_refpoint.py                 # ~30 min prefix
  python scripts/run_refpoint.py --s1a 400 --s1b 1500 --s2 1500   # shorter
  python scripts/run_refpoint.py --full          # the whole reference budget

Record the output in BASELINE.md. Run alone (memory: tpu-tunnel-wedge).
"""
import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax

jax.config.update("jax_compilation_cache_dir", str(Path(__file__).parent.parent / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np

# reference budgets (arguments/__init__.py:111,167-186; run_demo.py:20-52)
REF_S1_NODE = 10_000
REF_S1_FULL = 80_000
REF_S2 = 100_000
REF_DENSIFY_FROM = 5_000
REF_DENSIFY_UNTIL = 70_000


class StepTimer:
    """Per-iteration wall-clock via step_callback; median delta = steady
    state (compiles/evals appear as outliers, excluded by the median)."""

    def __init__(self):
        self.ts = []

    def __call__(self, state, it):
        self.ts.append(time.perf_counter())

    def ms_per_iter(self):
        d = np.diff(np.asarray(self.ts))
        return float(np.median(d) * 1e3) if len(d) > 8 else float("nan")


def mem_peak_gb():
    stats = jax.local_devices()[0].memory_stats() or {}
    peak = stats.get("peak_bytes_in_use") or stats.get("bytes_in_use")
    return round(peak / 2**30, 2) if peak else None  # None on CPU backends


def main():
    # line-buffer stdout FIRST: a timeout-killed run must still leave every
    # progress line on disk (block-buffered pipes lose everything)
    sys.stdout.reconfigure(line_buffering=True)
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=800)
    ap.add_argument("--capacity", type=int, default=131_072)
    ap.add_argument("--frames", type=int, default=48)
    ap.add_argument("--s1a", type=int, default=800, help="stage-1 node-rendering prefix iters")
    ap.add_argument("--s1b", type=int, default=3000, help="stage-1 full prefix iters")
    ap.add_argument("--s2", type=int, default=3000, help="stage-2 prefix iters")
    ap.add_argument("--full", action="store_true", help="run the whole reference budget")
    ap.add_argument("--platform", type=str, default=None)
    args = ap.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    if args.full:
        args.s1a, args.s1b, args.s2 = REF_S1_NODE, REF_S1_FULL, REF_S2

    from riggs_tpu.data.synthetic import make_scene_data
    from riggs_tpu.train.config import Config
    from riggs_tpu.train.stage1 import train_stage1
    from riggs_tpu.train.stage2 import evaluate_stage2, train_stage2

    # a biped at 800x800 with a dense enough blob cloud to exercise the
    # >=100k capacity (init cloud 60k random points; densification grows it)
    t0 = time.time()
    n_init = min(60_000, args.capacity // 2)
    pps = 400 if args.size >= 400 else 60  # keep the CPU smoke tiny
    _, scene = make_scene_data(
        n_train=args.frames, n_test=max(args.frames // 8, 2),
        width=args.size, height=args.size, figure="biped",
        points_per_seg=pps, n_init_points=n_init, max_thinned=1024,
    )
    print(f"scene built in {time.time() - t0:.0f}s "
          f"({len(scene.train_frames)} train frames at {args.size}^2)")

    cfg = Config()
    cfg.model.capacity = args.capacity
    cfg.model.node_num = 512                      # reference run_demo.py:15
    cfg.pipe.max_per_tile = 768
    o = cfg.opt
    o.iterations_node_rendering = args.s1a
    # node sampling phase scales with the node-rendering prefix
    o.iterations_node_sampling = int(args.s1a * 0.75)
    o.iterations = args.s1b
    o.iterations_stage2 = args.s2  # independent stage-2 budget (own field)
    # REAL cadence constants — the prefix sees the same densification
    # pressure per iteration as the full run
    o.densify_from_iter = min(REF_DENSIFY_FROM, max(args.s1b // 6, 200))
    o.densify_until_iter = REF_DENSIFY_UNTIL
    o.gs_densification_iterations = min(REF_DENSIFY_FROM, max(args.s2 // 6, 200))
    o.skeleton_warm_up = min(1_000, max(args.s2 // 10, 50))
    o.optimize_template_offsets_iters = min(15_000, max(args.s2 // 3, 100))

    report = {"size": args.size, "capacity": args.capacity}

    t1 = StepTimer()
    t0 = time.time()
    s1, hist1 = train_stage1(scene, cfg, log_every=500, step_callback=t1)
    s1_wall = time.time() - t0
    report["s1_prefix_iters"] = args.s1a + args.s1b
    report["s1_wall_s"] = round(s1_wall, 1)
    report["s1_ms_per_iter"] = round(t1.ms_per_iter(), 2)
    report["mem_peak_gb_after_s1"] = mem_peak_gb()
    n_gs = int(np.sum(np.asarray(s1.gs.alive)))
    report["s1_alive_gaussians"] = n_gs
    print(f"stage 1 prefix: {s1_wall:.0f}s, {report['s1_ms_per_iter']} ms/iter "
          f"steady, {n_gs} alive gaussians, peak {report['mem_peak_gb_after_s1']} GB")
    print("PARTIAL " + json.dumps(report))  # survives a timeout mid-stage-2

    t2 = StepTimer()
    t0 = time.time()
    s2, info, hist2 = train_stage2(s1, scene, cfg, log_every=500, step_callback=t2)
    s2_wall = time.time() - t0
    report["s2_prefix_iters"] = args.s2 if not args.full else REF_S2
    report["s2_wall_s"] = round(s2_wall, 1)
    report["s2_ms_per_iter"] = round(t2.ms_per_iter(), 2)
    report["mem_peak_gb_after_s2"] = mem_peak_gb()
    report["joints"] = int(len(info.joints))
    import jax.numpy as jnp

    ev = evaluate_stage2(s2, scene.test_frames, jnp.zeros(3))
    report["test"] = {k: round(float(v), 3) for k, v in ev.items()}
    print(f"stage 2 prefix: {s2_wall:.0f}s, {report['s2_ms_per_iter']} ms/iter, "
          f"J={report['joints']}, test={report['test']}")

    # explicit full-budget extrapolation from steady-state ms/iter
    full_s = (
        (REF_S1_NODE + REF_S1_FULL) * report["s1_ms_per_iter"]
        + REF_S2 * report["s2_ms_per_iter"]
    ) / 1e3
    report["extrapolated_full_budget_hours"] = round(full_s / 3600, 2)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
