"""The reference operating point on the chip (VERDICT r1 item 3 / r2 #2 / r3 #3 / r4 #1).

The reference trains 800x800 scenes with >=100k-gaussian clouds for
10k node-rendering + 80k full stage-1 iterations and 100k stage-2
iterations with densification 5k->70k
(/root/reference/scripts/run_demo.py:20-52,
/root/reference/arguments/__init__.py:111,167-186). This script runs those
SHAPES — 800², capacity 131072, real budget schedule constants — for a
wall-clock-bounded prefix (or --full, the whole budget) and reports:

  - steady-state ms/iter per phase (median of per-step deltas — compile
    time excluded structurally, not statistically);
  - extrapolated full-budget wall-clock;
  - device-memory residency after each stage (jax.live_arrays; the compiled
    step's true peak incl. temps is measured by `perf_matrix.py step`
    via memory_analysis — 2.76 GB at 800²/131k, BASELINE.md);
  - alive-gaussian growth under the real densification cadence;
  - held-out PSNR/SSIM/MS-SSIM after stage 2;
  - ladder refit counts (printed by the loops).

Resumability (r4 verdict #1): the synthetic scene is built once and cached
to disk; the stage-1 end state is pickled to --out, so a later invocation
with --resume times stage 2 in its own session; stage-2 checkpoints land
under --out via train_stage2(model_path=..., resume=True).

Usage (chip session — run FIRST, one TPU process at a time):
  python scripts/run_refpoint.py                    # ~15-25 min prefix
  python scripts/run_refpoint.py --resume           # skip finished stages
  python scripts/run_refpoint.py --full             # whole reference budget

Record the final JSON line in BASELINE.md.
"""
import argparse
import json
import pickle
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


def mem_live_gb():
    """Device-resident bytes across live arrays (residency, not peak; the
    per-step peak incl. temps comes from perf_matrix.py step memory_analysis
    — axon's memory_stats() returns None, r4 verdict #5)."""
    return round(sum(a.nbytes for a in jax.live_arrays()) / 2**30, 2)


def _to_host(tree):
    return jax.tree.map(lambda a: np.asarray(a), tree)


def _to_device(tree):
    import jax.numpy as jnp

    return jax.tree.map(lambda a: jnp.asarray(a), tree)


def get_scene(args, cache_dir: Path):
    """Build-or-load the 800² synthetic biped scene. The oracle-GT build
    costs ~230 s of host time at 800²/64f — cached to disk, paid once."""
    from riggs_tpu.data.synthetic import make_scene_data

    tag = f"refpoint_s{args.size}_f{args.frames}"
    p = cache_dir / f"{tag}.pkl"
    if p.exists():
        t0 = time.time()
        with open(p, "rb") as f:
            scene = pickle.load(f)
        scene.train_frames = [_to_device(fr) for fr in scene.train_frames]
        scene.test_frames = [_to_device(fr) for fr in scene.test_frames]
        print(f"scene loaded from cache in {time.time() - t0:.0f}s ({p})")
        return scene
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
    cache_dir.mkdir(parents=True, exist_ok=True)
    host = type(scene)(
        train_frames=[_to_host(fr) for fr in scene.train_frames],
        test_frames=[_to_host(fr) for fr in scene.test_frames],
        init_points=np.asarray(scene.init_points),
        init_colors=np.asarray(scene.init_colors),
        cameras_extent=scene.cameras_extent,
        is_blender=scene.is_blender,
        white_background=scene.white_background,
        train_image_names=scene.train_image_names,
    )
    with open(p, "wb") as f:
        pickle.dump(host, f, protocol=4)
    print(f"scene cached to {p}")
    return scene


def main():
    # line-buffer stdout FIRST: a timeout-killed run must still leave every
    # progress line on disk (block-buffered pipes lose everything)
    sys.stdout.reconfigure(line_buffering=True)
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=800)
    ap.add_argument("--capacity", type=int, default=131_072)
    ap.add_argument("--frames", type=int, default=64)
    ap.add_argument("--s1a", type=int, default=800, help="stage-1 node-rendering prefix iters")
    ap.add_argument("--s1b", type=int, default=3000, help="stage-1 full prefix iters")
    ap.add_argument("--s2", type=int, default=3000, help="stage-2 prefix iters")
    ap.add_argument("--full", action="store_true", help="run the whole reference budget")
    ap.add_argument("--resume", action="store_true", help="reuse finished stages from --out")
    ap.add_argument("--out", type=str, default=str(Path(__file__).parent.parent / ".refpoint"))
    ap.add_argument("--test_every", type=int, default=5000,
                    help="stage-2 held-out eval + checkpoint cadence")
    ap.add_argument("--platform", type=str, default=None)
    args = ap.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    if args.full:
        args.s1a, args.s1b, args.s2 = REF_S1_NODE, REF_S1_FULL, REF_S2

    from riggs_tpu.train.config import Config
    from riggs_tpu.train.stage1 import train_stage1
    from riggs_tpu.train.stage2 import evaluate_stage2, train_stage2

    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    scene = get_scene(args, out.parent / ".scene_cache")

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

    report = {"size": args.size, "capacity": args.capacity, "frames": args.frames}
    s1_ckpt = out / "stage1_state.pkl"
    s1_json = out / "stage1_report.json"

    if args.resume and s1_ckpt.exists():
        t0 = time.time()
        with open(s1_ckpt, "rb") as f:
            s1 = _to_device(pickle.load(f))
        report.update(json.loads(s1_json.read_text()))
        print(f"stage-1 state resumed in {time.time() - t0:.0f}s "
              f"({report.get('s1_alive_gaussians')} alive gaussians)")
    else:
        t1 = StepTimer()
        t0 = time.time()
        s1, hist1 = train_stage1(scene, cfg, log_every=500, step_callback=t1)
        s1_wall = time.time() - t0
        s1_part = {
            "s1_prefix_iters": args.s1a + args.s1b,
            "s1_wall_s": round(s1_wall, 1),
            "s1_ms_per_iter": round(t1.ms_per_iter(), 2),
            "mem_live_gb_after_s1": mem_live_gb(),
            "s1_alive_gaussians": int(np.sum(np.asarray(s1.gs.alive))),
        }
        report.update(s1_part)
        print(f"stage 1 prefix: {s1_wall:.0f}s, {report['s1_ms_per_iter']} ms/iter "
              f"steady, {report['s1_alive_gaussians']} alive gaussians, "
              f"live {report['mem_live_gb_after_s1']} GB")
        print("PARTIAL " + json.dumps(report))  # survives a timeout mid-stage-2
        with open(s1_ckpt, "wb") as f:
            pickle.dump(_to_host(s1), f, protocol=4)
        s1_json.write_text(json.dumps(s1_part))
        print(f"stage-1 state checkpointed to {s1_ckpt}")

    t2 = StepTimer()
    t0 = time.time()
    s2, info, hist2 = train_stage2(
        s1, scene, cfg, log_every=500, step_callback=t2,
        test_every=args.test_every, model_path=str(out), resume=args.resume,
    )
    s2_wall = time.time() - t0
    report["s2_prefix_iters"] = args.s2
    report["s2_wall_s"] = round(s2_wall, 1)
    report["s2_ms_per_iter"] = round(t2.ms_per_iter(), 2)
    report["mem_live_gb_after_s2"] = mem_live_gb()
    report["joints"] = int(len(info.joints))
    import jax.numpy as jnp

    # probe-fit an eval ladder: one plain-window render's TRUE tile counts
    # (pre-truncation) -> pow2 ladder; without it the eval escalation path
    # compiles multi-GB full-cap windows on dense scenes (round-5 finding)
    pipe = cfg.pipe
    tiers = (pipe.max_tiles_per_gaussian, pipe.mid_cap, pipe.mid_side)
    from riggs_tpu.models import skeleton_warp as SW
    from riggs_tpu.render.api import render as _render, tier_kwargs
    from riggs_tpu.render.ladder import make_tile_ladder

    f0 = scene.test_frames[0]
    d0 = SW.skeleton_forward(s2.skel, s2.gs.xyz, f0.fid, s2.gs.motion_mask)
    probe = _render(
        f0.cam, s2.gs, jnp.zeros(3), d_xyz=d0["d_xyz"], d_rotation=d0["d_rotation"],
        active_sh_degree=s2.gs.max_sh_degree, max_per_tile=cfg.pipe.max_per_tile,
        **tier_kwargs(tiers),
    )
    eval_ladder = make_tile_ladder(
        np.asarray(probe["tile_counts"]), margin=1.5, quantize="pow2"
    )
    ev = evaluate_stage2(
        s2, scene.test_frames, jnp.zeros(3), tile_ladder=eval_ladder, tiers=tiers,
    )
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
    (out / "report.json").write_text(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
