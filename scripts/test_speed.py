"""Rendering-throughput harness (GUI.test_speed equivalent,
/root/reference/train_gui.py:1814-1823): N forward renders -> FPS.

  python scripts/test_speed.py [--model_path out/]   # trained model
  python scripts/test_speed.py --synthetic           # built-in scene
"""
import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax

jax.config.update("jax_compilation_cache_dir", str(Path(__file__).parent.parent / ".jax_cache"))


def main():
    import jax.numpy as jnp
    import numpy as np

    ap = argparse.ArgumentParser()
    ap.add_argument("--model_path", default=None)
    ap.add_argument("--synthetic", action="store_true")
    ap.add_argument("--renders", type=int, default=500)
    ap.add_argument("--size", type=int, default=800)
    ap.add_argument("--platform", default=None)
    ap.add_argument(
        "--ladder", action="store_true",
        help="probe 8 poses, fit count-adaptive tile windows (render/ladder.py)",
    )
    args = ap.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from riggs_tpu.models import skeleton_warp as SW
    from riggs_tpu.render.api import render

    if args.model_path:
        from riggs_tpu.io.checkpoint import load_skeleton_tree
        from riggs_tpu.io.ply import load_gaussians_ply
        from riggs_tpu.train.config import Config

        mp = Path(args.model_path)
        cfg = Config.load(mp / "cfg.json")
        joints, parents, _, _ = load_skeleton_tree(mp)
        gs = load_gaussians_ply(
            sorted((mp / "rig" / "point_cloud").glob("iteration_*/point_cloud.ply"))[-1],
            capacity=cfg.model.capacity,
            max_sh_degree=cfg.model.sh_degree,
            with_motion_mask=cfg.model.gs_with_motion_mask,
        )
        skel = SW.init_skeleton_warp(jax.random.PRNGKey(0), joints, parents)
        from riggs_tpu.camera.orbit import OrbitCamera

        cam = OrbitCamera(width=args.size, height=args.size).to_camera()
    else:
        import __graft_entry__ as g

        scene, state = g._build_tiny_scene(width=64, height=64)
        gs, skel = state.gs, state.skel
        from riggs_tpu.camera.orbit import OrbitCamera

        cam = OrbitCamera(width=args.size, height=args.size).to_camera()

    bg = jnp.zeros(3)
    blend = "pallas" if jax.devices()[0].platform != "cpu" else "jnp"

    extra = {}
    if args.ladder and blend == "pallas":
        # per-pose tile counts vary as the skeleton animates: probe a few
        # poses and fit the rank envelope (make_tile_ladder multi-frame form)
        from riggs_tpu.render.ladder import make_tile_ladder

        @jax.jit
        def probe(t):
            d = SW.skeleton_forward(skel, gs.xyz, t, gs.motion_mask)
            return render(
                cam, gs, bg, d_xyz=d["d_xyz"], d_rotation=d["d_rotation"],
                active_sh_degree=gs.max_sh_degree, blend=blend,
            )["tile_counts"]

        counts = np.stack([np.asarray(probe(jnp.asarray(t / 8))) for t in range(8)])
        extra["tile_ladder"] = make_tile_ladder(counts)
        print(f"ladder: {extra['tile_ladder']}")

    @jax.jit
    def frame(t):
        d = SW.skeleton_forward(skel, gs.xyz, t, gs.motion_mask)
        return render(
            cam,
            gs,
            bg,
            d_xyz=d["d_xyz"],
            d_rotation=d["d_rotation"],
            active_sh_degree=gs.max_sh_degree,
            blend=blend,
            **extra,
        )["render"]

    out = frame(jnp.asarray(0.0))
    out.block_until_ready()
    t0 = time.perf_counter()
    for i in range(args.renders):
        out = frame(jnp.asarray(i / args.renders))
    out.block_until_ready()
    dt = time.perf_counter() - t0
    fps = args.renders / dt
    print(f"{args.renders} renders at {args.size}x{args.size}: {dt:.2f}s = {fps:.1f} FPS "
          f"({args.size*args.size*fps/1e6:.1f} Mpix/s)")


if __name__ == "__main__":
    main()
