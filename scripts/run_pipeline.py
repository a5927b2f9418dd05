"""Full two-stage training pipeline (the run_demo.py equivalent).

Usage:
  python scripts/run_pipeline.py --source_path <d-nerf scene dir> --model_path out/
  python scripts/run_pipeline.py --synthetic --model_path out/   # built-in test scene

Stage 1 (node deformation) -> skeleton extraction -> stage 2 (rigged model),
saving reference-compatible artifacts: point_cloud/iteration_N/point_cloud.ply,
skeleton_tree.npz, skeleton.obj, full-state checkpoints and cfg.json.
Mirrors /root/reference/scripts/run_demo.py:20-52 orchestration.
"""
import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", str(Path(__file__).parent.parent / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    from riggs_tpu.train.config import Config, add_config_args, config_from_args

    ap = argparse.ArgumentParser()
    ap.add_argument("--synthetic", action="store_true", help="use the built-in synthetic scene")
    ap.add_argument("--synthetic_size", type=int, default=128)
    ap.add_argument("--synthetic_frames", type=int, default=16)
    ap.add_argument("--synthetic_figure", choices=["chain", "biped"], default="chain")
    ap.add_argument("--synthetic_points", type=int, default=120, help="blob points per segment")
    ap.add_argument("--synthetic_init_points", type=int, default=300, help="random init cloud size")
    ap.add_argument("--stage", choices=["1", "2", "both"], default="both")
    ap.add_argument("--platform", type=str, default=None)
    ap.add_argument("--viewer_port", type=int, default=0, help="serve a live training viewer")
    ap.add_argument("--gui_ip", type=str, default="127.0.0.1", help="SIBR remote-viewer host")
    ap.add_argument(
        "--gui_port", type=int, default=0,
        help="speak the SIBR network_gui protocol on this port (reference train_gui "
        "--ip/--port; each new viewer resolution costs one jit compile)",
    )
    ap.add_argument(
        "--dp", type=int, default=0,
        help="frame-parallel training over a data mesh of this many devices "
        "(riggs_tpu.parallel.stage1_dp/stage2_dp; B frames/step, mean grad psummed over ICI)",
    )
    ap.add_argument(
        "--dp_tile", type=int, default=1,
        help="with --dp: also shard each frame's blend over a 'tile' mesh axis "
        "of this size (2D data x tile parallelism; stage 2)",
    )
    ap.add_argument("--test_every", type=int, default=1000)
    ap.add_argument("--tensorboard", action="store_true")
    ap.add_argument("--resume", action="store_true", help="continue stage 2 from the latest checkpoint")
    ap.add_argument(
        "--detect_anomaly",
        action="store_true",
        help="jax_debug_nans: fail loudly at the op producing the first NaN "
        "(the torch.autograd.set_detect_anomaly equivalent)",
    )
    add_config_args(ap)
    args = ap.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
        if args.platform == "cpu" and args.dp * max(args.dp_tile, 1) > 1:
            # CPU smoke of the multi-chip path: make enough virtual devices
            jax.config.update("jax_num_cpu_devices", args.dp * max(args.dp_tile, 1))
    if args.detect_anomaly:
        jax.config.update("jax_debug_nans", True)
    cfg = config_from_args(args)
    model_path = Path(cfg.model.model_path or "output/run")
    model_path.mkdir(parents=True, exist_ok=True)
    cfg.save(model_path / "cfg.json")

    from riggs_tpu.data.scene import load_scene
    from riggs_tpu.data.synthetic import make_scene_data
    from riggs_tpu.io.checkpoint import save_checkpoint, save_skeleton_tree
    from riggs_tpu.io.obj import write_skeleton_obj
    from riggs_tpu.train.stage1 import train_stage1
    from riggs_tpu.train.stage2 import train_stage2

    if args.synthetic:
        _, scene = make_scene_data(
            n_train=args.synthetic_frames, n_test=max(args.synthetic_frames // 4, 1),
            width=args.synthetic_size, height=args.synthetic_size,
            figure=args.synthetic_figure, points_per_seg=args.synthetic_points,
            n_init_points=args.synthetic_init_points,
        )
    else:
        # type-sniffing dispatch: blender/D-NeRF, ZJU, nerfies, COLMAP
        scene = load_scene(
            cfg.model.source_path,
            white_background=cfg.model.white_background,
            resolution=max(cfg.model.resolution, 1),
        )
    print(f"scene: {len(scene.train_frames)} train / {len(scene.test_frames)} test frames")

    live = {"gs": None, "skel": None, "warp": None}
    if args.viewer_port:
        from riggs_tpu.viz.web_viewer import ViewerServer

        ViewerServer(state_fn=lambda: (live["gs"], live["skel"], live["warp"])).serve(
            port=args.viewer_port, blocking=False
        )

    sibr = None
    if args.gui_port:
        from riggs_tpu.viz.sibr import SibrServer

        sibr = SibrServer(
            args.gui_ip, args.gui_port, verify=str(cfg.model.source_path or model_path)
        )
        print(f"SIBR network_gui listening on {args.gui_ip}:{sibr.port}")

        def sibr_render(cam, scaling_modifier):
            from riggs_tpu.render.api import render as _render

            gs = live["gs"]
            if gs is None:
                import numpy as _np

                return _np.zeros((cam.height, cam.width, 3), _np.float32)
            out = _render(
                cam, gs, jnp.zeros(3), scaling_modifier=scaling_modifier,
                active_sh_degree=gs.max_sh_degree, max_per_tile=cfg.pipe.max_per_tile,
            )
            return out["render"]

    def s1_cb(state, it):
        live["gs"], live["warp"] = state.gs, state.warp
        if sibr is not None:
            sibr.poll(sibr_render)

    def s2_cb(state, it):
        live["gs"], live["skel"], live["warp"] = state.gs, state.skel, None
        if sibr is not None:
            sibr.poll(sibr_render)

    t0 = time.time()
    if args.dp > 1:
        from riggs_tpu.parallel.mesh import make_mesh
        from riggs_tpu.parallel.stage1_dp import train_stage1_dp

        s1, hist1 = train_stage1_dp(
            scene, cfg, make_mesh(data=args.dp, tile=1), log_every=500,
            step_callback=s1_cb if (args.viewer_port or args.gui_port) else None,
            source_path=None if args.synthetic else cfg.model.source_path,
        )
    else:
        s1, hist1 = train_stage1(scene, cfg, log_every=500,
                                 step_callback=s1_cb if (args.viewer_port or args.gui_port) else None,
                                 source_path=None if args.synthetic else cfg.model.source_path)
    print(f"stage 1 done in {time.time() - t0:.0f}s")
    save_checkpoint(model_path, cfg.opt.iterations, s1, gs=s1.gs, cfg=cfg)

    if args.stage in ("2", "both"):
        t0 = time.time()
        logger = None
        if args.tensorboard:
            from riggs_tpu.train.logging import TrainLogger

            logger = TrainLogger(model_path / "tb")
        if args.dp > 1:
            from riggs_tpu.parallel.mesh import make_mesh
            from riggs_tpu.parallel.stage2_dp import train_stage2_dp

            s2, info, hist2 = train_stage2_dp(
                s1,
                scene,
                cfg,
                make_mesh(data=args.dp, tile=args.dp_tile),
                log_every=500,
                test_every=args.test_every,
                model_path=model_path / "rig",
                step_callback=s2_cb if (args.viewer_port or args.gui_port) else None,
            )
        else:
            s2, info, hist2 = train_stage2(
                s1,
                scene,
                cfg,
                log_every=500,
                step_callback=s2_cb if (args.viewer_port or args.gui_port) else None,
                test_every=args.test_every,
                model_path=model_path / "rig",
                logger=logger,
                resume=args.resume,
            )
        print(f"stage 2 done in {time.time() - t0:.0f}s")
        save_skeleton_tree(model_path, info.joints, info.parents, info.joint_node_indices, info.template_idx)
        write_skeleton_obj(model_path / "skeleton.obj", info.joints, info.parents)
        save_checkpoint(model_path / "rig", cfg.opt.iterations, s2, gs=s2.gs, cfg=cfg)

        # final test-set evaluation
        from riggs_tpu.eval.synthesis import render_test_set, format_numerical_res

        if scene.test_frames:
            rows, means, _ = render_test_set(
                s2.gs, s2.skel, scene.test_frames, max_per_tile=cfg.pipe.max_per_tile
            )
            (model_path / "numerical_res.txt").write_text(format_numerical_res(rows, means))
            print("test metrics:", means)


if __name__ == "__main__":
    main()
