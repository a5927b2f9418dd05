"""Stage-2 rendering / synthesis CLI (render_rig.py equivalent).

Modes (parity with /root/reference/render_rig.py:468-494):
  render — test-set evaluation with metrics, skinning-weight renders, videos
  time   — 200-frame time interpolation at a fixed view
  motion — random novel-pose synthesis videos

Loads the artifacts written by scripts/run_pipeline.py.
"""
import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax

jax.config.update("jax_compilation_cache_dir", str(Path(__file__).parent.parent / ".jax_cache"))


def save_video(path: Path, frames, fps: int = 30):
    """mp4 when an ffmpeg backend exists, else GIF + PNG frames (this image
    ships imageio without ffmpeg)."""
    import imageio
    import numpy as np

    arr = [np.clip(np.asarray(f) * 255, 0, 255).astype("uint8") for f in frames]
    path.parent.mkdir(parents=True, exist_ok=True)
    try:
        imageio.mimwrite(path, arr, fps=fps, quality=8)
    except (ValueError, ImportError):
        imageio.mimwrite(path.with_suffix(".gif"), arr, duration=1000.0 / fps)
        frame_dir = path.parent / (path.stem + "_frames")
        frame_dir.mkdir(exist_ok=True)
        for i, a in enumerate(arr):
            imageio.imwrite(frame_dir / f"{i:05d}.png", a)


def main():
    import numpy as np

    ap = argparse.ArgumentParser()
    ap.add_argument("--model_path", required=True)
    ap.add_argument("--mode", choices=["render", "time", "motion"], default="render")
    ap.add_argument("--view_id", type=int, default=0)
    ap.add_argument("--n_frames", type=int, default=200)
    ap.add_argument("--platform", type=str, default=None)
    ap.add_argument("--synthetic", action="store_true", help="rebuild the synthetic scene for cameras/gt")
    ap.add_argument("--lpips_backbone", default=None, help="torch backbone ckpt (see scripts/make_lpips_ckpt.py)")
    ap.add_argument("--lpips_heads", default=None, help="torch lpips linear-head ckpt")
    ap.add_argument("--lpips_net", choices=["alex", "vgg"], default="alex")
    args = ap.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from riggs_tpu.data.synthetic import make_scene_data
    from riggs_tpu.data.blender import load_blender_scene
    from riggs_tpu.io.checkpoint import load_checkpoint, load_skeleton_tree
    from riggs_tpu.io.ply import load_gaussians_ply, save_gaussians_ply  # noqa: F401
    from riggs_tpu.train.config import Config
    from riggs_tpu.models import skeleton_warp as SW
    from riggs_tpu.train import optim as O
    from riggs_tpu.models import gaussians as G
    from riggs_tpu.train.stage2 import Stage2State
    from riggs_tpu.eval.synthesis import (
        render_test_set,
        format_numerical_res,
        interpolate_time,
        generate_random_motion,
    )

    model_path = Path(args.model_path)
    cfg = Config.load(model_path / "cfg.json")
    if args.synthetic:
        _, scene = make_scene_data(n_train=16, n_test=4, width=128, height=128)
    else:
        scene = load_blender_scene(
            cfg.model.source_path,
            white_background=cfg.model.white_background,
            resolution=max(cfg.model.resolution, 1),
        )

    joints, parents, indices, template_idx = load_skeleton_tree(model_path)
    # rebuild templates then restore the full stage-2 state
    gs = load_gaussians_ply(
        sorted((model_path / "rig" / "point_cloud").glob("iteration_*/point_cloud.ply"))[-1],
        capacity=cfg.model.capacity,
        max_sh_degree=cfg.model.sh_degree,
        isotropic=cfg.model.use_isotropic_gs,
        with_motion_mask=cfg.model.gs_with_motion_mask,
    )
    skel = SW.init_skeleton_warp(
        jax.random.PRNGKey(0),
        joints,
        parents,
        K=cfg.opt.skeleton_weight_knn,
        use_skinning_mlp=cfg.model.use_skinning_weight_mlp,
        use_template_offsets=cfg.model.use_template_offsets,
    )
    template = Stage2State(
        gs=gs,
        skel=skel,
        opt_gs=O.adam_init(gs.params_dict()),
        opt_skel=O.adam_init(skel.params_dict()),
        stats_gs=G.init_densify_stats(gs.capacity),
        proj_loss=jax.numpy.ones(len(scene.train_frames)),
    )
    try:
        state, it = load_checkpoint(model_path / "rig", template)
        print(f"loaded full checkpoint at iteration {it}")
    except (FileNotFoundError, ValueError, KeyError) as e:
        print(f"full-state checkpoint unavailable ({e}); using PLY + fresh nets")
        state = template

    out_dir = model_path / "synthesis" / args.mode
    out_dir.mkdir(parents=True, exist_ok=True)

    lpips_model = None
    if args.lpips_backbone and args.lpips_heads:
        from riggs_tpu.eval.metrics import LpipsModel

        lpips_model = LpipsModel.from_torch_file(
            args.lpips_backbone, args.lpips_heads, net=args.lpips_net
        )

    if args.mode == "render":
        rows, means, images = render_test_set(
            state.gs, state.skel, scene.test_frames, max_per_tile=cfg.pipe.max_per_tile,
            lpips_model=lpips_model,
        )
        (out_dir / "numerical_res.txt").write_text(format_numerical_res(rows, means))
        save_video(out_dir / "video.mp4", images)
        print("means:", means)
    elif args.mode == "time":
        cam = scene.test_frames[args.view_id % len(scene.test_frames)].cam
        frames = interpolate_time(state.gs, state.skel, cam, n_frames=args.n_frames)
        save_video(out_dir / "video.mp4", frames)
        print(f"wrote {len(frames)} interpolated frames")
    else:
        cam = scene.test_frames[args.view_id % len(scene.test_frames)].cam
        frames, poses = generate_random_motion(state.gs, state.skel, cam)
        save_video(out_dir / "video.mp4", frames)
        np.savez(out_dir / "poses.npz", rotations=np.stack([p["local_rotation"] for p in poses]))
        print(f"wrote {len(frames)} random-motion frames")


if __name__ == "__main__":
    main()
