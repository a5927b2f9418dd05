"""Stage-1 rendering / evaluation CLI (render.py equivalent).

Modes (parity with /root/reference/render.py:83-235):
  render — test-set metrics + videos + node OBJ dumps
  time   — 150-frame fixed-view time interpolation
  all    — spiral pose + time sweep (interpolate_all)
"""
import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax

jax.config.update("jax_compilation_cache_dir", str(Path(__file__).parent.parent / ".jax_cache"))


def main():
    import numpy as np

    from render_rig import save_video  # reuse the mp4/GIF writer

    ap = argparse.ArgumentParser()
    ap.add_argument("--model_path", required=True)
    ap.add_argument("--mode", choices=["render", "time", "all"], default="render")
    ap.add_argument("--view_id", type=int, default=0)
    ap.add_argument("--n_frames", type=int, default=150)
    ap.add_argument("--platform", default=None)
    ap.add_argument("--synthetic", action="store_true")
    args = ap.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from riggs_tpu.data.synthetic import make_scene_data
    from riggs_tpu.data.scene import load_scene
    from riggs_tpu.io.checkpoint import load_checkpoint
    from riggs_tpu.io.obj import write_skeleton_obj
    from riggs_tpu.train.config import Config
    from riggs_tpu.train.stage1 import init_stage1
    from riggs_tpu.eval.render_stage1 import (
        render_test_set_stage1,
        interpolate_time_stage1,
        interpolate_all_stage1,
    )
    from riggs_tpu.eval.synthesis import format_numerical_res

    model_path = Path(args.model_path)
    cfg = Config.load(model_path / "cfg.json")
    if args.synthetic:
        _, scene = make_scene_data(n_train=16, n_test=4, width=128, height=128)
    else:
        scene = load_scene(cfg.model.source_path, white_background=cfg.model.white_background,
                           resolution=max(cfg.model.resolution, 1))

    template = init_stage1(jax.random.PRNGKey(0), scene, cfg)
    state, it = load_checkpoint(model_path, template)
    print(f"loaded stage-1 checkpoint at iteration {it}")

    out_dir = model_path / "synthesis_stage1" / args.mode
    out_dir.mkdir(parents=True, exist_ok=True)

    if args.mode == "render":
        rows, means, images = render_test_set_stage1(
            state.gs, state.warp, scene.test_frames, max_per_tile=cfg.pipe.max_per_tile
        )
        (out_dir / "numerical_res.txt").write_text(format_numerical_res(rows, means))
        save_video(out_dir / "video.mp4", images)
        # node positions dump
        write_skeleton_obj(out_dir / "nodes.obj", np.asarray(state.warp.nodes[:, :3]), [-1] * state.warp.node_num)
        print("means:", means)
    elif args.mode == "time":
        cam = scene.test_frames[args.view_id % len(scene.test_frames)].cam
        frames = interpolate_time_stage1(state.gs, state.warp, cam, n_frames=args.n_frames)
        save_video(out_dir / "video.mp4", frames)
        print(f"wrote {len(frames)} frames")
    else:
        frames = interpolate_all_stage1(
            state.gs, state.warp, width=scene.test_frames[0].cam.width,
            height=scene.test_frames[0].cam.height, n_frames=args.n_frames,
        )
        save_video(out_dir / "video.mp4", frames)
        print(f"wrote {len(frames)} spiral frames")


if __name__ == "__main__":
    main()
