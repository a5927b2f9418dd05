"""Resume the two-stage pipeline at stage 2 from a saved stage-1 checkpoint.

Rebuilds the (deterministic) scene, restores the full stage-1 training state
pytree from checkpoints/iteration_N/state.npz, and runs stage 2 with the
current config overrides — the recovery path when stage 2 was interrupted
before its own first checkpoint (run_pipeline's --resume only covers stage-2
checkpoints).
"""
import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax

jax.config.update("jax_compilation_cache_dir", str(Path(__file__).parent.parent / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model_path", required=True)
    ap.add_argument("--iterations", type=int, default=None, help="override stage-2 iterations")
    ap.add_argument("--test_every", type=int, default=4000)
    ap.add_argument("--synthetic_size", type=int, default=800)
    ap.add_argument("--synthetic_frames", type=int, default=64)
    ap.add_argument("--synthetic_figure", default="biped")
    ap.add_argument("--synthetic_points", type=int, default=250)
    ap.add_argument("--synthetic_init_points", type=int, default=20000)
    args = ap.parse_args()

    from riggs_tpu.data.synthetic import make_scene_data
    from riggs_tpu.io.checkpoint import load_checkpoint, save_checkpoint, save_skeleton_tree
    from riggs_tpu.io.obj import write_skeleton_obj
    from riggs_tpu.train.config import Config
    from riggs_tpu.train.stage1 import init_stage1, finalize_nodes, train_stage1  # noqa: F401
    from riggs_tpu.train.stage2 import train_stage2

    model_path = Path(args.model_path)
    cfg = Config.load(model_path / "cfg.json")
    if args.iterations is not None:
        cfg.opt.iterations = args.iterations

    _, scene = make_scene_data(
        n_train=args.synthetic_frames, n_test=max(args.synthetic_frames // 4, 1),
        width=args.synthetic_size, height=args.synthetic_size,
        figure=args.synthetic_figure, points_per_seg=args.synthetic_points,
        n_init_points=args.synthetic_init_points,
    )
    print(f"scene: {len(scene.train_frames)} train / {len(scene.test_frames)} test", flush=True)

    template = init_stage1(jax.random.PRNGKey(0), scene, cfg)
    try:
        s1, it = load_checkpoint(model_path, template)
    except ValueError:
        # post-downsampling node shapes differ from init: finalize first
        template = finalize_nodes(template)
        s1, it = load_checkpoint(model_path, template)
    print(f"restored stage-1 state from iteration {it}", flush=True)

    t0 = time.time()
    s2, info, hist = train_stage2(
        s1, scene, cfg, log_every=500, test_every=args.test_every,
        model_path=model_path / "rig",
        resume=True,  # pick up stage-2 checkpoints if a prior attempt saved any
    )
    print(f"stage 2 done in {time.time() - t0:.0f}s", flush=True)
    save_skeleton_tree(model_path, info.joints, info.parents, info.joint_node_indices, info.template_idx)
    write_skeleton_obj(model_path / "skeleton.obj", info.joints, info.parents)
    save_checkpoint(model_path / "rig", cfg.opt.iterations, s2, gs=s2.gs, cfg=cfg)

    from riggs_tpu.eval.synthesis import render_test_set, format_numerical_res

    if scene.test_frames:
        rows, means, _ = render_test_set(
            s2.gs, s2.skel, scene.test_frames, max_per_tile=cfg.pipe.max_per_tile
        )
        print("FINAL test:", " ".join(f"{k}={v:.4f}" for k, v in means.items()), flush=True)
        (model_path / "numerical_res.txt").write_text(format_numerical_res(rows, means))


if __name__ == "__main__":
    main()
