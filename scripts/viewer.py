"""Launch the interactive web viewer on a trained model.

  python scripts/viewer.py --model_path output/demo [--port 8080] [--stage 2]
"""
import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax

jax.config.update("jax_compilation_cache_dir", str(Path(__file__).parent.parent / ".jax_cache"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model_path", required=True)
    ap.add_argument("--port", type=int, default=8080)
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from riggs_tpu.io.checkpoint import load_checkpoint, load_skeleton_tree
    from riggs_tpu.io.ply import load_gaussians_ply
    from riggs_tpu.models import gaussians as G, skeleton_warp as SW
    from riggs_tpu.train import optim as O
    from riggs_tpu.train.config import Config
    from riggs_tpu.train.stage2 import Stage2State
    from riggs_tpu.viz.web_viewer import ViewerServer

    model_path = Path(args.model_path)
    cfg = Config.load(model_path / "cfg.json")
    joints, parents, indices, template_idx = load_skeleton_tree(model_path)
    ply = sorted((model_path / "rig" / "point_cloud").glob("iteration_*/point_cloud.ply"))[-1]
    gs = load_gaussians_ply(ply, capacity=cfg.model.capacity, max_sh_degree=cfg.model.sh_degree,
                            isotropic=cfg.model.use_isotropic_gs,
                            with_motion_mask=cfg.model.gs_with_motion_mask)
    skel = SW.init_skeleton_warp(
        jax.random.PRNGKey(0), joints, parents, K=cfg.opt.skeleton_weight_knn,
        use_skinning_mlp=cfg.model.use_skinning_weight_mlp,
        use_template_offsets=cfg.model.use_template_offsets,
    )
    template = Stage2State(
        gs=gs, skel=skel, opt_gs=O.adam_init(gs.params_dict()),
        opt_skel=O.adam_init(skel.params_dict()), stats_gs=G.init_densify_stats(gs.capacity),
        proj_loss=jax.numpy.ones(1),
    )
    try:
        state, it = load_checkpoint(model_path / "rig", template)
        gs, skel = state.gs, state.skel
        print(f"loaded checkpoint iteration {it}")
    except (FileNotFoundError, ValueError, KeyError) as e:
        print(f"using PLY only ({e})")
    ViewerServer(gs, skel=skel).serve(port=args.port)


if __name__ == "__main__":
    main()
