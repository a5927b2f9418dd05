"""Stage-2 smoke test: skeleton discovery + warmup distillation + rigged training."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from riggs_tpu.data.synthetic import make_scene_data
from riggs_tpu.train.config import Config
from riggs_tpu.train.stage1 import train_stage1
from riggs_tpu.train.stage2 import train_stage2, init_stage2
from tests.test_stage1 import tiny_config


@pytest.fixture(scope="module")
def stage1_result():
    _, scene = make_scene_data(n_train=6, n_test=2, width=64, height=64, max_thinned=128, n_init_points=200)
    cfg = tiny_config()
    state, _ = train_stage1(scene, cfg, log_every=0)
    return scene, cfg, state


class TestStage2:
    @pytest.mark.slow
    def test_init_extracts_skeleton(self, stage1_result):
        scene, cfg, s1 = stage1_result
        cfg2 = dataclasses.replace(cfg)
        state, info, frames = init_stage2(jax.random.PRNGKey(0), s1, scene, cfg2)
        J = len(info.joints)
        assert 2 <= J <= 24, J
        assert info.parents[0] == -1
        assert all(info.parents[i] < i for i in range(1, J))
        assert info.d_xyz.shape[0] == len(frames)
        assert info.d_joints.shape == (len(frames), J, 3)
        assert 0 <= info.template_idx < len(frames)
        # template bake: pretrained d_xyz at the template frame is ~0
        assert np.abs(info.d_xyz[info.template_idx]).max() < 1e-5

    @pytest.mark.slow
    def test_training_improves(self, stage1_result):
        scene, cfg, s1 = stage1_result
        o = cfg.opt
        o.iterations = 60
        o.skeleton_warm_up = 15
        o.optimize_template_offsets_iters = 30
        o.gs_densification_iterations = 1000  # off for smoke test
        cfg.model.use_skinning_weight_mlp = True
        cfg.model.use_template_offsets = True
        state, info, hist = train_stage2(s1, scene, cfg, log_every=10)
        warm = [h for h in hist if h[0] < 15]
        main = [h for h in hist if h[0] >= 20]
        assert len(warm) > 0 and len(main) > 0
        # warmup learned the distillation targets: the trained skeleton's
        # d_xyz must beat the null (zero-deformation) predictor on FIXED
        # frames. (Per-step loss endpoints compare different random frames
        # whose deformation magnitudes differ ~100x — pure noise.)
        from riggs_tpu.models import skeleton_warp as SW

        errs_m, errs_0 = [], []
        for u in range(0, len(scene.train_frames), 3):
            f = scene.train_frames[u]
            d = SW.skeleton_forward(
                state.skel, state.gs.xyz, f.fid, state.gs.motion_mask
            )
            errs_m.append(float(jnp.mean((d["d_xyz"] - info.d_xyz[u]) ** 2)))
            errs_0.append(float(jnp.mean(info.d_xyz[u] ** 2)))
        assert np.mean(errs_m) < np.mean(errs_0), (errs_m, errs_0)
        # rendering quality: held-out test PSNR of the trained rig must beat
        # the freshly initialized stage-2 model by a real margin (per-step
        # train psnr compares different random frames — noise)
        from riggs_tpu.train.stage2 import evaluate_stage2

        init_state, _, _ = init_stage2(jax.random.PRNGKey(0), s1, scene, cfg)
        bg = jnp.zeros(3)
        before = evaluate_stage2(init_state, scene.test_frames, bg)
        after = evaluate_stage2(state, scene.test_frames, bg)
        assert after["psnr"] > before["psnr"] + 0.5, (before, after)
        assert np.isfinite(main[-1][1]["loss"])
