"""Tests: DQ skinning, mlp deform trainer, node densify, pose utils."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from riggs_tpu.models import skeleton_warp as SW


class TestDQSkinning:
    @pytest.fixture
    def warp(self):
        joints = np.array([[0.0, 0, 0], [1.0, 0, 0], [2.0, 0, 0]], np.float32)
        return SW.init_skeleton_warp(
            jax.random.PRNGKey(0), joints, (0, 0, 1), K=1, use_skinning_mlp=False, use_template_offsets=False
        )

    def test_identity_pose(self, warp, rng):
        x = jnp.asarray(rng.normal(size=(20, 3)).astype(np.float32))
        ident = jnp.tile(jnp.array([1.0, 0, 0, 0]), (3, 1))
        out = SW.deform_by_pose_dq(warp, x, ident, jnp.zeros(3), jnp.ones((20, 1)))
        np.testing.assert_allclose(np.asarray(out["d_xyz"]), 0.0, atol=1e-5)

    def test_matches_lbs_for_rigid_bone(self, warp):
        """A point on a single bone: DQ and LBS agree exactly (one transform)."""
        x = jnp.array([[1.5, 0.0, 0.0]])
        half = np.pi / 4
        quats = jnp.array([[1.0, 0, 0, 0], [1.0, 0, 0, 0], [np.cos(half), 0, 0, np.sin(half)]])
        lbs = SW.deform_by_pose(warp, x, quats, jnp.zeros(3), jnp.ones((1, 1)))
        dq = SW.deform_by_pose_dq(warp, x, quats, jnp.zeros(3), jnp.ones((1, 1)))
        np.testing.assert_allclose(np.asarray(lbs["d_xyz"]), np.asarray(dq["d_xyz"]), atol=1e-4)

    def test_differs_from_lbs_under_blend(self):
        """Blended between two opposing rotations, DQ and LBS genuinely differ."""
        joints = np.array([[0.0, 0, 0], [1.0, 0, 0], [2.0, 0, 0]], np.float32)
        warp = SW.init_skeleton_warp(
            jax.random.PRNGKey(0), joints, (0, 0, 1), K=-1, use_skinning_mlp=False, use_template_offsets=False
        )
        x = jnp.array([[1.0, 0.3, 0.0]])
        half = np.pi / 3
        quats = jnp.array([[1.0, 0, 0, 0], [np.cos(half), np.sin(half), 0, 0], [np.cos(half), -np.sin(half), 0, 0]])
        lbs = SW.deform_by_pose(warp, x, quats, jnp.zeros(3), jnp.ones((1, 1)))
        dq = SW.deform_by_pose_dq(warp, x, quats, jnp.zeros(3), jnp.ones((1, 1)))
        assert float(jnp.abs(lbs["d_xyz"] - dq["d_xyz"]).max()) > 1e-4


class TestMlpDeformTrainer:
    @pytest.mark.slow
    def test_converges(self, rng):
        from riggs_tpu.data.synthetic import make_scene_data
        from riggs_tpu.train.config import Config
        from riggs_tpu.train.mlp_deform import train_mlp_deform

        _, scene = make_scene_data(n_train=4, n_test=1, width=48, height=48, max_thinned=64, n_init_points=150)
        cfg = Config()
        cfg.model.capacity = 512
        cfg.model.sh_degree = 1
        cfg.pipe.max_per_tile = 256
        cfg.opt.iterations = 50
        cfg.opt.warm_up = 10
        cfg.opt.densify_from_iter = 10_000  # off
        state, hist = train_mlp_deform(scene, cfg, log_every=10)
        # per-frame PSNR is noisy across random frames; require the best
        # later sample to beat the starting one clearly
        later = max(h[1]["psnr"] for h in hist[1:])
        assert later > hist[0][1]["psnr"] + 1.0, hist


class TestPoses:
    def test_spherical_ring_radius(self):
        from riggs_tpu.camera.poses import spherical_ring

        poses = spherical_ring(8, radius=4.0)
        for c2w in poses:
            np.testing.assert_allclose(np.linalg.norm(c2w[:3, 3]), 4.0, atol=1e-5)

    def test_bezier_endpoints(self):
        from riggs_tpu.camera.poses import bezier_curve

        cps = np.array([[0.0, 0], [1, 2], [2, 0]])
        curve = bezier_curve(cps, n=11)
        np.testing.assert_allclose(curve[0], cps[0], atol=1e-6)
        np.testing.assert_allclose(curve[-1], cps[-1], atol=1e-6)

    def test_piecewise_linear_uniform(self):
        from riggs_tpu.camera.poses import piecewise_linear

        pts = np.array([[0.0, 0], [1, 0], [1, 1]])
        out = piecewise_linear(pts, n=21)
        seg = np.linalg.norm(np.diff(out, axis=0), axis=-1)
        np.testing.assert_allclose(seg, seg[0], atol=1e-5)
