"""Tests: blender reader round-trip, synthesis/eval library, flow renderer."""
import dataclasses
import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from riggs_tpu.data.synthetic import make_scene_data, ring_cameras
from riggs_tpu.data.blender import load_blender_scene, _nerf_c2w_to_rt


def write_mini_blender(tmp_path, n=3, size=32):
    rng = np.random.default_rng(0)
    frames = []
    (tmp_path / "train").mkdir()
    for i in range(n):
        c2w = np.eye(4)
        c2w[2, 3] = 3.0 + i * 0.1
        img = (rng.uniform(size=(size, size, 4)) * 255).astype(np.uint8)
        img[..., 3] = 255 * (rng.uniform(size=(size, size)) > 0.5)
        Image.fromarray(img, "RGBA").save(tmp_path / "train" / f"r_{i}.png")
        frames.append(
            {"file_path": f"train/r_{i}", "time": i / n, "transform_matrix": c2w.tolist()}
        )
    meta = {"camera_angle_x": 0.8, "frames": frames}
    (tmp_path / "transforms_train.json").write_text(json.dumps(meta))
    return meta


class TestBlenderReader:
    def test_reads_frames(self, tmp_path):
        write_mini_blender(tmp_path)
        scene = load_blender_scene(tmp_path, n_init_points=500)
        assert len(scene.train_frames) == 3
        f = scene.train_frames[0]
        assert f.image.shape == (32, 32, 3)
        assert f.alpha_mask.shape == (32, 32)
        assert float(f.fid) == 0.0
        assert scene.init_points.shape == (500, 3)
        assert scene.is_blender

    def test_c2w_conversion_roundtrip(self):
        # a camera at +3z looking at origin must project the origin to the center
        from riggs_tpu.camera.camera import make_camera, project_points

        c2w = np.eye(4)
        c2w[2, 3] = 3.0
        R, T = _nerf_c2w_to_rt(c2w)
        cam = make_camera(R, T, 100, 100, fovx=0.8, fovy=0.8)
        pix, z = project_points(cam, jnp.zeros((1, 3)))
        np.testing.assert_allclose(float(z[0]), 3.0, atol=1e-5)
        np.testing.assert_allclose(np.asarray(pix)[0], [49.5, 49.5], atol=1e-3)

    def test_thinned_computed_from_alpha(self, tmp_path):
        write_mini_blender(tmp_path)
        scene = load_blender_scene(tmp_path, n_init_points=100)
        f = scene.train_frames[0]
        assert f.thinned is not None and f.thinned_mask is not None


class TestSynthesis:
    @pytest.fixture(scope="class")
    def rig(self):
        import sys

        sys.path.insert(0, "/root/repo")
        import __graft_entry__ as g

        scene, state = g._build_tiny_scene(width=48, height=48)
        return scene, state

    def test_render_test_set(self, rig):
        from riggs_tpu.eval.synthesis import render_test_set, format_numerical_res

        scene, state = rig
        rows, means, images = render_test_set(state.gs, state.skel, scene.train_frames[:2], max_per_tile=256)
        assert len(rows) == 2 and "psnr" in means
        txt = format_numerical_res(rows, means)
        assert "mean" in txt and "psnr" in txt

    def test_interpolate_time(self, rig):
        from riggs_tpu.eval.synthesis import interpolate_time

        scene, state = rig
        frames = interpolate_time(state.gs, state.skel, scene.train_frames[0].cam, n_frames=3, max_per_tile=256)
        assert len(frames) == 3 and frames[0].shape == (48, 48, 3)

    def test_random_motion(self, rig):
        from riggs_tpu.eval.synthesis import generate_random_motion

        scene, state = rig
        frames, poses = generate_random_motion(
            state.gs, state.skel, scene.train_frames[0].cam, pose_num=4, max_per_tile=256
        )
        assert len(frames) == 4 and len(poses) == 4
        # poses actually vary over the sweep
        assert not np.allclose(poses[0]["local_rotation"], poses[-1]["local_rotation"])

    def test_stage1_eval(self, rig):
        from riggs_tpu.eval.render_stage1 import render_test_set_stage1, interpolate_time_stage1
        from riggs_tpu.models import node_warp as NW

        scene, state = rig
        warp = NW.init_node_warp(jax.random.PRNGKey(0), np.asarray(state.gs.xyz)[:64], node_num=8)
        rows, means, _ = render_test_set_stage1(state.gs, warp, scene.train_frames[:2], max_per_tile=256)
        assert "psnr" in means
        frames = interpolate_time_stage1(state.gs, warp, scene.train_frames[0].cam, n_frames=2, max_per_tile=256)
        assert len(frames) == 2


class TestRenderFlow:
    def test_flow_static_is_zero(self, rng):
        import sys

        sys.path.insert(0, "/root/repo")
        import __graft_entry__ as g
        from riggs_tpu.render.api import render_flow

        scene, state = g._build_tiny_scene(width=48, height=48)
        cam = scene.train_frames[0].cam
        zeros = jnp.zeros_like(state.gs.xyz)
        out = render_flow(cam, cam, state.gs, zeros, zeros, max_per_tile=256)
        # same camera, no motion -> uv flow is 0 where anything rendered
        np.testing.assert_allclose(np.asarray(out["render"][..., :2]), 0.0, atol=1e-5)

    def test_flow_sign_matches_motion(self):
        import sys

        sys.path.insert(0, "/root/repo")
        import __graft_entry__ as g
        from riggs_tpu.render.api import render_flow

        scene, state = g._build_tiny_scene(width=48, height=48)
        cam = scene.train_frames[0].cam
        zeros = jnp.zeros_like(state.gs.xyz)
        # move everything +y in world (perpendicular to the ring camera's view
        # axis): NDC v flow should be nonzero with one consistent sign
        d2 = zeros.at[:, 1].add(0.3)
        out = render_flow(cam, cam, state.gs, zeros, d2, max_per_tile=256)
        v = np.asarray(out["render"][..., 1])
        alpha = np.asarray(out["alpha"])
        vals = v[alpha > 0.5]
        assert len(vals) > 10
        assert (np.abs(vals) > 1e-4).mean() > 0.5
        assert abs(np.sign(vals[np.abs(vals) > 1e-4]).mean()) > 0.9  # consistent direction
