"""Tests for interactive editing: ARAP drag, keypoints, pose edit, orbit camera."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from riggs_tpu.edit.arap_deform import make_deformer, deform_arap, arap_energy, n_ring_neighbors
from riggs_tpu.edit.keypoints import DeformKeypoints
from riggs_tpu.edit.pose_edit import rotate_joint, compose_pose_edit, PoseLibrary, axis_angle_quat
from riggs_tpu.camera.orbit import OrbitCamera


def grid_points(n=6, spacing=0.2):
    xs = np.arange(n) * spacing
    pts = np.stack(np.meshgrid(xs, xs, indexing="ij"), -1).reshape(-1, 2)
    return np.concatenate([pts, np.zeros((pts.shape[0], 1))], -1).astype(np.float32)


class TestArapDeform:
    def test_handles_reach_targets(self):
        pts = jnp.asarray(grid_points())
        d = make_deformer(pts, K=6)
        handle_idx = jnp.asarray([0, 35])
        handle_pos = jnp.asarray([pts[0], pts[35] + jnp.asarray([0.3, 0.0, 0.2])])
        new_pts, quats = deform_arap(d, handle_idx, handle_pos)
        np.testing.assert_allclose(np.asarray(new_pts)[0], np.asarray(handle_pos)[0], atol=1e-3)
        np.testing.assert_allclose(np.asarray(new_pts)[35], np.asarray(handle_pos)[1], atol=1e-3)
        assert quats.shape == (36, 4)

    def test_rigid_translation_propagates(self):
        """Dragging ALL handles by the same offset translates everything."""
        pts = jnp.asarray(grid_points())
        d = make_deformer(pts, K=6)
        off = jnp.asarray([0.5, -0.1, 0.2])
        # anchor the four corners
        idx = jnp.asarray([0, 5, 30, 35])
        new_pts, _ = deform_arap(d, idx, pts[idx] + off)
        np.testing.assert_allclose(np.asarray(new_pts), np.asarray(pts + off), atol=5e-2)

    def test_energy_zero_for_rigid(self):
        pts = jnp.asarray(grid_points())
        d = make_deformer(pts, K=6)
        e = arap_energy(d, pts, pts + jnp.asarray([1.0, 2.0, 3.0]))
        assert float(e) < 1e-8

    def test_n_ring(self):
        pts = jnp.asarray(grid_points())
        d = make_deformer(pts, K=4)
        ring1 = n_ring_neighbors(np.asarray(d.nn_idx), [0], rings=1)
        ring2 = n_ring_neighbors(np.asarray(d.nn_idx), [0], rings=2)
        assert len(ring2) > len(ring1) >= 2


class TestKeypoints:
    def test_add_select_update(self):
        kp = DeformKeypoints()
        kp.add_kpts(np.zeros((2, 3)), [4, 7])
        kp.add_kpts(np.ones((1, 3)), [9])
        assert len(kp) == 3
        assert kp.get_selective_keypoints_idx() == [9]
        kp.select_kpt(0)
        assert kp.get_selective_keypoints_idx() == [4, 7]
        kp.update_selective_keypoints(np.array([1.0, 0, 0]))
        np.testing.assert_allclose(kp.keypoints[0], [1, 0, 0])
        np.testing.assert_allclose(kp.keypoints[2], [1, 1, 1])


class TestPoseEdit:
    def test_rotate_joint_composes(self):
        rot = jnp.tile(jnp.asarray([1.0, 0, 0, 0]), (4, 1))
        out = rotate_joint(rot, 2, np.array([0, 0, 1.0]), np.pi / 2)
        expect = axis_angle_quat(np.array([0, 0, 1.0]), np.pi / 2)
        np.testing.assert_allclose(np.asarray(out[2]), expect, atol=1e-6)
        np.testing.assert_allclose(np.asarray(out[0]), [1, 0, 0, 0], atol=1e-6)

    def test_compose_identity(self):
        base = jnp.asarray(np.random.default_rng(0).normal(size=(3, 4)).astype(np.float32))
        base = base / jnp.linalg.norm(base, axis=-1, keepdims=True)
        ident = jnp.tile(jnp.asarray([1.0, 0, 0, 0]), (3, 1))
        np.testing.assert_allclose(np.asarray(compose_pose_edit(base, ident)), np.asarray(base), atol=1e-6)

    def test_pose_library_roundtrip(self, tmp_path):
        lib = PoseLibrary(tmp_path / "poses.json")
        lib.add("a", np.tile([1.0, 0, 0, 0], (3, 1)), np.zeros(3))
        lib.add("b", np.tile([0.0, 1, 0, 0], (3, 1)), np.ones(3))
        lib.save()
        lib2 = PoseLibrary(tmp_path / "poses.json")
        r, t = lib2.get("b")
        np.testing.assert_allclose(t, 1.0)
        rots, trans = lib2.interpolate(["a", "b"], frames_per_segment=5)
        assert rots.shape == (5, 3, 4) and trans.shape == (5, 3)


class TestOrbitCamera:
    def test_orbit_keeps_radius(self):
        cam = OrbitCamera(radius=2.0)
        p0 = cam.position.copy()
        cam.orbit(50, 30)
        assert abs(np.linalg.norm(cam.position - cam.center) - 2.0) < 1e-5
        assert not np.allclose(cam.position, p0)

    def test_to_camera_looks_at_center(self):
        from riggs_tpu.camera.camera import project_points

        cam = OrbitCamera(width=100, height=100, radius=3.0)
        cam.orbit(123, -45)
        c = cam.to_camera()
        pix, z = project_points(c, jnp.asarray(cam.center[None]))
        np.testing.assert_allclose(np.asarray(pix)[0], [49.5, 49.5], atol=1e-3)
        np.testing.assert_allclose(float(z[0]), 3.0, atol=1e-5)

    def test_scale(self):
        cam = OrbitCamera(radius=1.0)
        cam.scale(1)
        assert cam.radius < 1.0
