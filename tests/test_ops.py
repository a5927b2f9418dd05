"""Golden-value tests for the math core (quat / SH / FK / KNN / FPS / geometry)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from riggs_tpu.ops import (
    quat_normalize,
    quat_multiply,
    quat_conjugate,
    quat_rotate,
    quat_to_rotmat,
    rotmat_to_quat,
    quat_slerp,
    eval_sh,
    rgb_to_sh_dc,
    sh_dc_to_rgb,
    forward_kinematics,
    knn,
    mean_knn_dist2,
    chamfer_distance,
    farthest_point_sample,
)
from riggs_tpu.ops.quaternion import qt_to_dq, dq_to_qt, dq_blend, dq_apply
from riggs_tpu.ops.geometry import point_segment_dist2, fit_rotations


def random_quats(rng, n):
    q = rng.normal(size=(n, 4)).astype(np.float32)
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


class TestQuaternion:
    def test_identity(self):
        q = jnp.array([1.0, 0, 0, 0])
        v = jnp.array([1.0, 2.0, 3.0])
        np.testing.assert_allclose(quat_rotate(q, v), v, atol=1e-6)
        np.testing.assert_allclose(quat_to_rotmat(q), jnp.eye(3), atol=1e-6)

    def test_axis_rotation(self):
        # 90 deg about z: x -> y
        half = np.pi / 4
        q = jnp.array([np.cos(half), 0, 0, np.sin(half)])
        v = jnp.array([1.0, 0.0, 0.0])
        np.testing.assert_allclose(quat_rotate(q, v), [0, 1, 0], atol=1e-6)

    def test_multiply_matches_matrix_product(self, rng):
        a = jnp.asarray(random_quats(rng, 32))
        b = jnp.asarray(random_quats(rng, 32))
        m = quat_to_rotmat(quat_multiply(a, b))
        mm = jnp.einsum("nab,nbc->nac", quat_to_rotmat(a), quat_to_rotmat(b))
        np.testing.assert_allclose(m, mm, atol=1e-5)

    def test_rotate_matches_matmul(self, rng):
        q = jnp.asarray(random_quats(rng, 16))
        v = jnp.asarray(rng.normal(size=(16, 3)).astype(np.float32))
        np.testing.assert_allclose(
            quat_rotate(q, v),
            jnp.einsum("nab,nb->na", quat_to_rotmat(q), v),
            atol=1e-5,
        )

    def test_roundtrip_rotmat(self, rng):
        q = jnp.asarray(random_quats(rng, 64))
        # canonicalize sign w>=0
        q = q * jnp.where(q[:, :1] < 0, -1.0, 1.0)
        q2 = rotmat_to_quat(quat_to_rotmat(q))
        np.testing.assert_allclose(q2, q, atol=1e-4)

    def test_conjugate_inverse(self, rng):
        q = jnp.asarray(random_quats(rng, 8))
        ident = quat_multiply(q, quat_conjugate(q))
        np.testing.assert_allclose(ident[:, 0], 1.0, atol=1e-6)
        np.testing.assert_allclose(ident[:, 1:], 0.0, atol=1e-6)

    def test_slerp_endpoints(self, rng):
        q0 = jnp.asarray(random_quats(rng, 8))
        q1 = jnp.asarray(random_quats(rng, 8))
        s0 = quat_slerp(q0, q1, 0.0)
        s1 = quat_slerp(q0, q1, 1.0)
        np.testing.assert_allclose(np.abs(np.sum(np.asarray(s0) * np.asarray(q0), -1)), 1.0, atol=1e-5)
        np.testing.assert_allclose(np.abs(np.sum(np.asarray(s1) * np.asarray(q1), -1)), 1.0, atol=1e-5)

    def test_slerp_halfway_angle(self):
        half = np.pi / 4  # 90deg about z
        q0 = jnp.array([1.0, 0, 0, 0])
        q1 = jnp.array([np.cos(half), 0, 0, np.sin(half)])
        mid = quat_slerp(q0, q1, 0.5)
        expect = jnp.array([np.cos(half / 2), 0, 0, np.sin(half / 2)])
        np.testing.assert_allclose(mid, expect, atol=1e-5)


class TestDualQuaternion:
    def test_qt_roundtrip(self, rng):
        q = jnp.asarray(random_quats(rng, 16))
        t = jnp.asarray(rng.normal(size=(16, 3)).astype(np.float32))
        qr, qd = qt_to_dq(q, t)
        q2, t2 = dq_to_qt(qr, qd)
        np.testing.assert_allclose(q2, q, atol=1e-5)
        np.testing.assert_allclose(t2, t, atol=1e-5)

    def test_dq_apply_matches_rigid(self, rng):
        q = jnp.asarray(random_quats(rng, 8))
        t = jnp.asarray(rng.normal(size=(8, 3)).astype(np.float32))
        x = jnp.asarray(rng.normal(size=(8, 3)).astype(np.float32))
        qr, qd = qt_to_dq(q, t)
        np.testing.assert_allclose(dq_apply(qr, qd, x), quat_rotate(q, x) + t, atol=1e-5)

    def test_blend_single_bone_is_identity(self, rng):
        q = jnp.asarray(random_quats(rng, 4))[None]
        t = jnp.asarray(rng.normal(size=(1, 4, 3)).astype(np.float32))
        qr, qd = qt_to_dq(q, t)
        w = jnp.array([[1.0, 0.0, 0.0, 0.0]])
        br, bd = dq_blend(qr, qd, w)
        q2, t2 = dq_to_qt(br, bd)
        np.testing.assert_allclose(np.abs(np.sum(np.asarray(q2[0]) * np.asarray(q[0, 0]), -1)), 1.0, atol=1e-5)
        np.testing.assert_allclose(t2[0], t[0, 0], atol=1e-4)


class TestSH:
    def test_dc_only_is_constant(self, rng):
        sh = jnp.asarray(rng.normal(size=(10, 16, 3)).astype(np.float32))
        dirs = jnp.asarray(rng.normal(size=(10, 3)).astype(np.float32))
        dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
        out = eval_sh(0, sh, dirs)
        np.testing.assert_allclose(out, 0.28209479177387814 * sh[:, 0], atol=1e-6)

    def test_rgb_dc_roundtrip(self, rng):
        rgb = jnp.asarray(rng.uniform(size=(5, 3)).astype(np.float32))
        np.testing.assert_allclose(sh_dc_to_rgb(rgb_to_sh_dc(rgb)), rgb, atol=1e-6)

    def test_degree1_linear_in_dir(self):
        sh = jnp.zeros((1, 16, 1)).at[0, 3, 0].set(1.0)  # the -C1*x basis
        d = jnp.array([[1.0, 0.0, 0.0]])
        out = eval_sh(1, sh, d)
        np.testing.assert_allclose(out, -0.4886025119029199, atol=1e-6)

    def test_parseval_degree3_sum(self, rng):
        # evaluating a rotated delta of coefficients stays bounded & finite
        sh = jnp.asarray(rng.normal(size=(64, 16, 3)).astype(np.float32))
        dirs = jnp.asarray(rng.normal(size=(64, 3)).astype(np.float32))
        dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
        out = eval_sh(3, sh, dirs)
        assert np.isfinite(np.asarray(out)).all()


class TestFK:
    def test_identity_pose(self, rng):
        K = 6
        parents = (0, 0, 1, 2, 1, 4)
        joints = jnp.asarray(rng.normal(size=(K, 3)).astype(np.float32))
        rots = jnp.tile(jnp.eye(3), (K, 1, 1))
        posed, G = forward_kinematics(rots, joints, parents)
        np.testing.assert_allclose(posed, joints, atol=1e-6)
        np.testing.assert_allclose(G, jnp.tile(jnp.eye(4), (K, 1, 1)), atol=1e-6)

    def test_matches_sequential_reference(self, rng):
        """FK must equal a straightforward sequential chain-product implementation."""
        K = 8
        parents = (0, 0, 1, 2, 2, 0, 5, 6)
        joints = rng.normal(size=(K, 3)).astype(np.float32)
        q = random_quats(rng, K)
        rots = np.asarray(quat_to_rotmat(jnp.asarray(q)))

        # sequential numpy reference: T_j = [R_j | p_parent - R_j p_parent]
        T = np.zeros((K, 4, 4), np.float32)
        for j in range(K):
            p = joints[parents[j]] if j > 0 else joints[0]
            T[j, :3, :3] = rots[j]
            T[j, :3, 3] = p - rots[j] @ p
            T[j, 3, 3] = 1
        G = np.zeros_like(T)
        G[0] = T[0]
        for j in range(1, K):
            G[j] = G[parents[j]] @ T[j]
        posed_ref = np.einsum("kab,kb->ka", G[:, :3, :3], joints) + G[:, :3, 3]

        posed, Gj = forward_kinematics(jnp.asarray(rots), jnp.asarray(joints), parents)
        np.testing.assert_allclose(posed, posed_ref, atol=1e-4)
        np.testing.assert_allclose(Gj, G, atol=1e-4)

    def test_single_bone_rotation(self):
        # root at origin, child at (1,0,0); rotate child 90deg about z at root
        parents = (0, 0)
        joints = jnp.array([[0.0, 0, 0], [1.0, 0, 0]])
        half = np.pi / 4
        q = jnp.array([[1.0, 0, 0, 0], [np.cos(half), 0, 0, np.sin(half)]])
        posed, _ = forward_kinematics(quat_to_rotmat(q), joints, parents)
        np.testing.assert_allclose(posed[1], [0, 1, 0], atol=1e-6)


class TestKNN:
    def test_knn_matches_numpy(self, rng):
        x = rng.normal(size=(100, 3)).astype(np.float32)
        y = rng.normal(size=(50, 3)).astype(np.float32)
        d2, idx = knn(jnp.asarray(x), jnp.asarray(y), 4)
        full = ((x[:, None] - y[None]) ** 2).sum(-1)
        ref_idx = np.argsort(full, axis=1)[:, :4]
        np.testing.assert_allclose(np.sort(d2, -1), np.sort(np.take_along_axis(full, ref_idx, 1), -1), atol=1e-4)
        # sets of indices must match
        assert all(set(a) == set(b) for a, b in zip(np.asarray(idx), ref_idx))

    def test_knn_chunked_matches(self, rng):
        x = rng.normal(size=(1000, 3)).astype(np.float32)
        y = rng.normal(size=(200, 3)).astype(np.float32)
        d2a, _ = knn(jnp.asarray(x), jnp.asarray(y), 3, chunk=128)
        d2b, _ = knn(jnp.asarray(x), jnp.asarray(y), 3, chunk=100000)
        np.testing.assert_allclose(d2a, d2b, atol=1e-5)

    def test_mean_knn_dist2_grid(self):
        # regular 1D grid spacing 1: 3 nearest others are at d 1,1,2 (interior)
        pts = jnp.stack([jnp.arange(10.0), jnp.zeros(10), jnp.zeros(10)], -1)
        d2 = mean_knn_dist2(pts, k=3)
        np.testing.assert_allclose(d2[5], (1 + 1 + 4) / 3, atol=1e-5)

    def test_chamfer_zero_for_identical(self, rng):
        x = jnp.asarray(rng.normal(size=(30, 2)).astype(np.float32))
        assert float(chamfer_distance(x, x)) < 1e-6

    def test_chamfer_l1_value(self):
        x = jnp.array([[0.0, 0.0]])
        y = jnp.array([[1.0, 1.0]])
        np.testing.assert_allclose(float(chamfer_distance(x, y, norm=1)), 4.0, atol=1e-6)

    def test_chamfer_mask(self, rng):
        x = jnp.asarray(rng.normal(size=(20, 2)).astype(np.float32))
        y = jnp.asarray(rng.normal(size=(25, 2)).astype(np.float32))
        # padding y with garbage + mask must equal unpadded
        ypad = jnp.concatenate([y, 100 + jnp.zeros((7, 2))], 0)
        ymask = jnp.arange(32) < 25
        a = chamfer_distance(x, y)
        b = chamfer_distance(x, ypad, y_mask=ymask)
        np.testing.assert_allclose(float(a), float(b), atol=1e-5)


class TestFPS:
    def test_selects_extremes(self):
        pts = jnp.array([[0.0, 0, 0], [0.1, 0, 0], [10.0, 0, 0], [5.0, 0, 0]])
        idx = np.asarray(farthest_point_sample(pts, 3, init_idx=0))
        assert idx[0] == 0 and idx[1] == 2 and idx[2] == 3

    def test_unique_indices(self, rng):
        pts = jnp.asarray(rng.normal(size=(100, 3)).astype(np.float32))
        idx = np.asarray(farthest_point_sample(pts, 50))
        assert len(set(idx.tolist())) == 50

    def test_mask_respected(self, rng):
        pts = jnp.asarray(rng.normal(size=(50, 3)).astype(np.float32))
        mask = jnp.arange(50) < 25
        idx = np.asarray(farthest_point_sample(pts, 10, mask=mask))
        assert (idx < 25).all()


class TestGeometry:
    def test_point_segment_dist(self):
        a = jnp.array([[0.0, 0, 0]])
        b = jnp.array([[1.0, 0, 0]])
        pts = jnp.array([[0.5, 1.0, 0], [2.0, 0, 0], [-1.0, 0, 0], [0.25, 0, 0]])
        d2 = point_segment_dist2(a, b, pts)[:, 0]
        np.testing.assert_allclose(d2, [1.0, 1.0, 1.0, 0.0], atol=1e-6)

    def test_fit_rotations_recovers(self, rng):
        q = jnp.asarray(random_quats(rng, 10))
        R = quat_to_rotmat(q)
        # cov built from R: P Q^T with Q = R P, Procrustes recovers R
        P = jnp.asarray(rng.normal(size=(10, 20, 3)).astype(np.float32))
        Q = jnp.einsum("nab,nkb->nka", R, P)
        cov = jnp.einsum("nka,nkb->nba", P, Q)  # S = sum p q^T (3x3)
        Rfit = fit_rotations(cov)
        np.testing.assert_allclose(Rfit, R, atol=1e-3)

    def test_fit_rotations_det_positive(self, rng):
        cov = jnp.asarray(rng.normal(size=(16, 3, 3)).astype(np.float32))
        R = fit_rotations(cov)
        np.testing.assert_allclose(np.linalg.det(np.asarray(R)), 1.0, atol=1e-4)


class TestCamera:
    def test_project_center(self):
        from riggs_tpu.camera import make_camera, project_points

        cam = make_camera(np.eye(3), np.zeros(3), 800, 800, fovx=0.8, fovy=0.8)
        pix, z = project_points(cam, jnp.array([[0.0, 0.0, 2.0]]))
        np.testing.assert_allclose(pix[0], [399.5, 399.5], atol=1e-4)
        np.testing.assert_allclose(z[0], 2.0, atol=1e-6)

    def test_camera_center_identity(self):
        from riggs_tpu.camera import make_camera, camera_center

        R = np.eye(3)
        T = np.array([1.0, 2.0, 3.0])
        cam = make_camera(R, T, 100, 100, fovx=1.0, fovy=1.0)
        np.testing.assert_allclose(camera_center(cam), -T, atol=1e-6)

    def test_k_matrix_projection(self):
        from riggs_tpu.camera import make_camera, project_points

        K = np.array([[500.0, 0, 320], [0, 480.0, 240], [0, 0, 1]])
        cam = make_camera(np.eye(3), np.zeros(3), 640, 480, K=K)
        pix, _ = project_points(cam, jnp.array([[0.1, -0.2, 1.0]]))
        np.testing.assert_allclose(pix[0], [500 * 0.1 + 320 - 0.5, 480 * -0.2 + 240 - 0.5], atol=1e-4)
