"""Tests: stage-1 animation path (p2dR, geodesic re-binding) and SE(3) maps."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from riggs_tpu.models import node_warp as NW
from riggs_tpu.ops.se3 import exp_so3, exp_se3, log_so3


@pytest.fixture(scope="module")
def warp():
    rng = np.random.default_rng(0)
    pcl = rng.normal(size=(200, 3)).astype(np.float32)
    return NW.init_node_warp(jax.random.PRNGKey(0), pcl, node_num=16, hyper_dim=2)


class TestP2dR:
    def test_translation_gives_identity(self, warp):
        p0 = warp.nodes[:, :3]
        q = NW.p2dR(warp, p0 + jnp.asarray([0.3, 0.1, -0.2]), p0)
        assert float(jnp.abs(q[:, 1:]).max()) < 1e-3

    def test_global_rotation_recovered(self, warp):
        ang = 0.6
        R = jnp.asarray(
            [[np.cos(ang), -np.sin(ang), 0], [np.sin(ang), np.cos(ang), 0], [0, 0, 1.0]],
            jnp.float32,
        )
        p0 = warp.nodes[:, :3]
        q = NW.p2dR(warp, p0 @ R.T, p0)
        np.testing.assert_allclose(np.asarray(q[:, 0]), np.cos(ang / 2), atol=1e-3)


class TestAnimated:
    def test_zero_bias_keeps_identity_rotation(self, warp):
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.normal(size=(60, 3)).astype(np.float32))
        out = NW.warp_forward_animated(warp, x, jnp.asarray(0.4), None, jnp.ones((60, 1)), jnp.zeros((16, 3)))
        assert float(jnp.abs(out["d_rotation_bias"][:, 0] - 1.0).max()) < 1e-3

    def test_bias_translates_gaussians(self, warp):
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.normal(size=(60, 3)).astype(np.float32))
        base = NW.warp_forward_animated(warp, x, jnp.asarray(0.4), None, jnp.ones((60, 1)), jnp.zeros((16, 3)))
        bias = jnp.zeros((16, 3)).at[:, 0].add(0.5)
        moved = NW.warp_forward_animated(warp, x, jnp.asarray(0.4), None, jnp.ones((60, 1)), bias)
        shift = np.asarray(moved["d_xyz"] - base["d_xyz"])
        np.testing.assert_allclose(shift[:, 0].mean(), 0.5, atol=1e-2)


class TestSE3:
    def test_exp_so3_quarter_turn(self):
        R = exp_so3(jnp.asarray([[0.0, 0, np.pi / 2]]))
        np.testing.assert_allclose(np.asarray(R[0] @ jnp.asarray([1.0, 0, 0])), [0, 1, 0], atol=1e-5)

    def test_log_roundtrip(self):
        w = jnp.asarray([[0.3, -0.5, 0.7]])
        np.testing.assert_allclose(np.asarray(log_so3(exp_so3(w))), np.asarray(w), atol=1e-5)

    def test_exp_se3_pure_translation(self):
        T = exp_se3(jnp.asarray([[0.0, 0, 0, 1.0, 2.0, 3.0]]))
        np.testing.assert_allclose(np.asarray(T[0, :3, 3]), [1, 2, 3], atol=1e-5)
        np.testing.assert_allclose(np.asarray(T[0, :3, :3]), np.eye(3), atol=1e-6)

    def test_exp_se3_screw(self):
        # quarter turn about z + lift along z (v parallel to the axis -> t = v)
        S = jnp.asarray([[0.0, 0, np.pi / 2, 0, 0, 1.0]])
        T = np.asarray(exp_se3(S))[0]
        p = T @ np.array([1.0, 0, 0, 1])
        np.testing.assert_allclose(p[:3], [0.0, 1.0, 1.0], atol=1e-5)
