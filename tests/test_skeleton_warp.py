"""Tests for the stage-2 skeleton-driven deformation."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from riggs_tpu.models import skeleton_warp as SW
from riggs_tpu.ops.quaternion import quat_to_rotmat


@pytest.fixture
def warp():
    joints = np.array([[0.0, -0.5, 0], [0.0, 0.0, 0], [0.0, 0.5, 0], [0.3, 0.0, 0]], np.float32)
    parents = (0, 0, 1, 1)
    return SW.init_skeleton_warp(jax.random.PRNGKey(0), joints, parents, K=-1)


class TestSkeletonWarp:
    def test_pose_at_shapes(self, warp):
        pose = SW.pose_at(warp, jnp.asarray(0.3))
        assert pose["local_rotation"].shape == (4, 4)
        assert pose["global_trans"].shape == (3,)

    def test_identity_pose_is_identity_deform(self, warp, rng):
        x = jnp.asarray(rng.normal(size=(50, 3)).astype(np.float32) * 0.3)
        ident = jnp.tile(jnp.array([1.0, 0, 0, 0]), (4, 1))
        out = SW.deform_by_pose(warp, x, ident, jnp.zeros(3), jnp.ones((50, 1)))
        # without template offsets != 0 the deform should be ~0 at identity
        d = out["d_xyz"] - out["template_offsets"]
        np.testing.assert_allclose(np.asarray(d), 0.0, atol=1e-4)
        np.testing.assert_allclose(np.asarray(out["d_nodes"]), np.asarray(warp.joints), atol=1e-5)

    def test_global_trans_moves_everything(self, warp, rng):
        x = jnp.asarray(rng.normal(size=(20, 3)).astype(np.float32) * 0.3)
        ident = jnp.tile(jnp.array([1.0, 0, 0, 0]), (4, 1))
        tr = jnp.array([0.5, -0.2, 0.1])
        o1 = SW.deform_by_pose(warp, x, ident, jnp.zeros(3), jnp.ones((20, 1)))
        o2 = SW.deform_by_pose(warp, x, ident, tr, jnp.ones((20, 1)))
        np.testing.assert_allclose(np.asarray(o2["d_xyz"] - o1["d_xyz"]), np.tile(np.asarray(tr), (20, 1)), atol=1e-5)

    def test_skinning_weights_normalized(self, warp, rng):
        x = jnp.asarray(rng.normal(size=(30, 3)).astype(np.float32))
        w, d2, idx = SW.cal_nn_weight_skeleton(warp, x)
        assert w.shape == (30, 3)  # 3 bones (4 joints)
        np.testing.assert_allclose(np.sum(np.asarray(w), -1), 1.0, atol=1e-5)
        assert (np.asarray(idx) >= 1).all()

    def test_topk_mode(self):
        joints = np.array([[0.0, -0.5, 0], [0.0, 0.0, 0], [0.0, 0.5, 0], [0.3, 0.0, 0]], np.float32)
        w = SW.init_skeleton_warp(jax.random.PRNGKey(0), joints, (0, 0, 1, 1), K=2)
        x = jnp.asarray(np.random.default_rng(0).normal(size=(10, 3)).astype(np.float32))
        ww, d2, idx = SW.cal_nn_weight_skeleton(w, x)
        assert ww.shape == (10, 2)
        np.testing.assert_allclose(np.sum(np.asarray(ww), -1), 1.0, atol=1e-5)

    def test_rigid_rotation_of_bone(self):
        """Points exactly on a bone follow it rigidly when only that bone rotates."""
        joints = np.array([[0.0, 0, 0], [1.0, 0, 0], [2.0, 0, 0]], np.float32)
        parents = (0, 0, 1)
        warp = SW.init_skeleton_warp(
            jax.random.PRNGKey(1), joints, parents, K=1, use_skinning_mlp=False, use_template_offsets=False
        )
        # tighten radii so weights are sharp
        x = jnp.array([[1.5, 0.0, 0.0]])  # midpoint of bone 2 (joints 1->2)
        half = np.pi / 4
        quats = jnp.array([[1.0, 0, 0, 0], [1.0, 0, 0, 0], [np.cos(half), 0, 0, np.sin(half)]])
        out = SW.deform_by_pose(warp, x, quats, jnp.zeros(3), jnp.ones((1, 1)))
        # joint 2 rotates about joint 1: (2,0,0) -> (1,1,0); midpoint -> (1, .5, 0)
        np.testing.assert_allclose(np.asarray(out["d_nodes"][2]), [1.0, 1.0, 0.0], atol=1e-5)
        new_pos = np.asarray(x + out["d_xyz"])[0]
        np.testing.assert_allclose(new_pos, [1.0, 0.5, 0.0], atol=1e-5)

    def test_forward_grads_flow(self, warp, rng):
        x = jnp.asarray(rng.normal(size=(30, 3)).astype(np.float32) * 0.3)

        def loss(params):
            w = warp.replace_params(params)
            out = SW.skeleton_forward(w, x, jnp.asarray(0.4), jnp.ones((30, 1)))
            return jnp.sum(out["d_xyz"] ** 2) + jnp.sum(out["d_rotation"] ** 2)

        g = jax.grad(loss)(warp.params_dict())
        leaves = jax.tree.leaves(g)
        assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
        # pose mlp must receive gradient
        assert any(np.abs(np.asarray(l)).max() > 0 for l in jax.tree.leaves(g["pose"]))
