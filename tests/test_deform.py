"""Tests for DeformNetwork, ControlNodeWarp blending, and ARAP regularizers."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from riggs_tpu.models.deform_mlp import DeformNetworkDef, init_deform_network, apply_deform_network
from riggs_tpu.models import node_warp as NW
from riggs_tpu.ops import arap as A
from riggs_tpu.models.mlp import positional_embed, embed_dim


class TestEmbed:
    def test_dims(self):
        x = jnp.ones((5, 3))
        out = positional_embed(x, 10)
        assert out.shape == (5, embed_dim(3, 10))
        assert out.shape[-1] == 3 * 21

    def test_values(self):
        x = jnp.array([[0.5]])
        out = np.asarray(positional_embed(x, 2))
        expect = [0.5, np.sin(0.5), np.cos(0.5), np.sin(1.0), np.cos(1.0)]
        np.testing.assert_allclose(out[0], expect, atol=1e-6)


class TestDeformNetwork:
    def test_near_zero_at_init(self, rng):
        net = DeformNetworkDef(is_blender=True)
        params = init_deform_network(jax.random.PRNGKey(0), net)
        x = jnp.asarray(rng.normal(size=(64, 3)).astype(np.float32))
        t = jnp.full((64, 1), 0.37)
        out = apply_deform_network(params, net, x, t)
        # tiny-std head init => residuals start near zero
        assert float(jnp.abs(out["d_xyz"]).max()) < 1e-2
        assert float(jnp.abs(out["d_scaling"]).max()) < 1e-4
        assert out["d_rotation"].shape == (64, 4)

    def test_time_dependence(self, rng):
        net = DeformNetworkDef(is_blender=True)
        params = init_deform_network(jax.random.PRNGKey(1), net)
        # scale up the warp head so time differences are visible
        params["warp"]["w"] = params["warp"]["w"] * 1e4
        x = jnp.asarray(rng.normal(size=(16, 3)).astype(np.float32))
        o1 = apply_deform_network(params, net, x, jnp.zeros((16, 1)))
        o2 = apply_deform_network(params, net, x, jnp.ones((16, 1)))
        assert float(jnp.abs(o1["d_xyz"] - o2["d_xyz"]).max()) > 1e-6

    def test_local_frame_head(self, rng):
        net = DeformNetworkDef(is_blender=False, local_frame=True)
        params = init_deform_network(jax.random.PRNGKey(0), net)
        out = apply_deform_network(params, net, jnp.zeros((4, 3)), jnp.zeros((4, 1)))
        assert out["local_rotation"].shape == (4, 4)


class TestNodeWarp:
    @pytest.fixture
    def warp(self, rng):
        pcl = rng.normal(size=(300, 3)).astype(np.float32)
        return NW.init_node_warp(jax.random.PRNGKey(0), pcl, node_num=32, hyper_dim=2)

    def test_nn_weights_normalized(self, warp, rng):
        x = jnp.asarray(rng.normal(size=(100, 3)).astype(np.float32))
        w, d2, idx = NW.cal_nn_weight(warp, x)
        assert w.shape == (100, 3)
        np.testing.assert_allclose(np.sum(np.asarray(w), -1), 1.0, atol=1e-5)
        assert (np.asarray(d2) >= 0).all()

    def test_forward_shapes_and_near_zero(self, warp, rng):
        x = jnp.asarray(rng.normal(size=(100, 3)).astype(np.float32))
        mm = jnp.ones((100, 1))
        out = NW.warp_forward(warp, x, jnp.asarray(0.5), None, mm)
        assert out["d_xyz"].shape == (100, 3)
        assert out["d_rotation"].shape == (100, 4)
        assert out["d_scaling"].shape == (100, 3)
        assert out["d_nodes"].shape == (32, 3)
        assert float(jnp.abs(out["d_xyz"]).max()) < 1e-2  # near identity at init

    def test_motion_mask_zeroes(self, warp, rng):
        x = jnp.asarray(rng.normal(size=(50, 3)).astype(np.float32))
        mm = jnp.zeros((50, 1))
        out = NW.warp_forward(warp, x, jnp.asarray(0.2), None, mm)
        np.testing.assert_allclose(out["d_xyz"], 0.0, atol=1e-8)

    def test_trajectory_shape(self, warp):
        traj = NW.get_trajectory(warp, t_samp_num=5)
        assert traj.shape == (32, 5, 3)

    def test_reg_losses_finite(self, warp):
        key = jax.random.PRNGKey(3)
        for fn in (NW.arap_loss, NW.elastic_loss, NW.acc_loss, NW.arap_loss_with_rot):
            v = fn(warp, key)
            assert np.isfinite(float(v)), fn.__name__

    def test_reg_losses_differentiable(self, warp):
        key = jax.random.PRNGKey(4)

        def loss(mlp):
            w2 = NW.NodeWarp(
                nodes=warp.nodes,
                node_radius_log=warp.node_radius_log,
                node_weight_logit=warp.node_weight_logit,
                mlp=mlp,
                net=warp.net,
                K=warp.K,
                hyper_dim=warp.hyper_dim,
                d_rot_as_res=warp.d_rot_as_res,
                with_node_weight=warp.with_node_weight,
            )
            return NW.elastic_loss(w2, key) + NW.acc_loss(w2, key)

        g = jax.grad(loss)(warp.mlp)
        flat = jax.tree.leaves(g)
        assert all(np.isfinite(np.asarray(x)).all() for x in flat)


class TestArap:
    def test_rigid_motion_zero_energy(self, rng):
        pts = jnp.asarray(rng.normal(size=(40, 3)).astype(np.float32))
        # rotate + translate the whole cloud: ARAP energy must be ~0
        ang = 0.7
        R = jnp.array(
            [[np.cos(ang), -np.sin(ang), 0], [np.sin(ang), np.cos(ang), 0], [0, 0, 1.0]]
        )
        moved = pts @ R.T + jnp.array([0.3, -0.2, 0.5])
        conn = A.connectivity_from_points(pts, K=8)
        seq = jnp.stack([pts, moved])
        err = A.arap_error(seq, conn)
        assert float(err) < 1e-6

    def test_stretch_positive_energy(self, rng):
        pts = jnp.asarray(rng.normal(size=(40, 3)).astype(np.float32))
        stretched = pts * jnp.array([2.0, 1.0, 1.0])
        conn = A.connectivity_from_points(pts, K=8)
        err = A.arap_error(jnp.stack([pts, stretched]), conn)
        assert float(err) > 1e-3

    def test_estimate_rotation_recovers(self, rng):
        pts = jnp.asarray(rng.normal(size=(30, 3)).astype(np.float32))
        ang = 0.5
        R = jnp.array(
            [[np.cos(ang), 0, np.sin(ang)], [0, 1.0, 0], [-np.sin(ang), 0, np.cos(ang)]]
        )
        conn = A.connectivity_from_points(pts, K=6)
        Rfit = A.estimate_rotations(pts, pts @ R.T, conn)
        np.testing.assert_allclose(Rfit, jnp.tile(R, (30, 1, 1)), atol=1e-3)

    def test_geodesic_floyd_line(self):
        # points on a line: geodesic == euclidean along the chain
        pts = jnp.stack([jnp.arange(6.0), jnp.zeros(6), jnp.zeros(6)], -1)
        d = A.geodesic_floyd(pts, K=2)
        np.testing.assert_allclose(float(d[0, 5]), 5.0, atol=1e-4)
