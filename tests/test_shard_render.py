"""Tile-parallel (pixel-sharded) rendering on the 8-device virtual mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from riggs_tpu.camera import make_camera
from riggs_tpu.parallel.mesh import make_mesh
from riggs_tpu.parallel.render import rasterize_tile_sharded
from riggs_tpu.render.tiles import rasterize_tiled
from tests.test_render import make_scene


class TestTileShardedRender:
    @pytest.fixture(scope="class")
    def scene(self):
        rng = np.random.default_rng(0)
        return make_scene(rng, n=300)

    @pytest.fixture(scope="class")
    def cam(self):
        return make_camera(np.eye(3), np.array([0, 0, 3.0]), 128, 128, fovx=1.0, fovy=1.0)

    def test_matches_single_device(self, scene, cam):
        means, colors, opacity, scales, rots = scene
        bg = jnp.asarray([0.1, 0.2, 0.3])
        mesh = make_mesh(data=1, tile=8)
        a = rasterize_tiled(cam, means, colors, opacity, scales, rots, bg, max_per_tile=256, blend="pallas")
        b = rasterize_tile_sharded(mesh, cam, means, colors, opacity, scales, rots, bg, max_per_tile=256)
        np.testing.assert_allclose(a["image"], b["image"], atol=1e-6)
        np.testing.assert_allclose(a["alpha"], b["alpha"], atol=1e-6)

    def test_gradients_match(self, scene, cam):
        means, colors, opacity, scales, rots = scene
        bg = jnp.zeros(3)
        mesh = make_mesh(data=1, tile=8)

        def loss_sharded(m):
            out = rasterize_tile_sharded(mesh, cam, m, colors, opacity, scales, rots, bg, max_per_tile=256)
            return jnp.mean(out["image"])

        def loss_single(m):
            out = rasterize_tiled(cam, m, colors, opacity, scales, rots, bg, max_per_tile=256, blend="pallas")
            return jnp.mean(out["image"])

        g_s = jax.grad(loss_sharded)(means)
        g_1 = jax.grad(loss_single)(means)
        np.testing.assert_allclose(g_s, g_1, atol=1e-6)

    def test_uneven_tile_padding(self, scene):
        """A tile count not divisible by the axis size exercises the padding."""
        means, colors, opacity, scales, rots = scene
        cam = make_camera(np.eye(3), np.array([0, 0, 3.0]), 96, 96, fovx=1.0, fovy=1.0)  # 9 tiles
        bg = jnp.zeros(3)
        mesh = make_mesh(data=1, tile=8)
        a = rasterize_tiled(cam, means, colors, opacity, scales, rots, bg, max_per_tile=256, blend="pallas")
        b = rasterize_tile_sharded(mesh, cam, means, colors, opacity, scales, rots, bg, max_per_tile=256)
        np.testing.assert_allclose(a["image"], b["image"], atol=1e-6)
