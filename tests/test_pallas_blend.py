"""Pallas fused blend vs the jnp blend path (interpret mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from riggs_tpu.camera import make_camera
from riggs_tpu.render.oracle import rasterize_oracle
from riggs_tpu.render.tiles import rasterize_tiled
from tests.test_render import make_scene


@pytest.fixture
def cam():
    return make_camera(np.eye(3), np.array([0, 0, 3.0]), 64, 64, fovx=1.0, fovy=1.0)


class TestPallasBlend:
    def test_forward_matches_oracle(self, rng, cam):
        means, colors, opacity, scales, rots = make_scene(rng, n=200)
        bg = jnp.array([0.2, 0.1, 0.4])
        a = rasterize_oracle(cam, means, colors, opacity, scales, rots, bg)
        b = rasterize_tiled(
            cam, means, colors, opacity, scales, rots, bg, max_per_tile=256, blend="pallas"
        )
        np.testing.assert_allclose(a["image"], b["image"], atol=3e-5)
        np.testing.assert_allclose(a["alpha"], b["alpha"], atol=3e-5)
        np.testing.assert_allclose(a["depth"], b["depth"], atol=2e-4)

    def test_backward_matches_jnp(self, rng, cam):
        means, colors, opacity, scales, rots = make_scene(rng, n=80)
        bg = jnp.zeros(3)
        target = jnp.full((64, 64, 3), 0.5)

        def loss(blend, m, c, o, s):
            out = rasterize_tiled(
                cam, m, c, o, s, rots, bg, max_per_tile=256, blend=blend
            )
            return jnp.mean((out["image"] - target) ** 2) + 0.01 * jnp.mean(out["depth"]) + 0.01 * jnp.mean(out["alpha"])

        g_j = jax.grad(lambda *a: loss("jnp", *a), argnums=(0, 1, 2, 3))(means, colors, opacity, scales)
        g_p = jax.grad(lambda *a: loss("pallas", *a), argnums=(0, 1, 2, 3))(means, colors, opacity, scales)
        for a, b, name in zip(g_j, g_p, ["means", "colors", "opacity", "scales"]):
            np.testing.assert_allclose(a, b, atol=1e-4, rtol=1e-3, err_msg=name)

    def test_multi_chunk(self, rng, cam):
        """max_per_tile > G_CHUNK exercises the cross-chunk transmittance carry
        and the reversed-suffix backward."""
        means, colors, opacity, scales, rots = make_scene(rng, n=400, seed_extent=0.3)
        bg = jnp.zeros(3)
        a = rasterize_tiled(cam, means, colors, opacity, scales, rots, bg, max_per_tile=512, blend="jnp")
        b = rasterize_tiled(cam, means, colors, opacity, scales, rots, bg, max_per_tile=512, blend="pallas")
        np.testing.assert_allclose(a["image"], b["image"], atol=3e-5)

        def loss(blend):
            out = rasterize_tiled(cam, means, colors, opacity, scales, rots, bg, max_per_tile=512, blend=blend)
            return jnp.mean(out["image"])

        ga = jax.grad(lambda m: jnp.mean(rasterize_tiled(cam, m, colors, opacity, scales, rots, bg, max_per_tile=512, blend="jnp")["image"]))(means)
        gb = jax.grad(lambda m: jnp.mean(rasterize_tiled(cam, m, colors, opacity, scales, rots, bg, max_per_tile=512, blend="pallas")["image"]))(means)
        np.testing.assert_allclose(ga, gb, atol=1e-4, rtol=1e-3)


class TestLadderedWindows:
    """Count-adaptive window capacities (tile_ladder): rank-sorted tiles get
    smaller windows, shrinking the row-op-bound instance gather/scatter; the
    permuted-tile kernel must reproduce the dense path exactly."""

    def test_ladder_matches_dense_fwd_bwd(self, rng):
        big = make_camera(np.eye(3), np.array([0, 0, 3.0]), 128, 128, fovx=1.0, fovy=1.0)
        means, colors, opacity, scales, rots = make_scene(rng, n=400, seed_extent=0.4)
        bg = jnp.zeros(3)
        T = 4 * 4
        ladder = ((4, 512), (4, 256), (8, 128))

        def loss(kw, m, c, o):
            out = rasterize_tiled(big, m, c, o, scales, rots, bg, max_per_tile=512,
                                  blend="pallas", **kw)
            return jnp.sum(out["image"] * jnp.sin(1.0 + out["image"])), out

        (la, a), ga = jax.value_and_grad(lambda m, c, o: loss({}, m, c, o), argnums=(0, 1, 2), has_aux=True)(
            means, colors, opacity
        )
        (lb, b), gb = jax.value_and_grad(
            lambda m, c, o: loss(dict(tile_ladder=ladder), m, c, o), argnums=(0, 1, 2), has_aux=True
        )(means, colors, opacity)
        # the densest 4 tiles must fit 512 for exactness of this comparison
        assert int(b["overflow_tiles"]) == 0, int(b["overflow_tiles"])
        np.testing.assert_allclose(np.asarray(a["image"]), np.asarray(b["image"]), atol=2e-5)
        np.testing.assert_allclose(np.asarray(a["depth"]), np.asarray(b["depth"]), atol=2e-4)
        np.testing.assert_allclose(np.asarray(a["alpha"]), np.asarray(b["alpha"]), atol=2e-5)
        for x, y in zip(ga, gb):
            # rtol absorbs fp reorder noise on large-magnitude grads (the two
            # paths sum per-tile contributions in different bucket orders)
            np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=3e-5, rtol=1e-5)

    def test_ladder_truncation_counted(self, rng):
        big = make_camera(np.eye(3), np.array([0, 0, 3.0]), 128, 128, fovx=1.0, fovy=1.0)
        means, colors, opacity, scales, rots = make_scene(rng, n=400, seed_extent=0.2)
        ladder = ((16, 128),)  # too small for the dense center tiles
        out = rasterize_tiled(big, means, colors, opacity, scales, rots, jnp.zeros(3),
                              max_per_tile=512, blend="pallas", tile_ladder=ladder)
        assert int(out["overflow_tiles"]) > 0

    def test_ladder_must_partition(self, rng):
        big = make_camera(np.eye(3), np.array([0, 0, 3.0]), 128, 128, fovx=1.0, fovy=1.0)
        means, colors, opacity, scales, rots = make_scene(rng, n=10)
        with pytest.raises(ValueError):
            rasterize_tiled(big, means, colors, opacity, scales, rots, jnp.zeros(3),
                            blend="pallas", tile_ladder=((4, 128),))

    def test_make_tile_ladder(self, rng):
        from riggs_tpu.render.ladder import ladder_rows, make_tile_ladder

        big = make_camera(np.eye(3), np.array([0, 0, 3.0]), 128, 128, fovx=1.0, fovy=1.0)
        means, colors, opacity, scales, rots = make_scene(rng, n=400, seed_extent=0.4)
        probe = rasterize_tiled(big, means, colors, opacity, scales, rots, jnp.zeros(3),
                                max_per_tile=512, blend="pallas")
        counts = np.asarray(probe["tile_counts"])
        ladder = make_tile_ladder(counts, n_buckets=3, margin=1.0)
        T = counts.shape[0]
        assert sum(n for n, _ in ladder) == T
        caps = [c for _, c in ladder]
        assert caps == sorted(caps, reverse=True)
        # feasible: rendering with the ladder must not truncate
        out = rasterize_tiled(big, means, colors, opacity, scales, rots, jnp.zeros(3),
                              max_per_tile=512, blend="pallas", tile_ladder=ladder)
        assert int(out["overflow_tiles"]) == 0
        # and it must actually shrink the window area vs the dense layout
        assert ladder_rows(ladder) < T * (-(-int(counts.max()) // 128) * 128) or counts.max() <= 128
        # multi-frame envelope: a second probe folded in stays feasible
        ladder2 = make_tile_ladder(np.stack([counts, counts // 2]), n_buckets=4)
        assert sum(n for n, _ in ladder2) == T

    def test_ladder_zero_cap_bucket_skips_empty_tiles(self, rng):
        from riggs_tpu.render.ladder import make_tile_ladder

        big = make_camera(np.eye(3), np.array([0, 0, 3.0]), 128, 128, fovx=1.0, fovy=1.0)
        # tight cluster: most of the 16 tiles are empty
        means, colors, opacity, scales, rots = make_scene(rng, n=150, seed_extent=0.1)
        bg = jnp.full(3, 0.25)
        probe = rasterize_tiled(big, means, colors, opacity, scales, rots, bg,
                                max_per_tile=256, blend="pallas")
        counts = np.asarray(probe["tile_counts"])
        assert (counts == 0).any(), "fixture should have empty tiles"
        ladder = make_tile_ladder(counts, n_buckets=3, margin=1.0, min_cap=0)
        assert ladder[-1][1] == 0  # trailing empty bucket
        out = rasterize_tiled(big, means, colors, opacity, scales, rots, bg,
                              max_per_tile=256, blend="pallas", tile_ladder=ladder)
        assert int(out["overflow_tiles"]) == 0
        np.testing.assert_allclose(np.asarray(probe["image"]), np.asarray(out["image"]), atol=2e-5)
        np.testing.assert_allclose(np.asarray(probe["alpha"]), np.asarray(out["alpha"]), atol=2e-5)


class TestTieredEnumeration:
    """Tiered bbox enumeration (pass-1 2x2 + mid + giant tiers) must be
    image- and grad-exact vs the single-window enumeration on a scene that
    populates every tier: the union of tier cells is exactly the clipped
    bbox rect, and the 3-key (tile, depth, gid) sort makes the blend order
    identical even for bit-equal depths (round-4 on-chip parity finding)."""

    def _scene_with_tiers(self, rng):
        """Mixed scene: small splats (pass-1 2x2), mid splats (> 2x2 rect),
        and two giants (> 4x4 rect) so every enumeration tier is populated."""
        means, colors, opacity, scales, rots = make_scene(rng, n=300, seed_extent=0.4)
        scales = scales.at[:6].set(0.25)  # giants
        scales = scales.at[6:30].set(0.08)  # mid tier
        return means, colors, opacity, scales, rots

    def _grads(self, big, scene, kw):
        means, colors, opacity, scales, rots = scene
        bg = jnp.full(3, 0.15)

        def loss(m, c, o, s):
            out = rasterize_tiled(big, m, c, o, s, rots, bg, blend="pallas", **kw)
            return (
                jnp.sum(out["image"] * jnp.sin(1.0 + out["image"]))
                + 0.1 * jnp.sum(out["depth"])
                + 0.1 * jnp.sum(out["alpha"]),
                out,
            )

        (l, out), g = jax.value_and_grad(loss, argnums=(0, 1, 2, 3), has_aux=True)(
            means, colors, opacity, scales
        )
        return l, out, g

    @pytest.mark.parametrize(
        "kw",
        [
            dict(max_per_tile=512, max_tiles_per_gaussian=4, mid_cap=64, mid_side=4),
            dict(
                max_per_tile=512,
                max_tiles_per_gaussian=4,
                mid_cap=64,
                mid_side=4,
                tile_ladder=((4, 512), (4, 256), (8, 128)),
            ),
        ],
        ids=["tiers", "tiers+ladder"],
    )
    def test_matches_single_window_enumeration(self, rng, kw):
        big = make_camera(np.eye(3), np.array([0, 0, 3.0]), 128, 128, fovx=1.0, fovy=1.0)
        scene = self._scene_with_tiers(rng)
        la, a, ga = self._grads(big, scene, dict(max_per_tile=512))
        lb, b, gb = self._grads(big, scene, kw)
        assert int(b["overflow"]) == 0
        np.testing.assert_allclose(np.asarray(a["image"]), np.asarray(b["image"]), atol=2e-6)
        for x, y, name in zip(ga, gb, ["means", "colors", "opacity", "scales"]):
            # identical contributions, different accumulation orders
            np.testing.assert_allclose(
                np.asarray(x), np.asarray(y), atol=3e-5, rtol=1e-5, err_msg=name
            )
