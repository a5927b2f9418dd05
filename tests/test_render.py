"""Parity tests: tiled fast-path rasterizer vs the exact oracle."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from riggs_tpu.camera import make_camera
from riggs_tpu.render.oracle import rasterize_oracle
from riggs_tpu.render.tiles import rasterize_tiled
from riggs_tpu.render.project import build_cov3d, project_gaussians


def make_scene(rng, n=200, seed_extent=1.0):
    means = rng.normal(size=(n, 3)).astype(np.float32) * seed_extent
    colors = rng.uniform(size=(n, 3)).astype(np.float32)
    opacity = rng.uniform(0.2, 0.95, size=(n,)).astype(np.float32)
    scales = np.exp(rng.uniform(-3.5, -2.0, size=(n, 3))).astype(np.float32)
    q = rng.normal(size=(n, 4)).astype(np.float32)
    rots = q / np.linalg.norm(q, axis=-1, keepdims=True)
    return tuple(map(jnp.asarray, (means, colors, opacity, scales, rots)))


@pytest.fixture
def cam():
    return make_camera(np.eye(3), np.array([0, 0, 3.0]), 64, 64, fovx=1.0, fovy=1.0)


class TestTiledParity:
    def test_image_matches_oracle(self, rng, cam):
        means, colors, opacity, scales, rots = make_scene(rng)
        bg = jnp.array([0.1, 0.2, 0.3])
        a = rasterize_oracle(cam, means, colors, opacity, scales, rots, bg)
        b = rasterize_tiled(cam, means, colors, opacity, scales, rots, bg)
        assert int(b["overflow"]) == 0
        np.testing.assert_allclose(a["image"], b["image"], atol=2e-5)
        np.testing.assert_allclose(a["alpha"], b["alpha"], atol=2e-5)
        np.testing.assert_allclose(a["depth"], b["depth"], atol=1e-4)

    def test_grads_match_oracle(self, rng, cam):
        means, colors, opacity, scales, rots = make_scene(rng, n=60)
        bg = jnp.zeros(3)
        target = jnp.zeros((64, 64, 3)) + 0.5

        def loss(fn, m, o, s):
            out = fn(cam, m, colors, o, s, rots, bg)
            return jnp.mean((out["image"] - target) ** 2)

        g_o = jax.grad(loss, argnums=(1, 2, 3))(lambda *a, **k: rasterize_oracle(*a, **k), means, opacity, scales)
        g_t = jax.grad(loss, argnums=(1, 2, 3))(lambda *a, **k: rasterize_tiled(*a, **k), means, opacity, scales)
        for a, b, name in zip(g_o, g_t, ["means", "opacity", "scales"]):
            np.testing.assert_allclose(a, b, atol=5e-5, err_msg=name)

    def test_alive_mask(self, rng, cam):
        means, colors, opacity, scales, rots = make_scene(rng, n=50)
        alive = jnp.arange(50) % 2 == 0
        bg = jnp.zeros(3)
        a = rasterize_oracle(cam, means, colors, opacity, scales, rots, bg, alive=alive)
        b = rasterize_tiled(cam, means, colors, opacity, scales, rots, bg, alive=alive)
        np.testing.assert_allclose(a["image"], b["image"], atol=2e-5)

    def test_nonsquare_image(self, rng):
        cam = make_camera(np.eye(3), np.array([0, 0, 3.0]), 80, 48, fovx=1.0, fovy=0.7)
        means, colors, opacity, scales, rots = make_scene(rng, n=100)
        bg = jnp.array([1.0, 1.0, 1.0])
        a = rasterize_oracle(cam, means, colors, opacity, scales, rots, bg)
        b = rasterize_tiled(cam, means, colors, opacity, scales, rots, bg)
        assert b["image"].shape == (48, 80, 3)
        np.testing.assert_allclose(a["image"], b["image"], atol=2e-5)

    def test_overflow_counter(self, rng, cam):
        # tiny max_per_tile on a dense scene must report overflow
        means, colors, opacity, scales, rots = make_scene(rng, n=500, seed_extent=0.1)
        bg = jnp.zeros(3)
        out = rasterize_tiled(cam, means, colors, opacity, scales, rots, bg, max_per_tile=128)
        assert int(out["overflow"]) > 0

    def test_finite_diff_composite(self, rng):
        """Autodiff of the compositing core vs finite differences, away from the
        non-smooth thresholds (1/255 cutoff, 0.99 clamp, 1e-4 early stop) that
        make the full rasterizer only piecewise-smooth."""
        from riggs_tpu.render.oracle import composite

        n = 16
        alphas0 = jnp.asarray(rng.uniform(0.05, 0.6, size=(4, n)).astype(np.float32))
        colors = jnp.asarray(rng.uniform(size=(n, 3)).astype(np.float32))
        depths = jnp.asarray(rng.uniform(1, 3, size=(n,)).astype(np.float32))

        def loss(a):
            rgb, dep, acc = composite(a, colors, depths)
            return jnp.sum(rgb) + jnp.sum(dep) + jnp.sum(acc)

        g = jax.grad(loss)(alphas0)
        eps = 1e-2  # fp32: balance roundoff cancellation vs truncation
        for idx in [(0, 0), (1, 7), (3, 15)]:
            fd = (loss(alphas0.at[idx].add(eps)) - loss(alphas0.at[idx].add(-eps))) / (2 * eps)
            np.testing.assert_allclose(g[idx], fd, rtol=3e-2, atol=1e-4)


class TestBinning:
    def test_sorted_matches_dense(self, rng, cam):
        """The key-sort binner must produce the same per-tile lists as the
        dense-mask reference binner (same order, same membership)."""
        from riggs_tpu.render.binning import bin_gaussians, bin_gaussians_sorted
        from riggs_tpu.render.project import build_cov3d, project_gaussians

        means, colors, opacity, scales, rots = make_scene(rng, n=300)
        proj = project_gaussians(cam, means, build_cov3d(scales, rots))
        a = bin_gaussians(proj, 64, 64, max_per_tile=512)
        b = bin_gaussians_sorted(proj, 64, 64, max_per_tile=512)
        na = np.asarray(a.valid).sum(1)
        nb = np.asarray(b.valid).sum(1)
        np.testing.assert_array_equal(na, nb)
        b_idx = np.asarray(b.idx)
        for t in range(a.idx.shape[0]):
            ia = np.asarray(a.idx[t])[np.asarray(a.valid[t])]
            ib = b_idx[t][np.asarray(b.valid[t])]
            np.testing.assert_array_equal(ia, ib)

    @pytest.mark.parametrize("binning", ["sort", "sort2", "compact", "runs"])
    def test_binner_image_matches_oracle(self, rng, cam, binning):
        means, colors, opacity, scales, rots = make_scene(rng, n=150)
        bg = jnp.zeros(3)
        a = rasterize_oracle(cam, means, colors, opacity, scales, rots, bg)
        kw = {"max_per_tile": 128} if binning == "runs" else {}
        b = rasterize_tiled(cam, means, colors, opacity, scales, rots, bg, binning=binning, **kw)
        np.testing.assert_allclose(a["image"], b["image"], atol=2e-5)
        np.testing.assert_allclose(a["alpha"], b["alpha"], atol=2e-5)

    @pytest.mark.parametrize("binning", ["sort2", "compact", "runs"])
    def test_binner_grads_match_oracle(self, rng, cam, binning):
        """The structural custom-VJP gathers (gather_instances segment-sum,
        gather_grid collision-free scatter) must reproduce XLA's autodiff
        scatter-add gradients exactly."""
        means, colors, opacity, scales, rots = make_scene(rng, n=60)
        bg = jnp.zeros(3)
        target = jnp.zeros((64, 64, 3)) + 0.5

        def loss(fn, m, o, s, **kw):
            out = fn(cam, m, colors, o, s, rots, bg, **kw)
            return jnp.mean((out["image"] - target) ** 2)

        g_o = jax.grad(loss, argnums=(1, 2, 3))(
            lambda *a, **k: rasterize_oracle(*a, **k), means, opacity, scales
        )
        kw = {"max_per_tile": 128} if binning == "runs" else {}
        g_t = jax.grad(loss, argnums=(1, 2, 3))(
            lambda *a, **k: rasterize_tiled(*a, **k), means, opacity, scales,
            binning=binning, **kw,
        )
        for a, b, name in zip(g_o, g_t, ["means", "opacity", "scales"]):
            np.testing.assert_allclose(a, b, atol=5e-5, err_msg=name)


class TestProjection:
    def test_isotropic_radius(self, rng):
        cam = make_camera(np.eye(3), np.array([0, 0, 2.0]), 100, 100, fovx=1.0, fovy=1.0)
        s = 0.05
        cov3d = build_cov3d(jnp.full((1, 3), s), jnp.array([[1.0, 0, 0, 0]]))
        proj = project_gaussians(cam, jnp.array([[0.0, 0.0, 0.0]]), cov3d)
        fx = 50.0 / np.tan(0.5)
        expect = np.ceil(3 * np.sqrt((s * fx / 2.0) ** 2 + 0.3))
        np.testing.assert_allclose(proj.radius[0], expect, atol=1.0)

    def test_behind_camera_culled(self):
        cam = make_camera(np.eye(3), np.array([0, 0, 2.0]), 64, 64, fovx=1.0, fovy=1.0)
        cov3d = build_cov3d(jnp.full((1, 3), 0.1), jnp.array([[1.0, 0, 0, 0]]))
        proj = project_gaussians(cam, jnp.array([[0.0, 0.0, -5.0]]), cov3d)
        assert not bool(proj.mask[0])


class TestOverflowEscalation:
    """Per-gaussian tile overflow handling (round-1 verdict item 4): a giant
    near-camera splat covering more tiles than max_tiles_per_gaussian must be
    detected, and escalation must recover exact oracle parity."""

    def _giant_scene(self, rng, n=40):
        means, colors, opacity, scales, rots = make_scene(rng, n=n)
        # one huge splat right in front of the camera covering most tiles
        means = means.at[0].set(jnp.array([0.0, 0.0, 1.5]))
        scales = scales.at[0].set(jnp.array([0.5, 0.5, 0.5]))
        opacity = opacity.at[0].set(0.35)
        return means, colors, opacity, scales, rots

    def test_overflow_detected_and_escalation_matches_oracle(self, rng, cam):
        means, colors, opacity, scales, rots = self._giant_scene(rng)
        bg = jnp.zeros(3)
        low = rasterize_tiled(
            cam, means, colors, opacity, scales, rots, bg, binning="sort",
            max_tiles_per_gaussian=1, giant_cap=0,
        )
        assert int(low["overflow_rect"]) > 0  # truncation is counted, not silent
        hi = rasterize_tiled(
            cam, means, colors, opacity, scales, rots, bg, binning="sort",
            max_tiles_per_gaussian=16, giant_cap=0,
        )
        assert int(hi["overflow_rect"]) == 0
        a = rasterize_oracle(cam, means, colors, opacity, scales, rots, bg)
        np.testing.assert_allclose(a["image"], hi["image"], atol=2e-5)

    def test_giant_second_pass_matches_oracle_without_escalation(self, rng, cam):
        """With the giant enumeration pass (default), a splat covering more
        tiles than max_tiles_per_gaussian renders exactly with NO escalation:
        the second pass enumerates the cells the K-window missed (CUDA's
        unbounded duplication, statically bounded)."""
        means, colors, opacity, scales, rots = self._giant_scene(rng)
        bg = jnp.zeros(3)
        out = rasterize_tiled(
            cam, means, colors, opacity, scales, rots, bg, binning="sort",
            max_tiles_per_gaussian=1,
        )
        assert int(out["overflow_rect"]) == 0
        a = rasterize_oracle(cam, means, colors, opacity, scales, rots, bg)
        np.testing.assert_allclose(a["image"], out["image"], atol=2e-5)

    def test_compact_has_no_per_gaussian_cap(self, rng, cam):
        """The compact binner implements CUDA's unbounded-duplication
        semantics: the giant splat needs no max_tiles_per_gaussian escalation,
        only the global instance budget, and truncation of that budget is
        counted (never silent)."""
        means, colors, opacity, scales, rots = self._giant_scene(rng)
        bg = jnp.zeros(3)
        out = rasterize_tiled(
            cam, means, colors, opacity, scales, rots, bg, binning="compact"
        )
        assert int(out["overflow_rect"]) == 0
        a = rasterize_oracle(cam, means, colors, opacity, scales, rots, bg)
        np.testing.assert_allclose(a["image"], out["image"], atol=2e-5)
        dense = make_scene(rng, n=300)
        tiny = rasterize_tiled(
            cam, *dense, bg, binning="compact", max_instances=128,
        )
        assert int(tiny["overflow_rect"]) > 0

    def test_render_auto_escalates(self, rng, cam):
        from riggs_tpu.models import gaussians as G
        from riggs_tpu.render.api import render, render_auto

        means, colors, opacity, scales, rots = self._giant_scene(rng)
        gs = G.create_from_pcd(
            np.asarray(means), np.asarray(colors), capacity=64, max_sh_degree=0,
            with_motion_mask=False,
        )
        import dataclasses as dc

        pad = gs.capacity - scales.shape[0]
        gs = dc.replace(
            gs,
            scaling=jnp.pad(jnp.log(scales), ((0, pad), (0, 0)), constant_values=-9.0),
            rotation=jnp.pad(rots, ((0, pad), (0, 0)), constant_values=0.5),
            opacity=jnp.pad(
                G.inverse_sigmoid(opacity)[:, None], ((0, pad), (0, 0)), constant_values=-9.0
            ),
        )
        bg = jnp.zeros(3)
        low = render(
            cam, gs, bg, binning="sort", max_per_tile=128, max_tiles_per_gaussian=1,
            giant_cap=0,
        )
        assert int(low["overflow_rect"]) > 0
        out = render_auto(
            cam, gs, bg, binning="sort", max_per_tile=128, max_tiles_per_gaussian=1,
            giant_cap=0,
        )
        assert int(out["overflow_tiles"]) == 0 and int(out["overflow_rect"]) == 0
        ref = render(
            cam, gs, bg, binning="sort", max_per_tile=1024, max_tiles_per_gaussian=64,
            giant_cap=0,
        )
        np.testing.assert_allclose(
            np.asarray(out["render"]), np.asarray(ref["render"]), atol=2e-5
        )

    def test_render_auto_escalates_compact_instances(self, rng, cam):
        from riggs_tpu.models import gaussians as G
        from riggs_tpu.render.api import render, render_auto

        means, colors, opacity, scales, rots = self._giant_scene(rng, n=250)
        gs = G.create_from_pcd(
            np.asarray(means), np.asarray(colors), capacity=256, max_sh_degree=0,
            with_motion_mask=False,
        )
        import dataclasses as dc

        pad = gs.capacity - scales.shape[0]
        gs = dc.replace(
            gs,
            scaling=jnp.pad(jnp.log(scales), ((0, pad), (0, 0)), constant_values=-9.0),
            rotation=jnp.pad(rots, ((0, pad), (0, 0)), constant_values=0.5),
            opacity=jnp.pad(
                G.inverse_sigmoid(opacity)[:, None], ((0, pad), (0, 0)), constant_values=-9.0
            ),
        )
        bg = jnp.zeros(3)
        low = render(cam, gs, bg, binning="compact", max_instances=16)
        assert int(low["overflow_rect"]) > 0
        out = render_auto(cam, gs, bg, binning="compact", max_instances=16)
        assert int(out["overflow_tiles"]) == 0 and int(out["overflow_rect"]) == 0
        ref = render(cam, gs, bg, binning="compact")
        np.testing.assert_allclose(
            np.asarray(out["render"]), np.asarray(ref["render"]), atol=2e-5
        )


class TestCullingAndGiants:
    def test_low_opacity_gaussian_culled_consistently(self, rng, cam):
        """op < 1/255 can never pass the blend threshold: culling removes it
        from the lists and the oracle's per-pixel cutoff removes it from the
        image — identical output."""
        means, colors, opacity, scales, rots = make_scene(rng, n=60)
        opacity = opacity.at[:30].set(1.0 / 300.0)
        bg = jnp.zeros(3)
        a = rasterize_oracle(cam, means, colors, opacity, scales, rots, bg)
        b = rasterize_tiled(cam, means, colors, opacity, scales, rots, bg)
        np.testing.assert_allclose(a["image"], b["image"], atol=2e-5)

    def test_giant_cap_overflow_counted(self, rng, cam):
        """More giants than giant_cap: the residual truncation is counted."""
        means, colors, opacity, scales, rots = make_scene(rng, n=40)
        scales = jnp.full_like(scales, 0.35)  # everyone giant
        means = means.at[:, 2].set(0.0)
        out = rasterize_tiled(
            cam, means, colors, opacity, scales, rots, jnp.zeros(3),
            binning="sort", max_tiles_per_gaussian=1, giant_cap=4,
        )
        assert int(out["overflow_rect"]) > 0

    def test_mid_tier_matches_single_window(self, rng, cam):
        """Tiered enumeration (2x2 primary + mid + giant) is exact: same image
        and gradients as the one-window 4x4 scheme, zero overflow, at ~1/3 the
        sort size."""
        means, colors, opacity, scales, rots = make_scene(rng, n=200)
        # spread of sizes: most small, some mid (2-4 tiles wide), a few giants
        scales = scales.at[:20].set(0.08)
        scales = scales.at[:4].set(0.3)
        bg = jnp.zeros(3)

        def run(**kw):
            def loss(ms, cs, op, sc, rt):
                out = rasterize_tiled(cam, ms, cs, op, sc, rt, bg, binning="sort", **kw)
                return jnp.sum(out["image"] * jnp.cos(out["image"])), out

            (val, out), grads = jax.value_and_grad(loss, argnums=(0, 2, 3), has_aux=True)(
                means, colors, opacity, scales, rots
            )
            return val, out, grads

        _, ref, gref = run(max_tiles_per_gaussian=16, giant_cap=32, giant_side=24)
        _, tiered, gt = run(
            max_tiles_per_gaussian=4, mid_cap=64, mid_side=4, giant_cap=32, giant_side=24,
        )
        assert int(tiered["overflow_rect"]) == 0
        np.testing.assert_allclose(ref["image"], tiered["image"], atol=2e-5)
        np.testing.assert_allclose(ref["depth"], tiered["depth"], atol=2e-4)
        for a, b in zip(gref, gt):
            np.testing.assert_allclose(a, b, atol=3e-5)

    def test_mid_cap_overflow_counted(self, rng):
        """Mid-tier cap truncation is counted — including the [side, mid_side)
        ring of giants the mid cap dropped (they are skipped by the giant tier
        so escalation sees the full deficit)."""
        big = make_camera(np.eye(3), np.array([0, 0, 3.0]), 256, 256, fovx=1.0, fovy=1.0)
        means, colors, opacity, scales, rots = make_scene(rng, n=60)
        scales = jnp.full_like(scales, 0.1)  # 3-4-tile rects: all need the mid tier
        out = rasterize_tiled(
            big, means, colors, opacity, scales, rots, jnp.zeros(3),
            binning="sort", max_tiles_per_gaussian=4, mid_cap=1, mid_side=4,
            giant_cap=8,
        )
        assert int(out["overflow_rect"]) > 0
