"""Real-chip tier (`-m tpu`): Mosaic lowering, on-chip parity, VMEM limits.

The CPU suite runs Pallas kernels in interpret mode only, which does not
enforce Mosaic layout legality, VMEM scoped limits, or compile health
(ADVICE r3 #3) — these tests run the REAL kernels on the real axon chip:

    RIGGS_TPU_TESTS=1 python -m pytest -m tpu -n0 -q

Scenes are small (128², ≤400 gaussians) so the whole tier compiles + runs
in ~2-3 min warm (the persistent .jax_cache absorbs repeat compiles). Run
ONE process at a time on the chip (memory: tpu-tunnel-wedge).
"""
import os

import numpy as np
import pytest

pytestmark = pytest.mark.tpu

if os.environ.get("RIGGS_TPU_TESTS") == "1":
    import jax
    import jax.numpy as jnp

    from riggs_tpu.camera import make_camera
    from riggs_tpu.render.tiles import rasterize_tiled
    from tests.test_render import make_scene

    LADDER = ((4, 512), (4, 256), (8, 128))


@pytest.fixture(scope="module")
def chip_scene():
    """NON-saturating parity scene: opacity is scaled down so transmittance
    never crosses T_EPS (no early stop anywhere). Kernel-vs-kernel parity on
    a SATURATING scene is knife-edged on chip: the fp32-grade (~2^-17) MXU
    cumsum differs in the last bits between chunk layouts, flipping the
    inclusion of T_EPS-boundary gaussians whose subgradients are O(1) while
    their color contribution is <= 1e-4 (round-4 on-chip finding — 11% of
    means-grad elements flipped between the plain and laddered kernels on a
    dense 400-splat scene). The CPU interpret suite covers the saturating
    logic bit-exactly; this tier checks Mosaic lowering + real-MXU precision,
    which needs the comparison to be mathematically well-conditioned."""
    assert jax.devices()[0].platform != "cpu", "tpu tier needs the real chip"
    rng = np.random.default_rng(0)
    cam = make_camera(np.eye(3), np.array([0, 0, 3.0]), 128, 128, fovx=1.0, fovy=1.0)
    m, c, o, sc, r = make_scene(rng, n=400, seed_extent=0.4)
    return cam, (m, c, o * 0.12, sc, r), jnp.zeros(3)


@pytest.fixture(scope="module")
def chip_scene_saturating():
    """Full-opacity scene: exercises early-stop predication and escalation.
    Compared at image level only (flipped T_EPS-boundary inclusions move a
    pixel by < 1e-4 weight; grads are compared on chip_scene instead)."""
    assert jax.devices()[0].platform != "cpu", "tpu tier needs the real chip"
    rng = np.random.default_rng(0)
    cam = make_camera(np.eye(3), np.array([0, 0, 3.0]), 128, 128, fovx=1.0, fovy=1.0)
    scene = make_scene(rng, n=400, seed_extent=0.4)
    return cam, scene, jnp.zeros(3)


def _fwd(cam, scene, bg, **kw):
    # jit-wrapped: eager dispatch over the axon tunnel costs seconds per op
    # chain; one compile per distinct kw set hits the persistent cache
    m, c, o, s, r = scene
    f = jax.jit(
        lambda m, c, o, s, r: rasterize_tiled(
            cam, m, c, o, s, r, bg, max_per_tile=512, **kw
        )
    )
    return f(m, c, o, s, r)


def _grads(cam, scene, bg, **kw):
    m, c, o, s, r = scene

    def loss(m, c, o, s):
        out = rasterize_tiled(cam, m, c, o, s, r, bg, max_per_tile=512, **kw)
        return jnp.sum(out["image"] * jnp.sin(1.0 + out["image"]))

    return jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3)))(m, c, o, s)


# On-chip gradient precision: the backward's final moment reductions are
# 1-pass DEFAULT MXU dots — f32 accumulation over inputs rounded once to
# bf16 (~2^-8; fp32-grade alternatives measured slower than the rounding is
# worth, see pallas_blend._dot_f32 docstring). Two kernel layouts therefore
# agree to ~1% relative on large grads, with an absolute floor for
# cancellation-heavy small sums (observed round-4: 4-5 of 1200 means-grad
# elements at |diff| up to 0.045 where the moment sum crosses zero, all
# other elements within 1%).
GRAD_TOL = dict(atol=6e-2, rtol=1e-2)


class TestChipKernels:
    def test_pallas_fwd_matches_jnp_on_chip(self, chip_scene):
        cam, scene, bg = chip_scene
        a = _fwd(cam, scene, bg, blend="jnp")
        b = _fwd(cam, scene, bg, blend="pallas")
        np.testing.assert_allclose(np.asarray(a["image"]), np.asarray(b["image"]), atol=1e-4)

    def test_pallas_bwd_matches_jnp_on_chip(self, chip_scene):
        cam, scene, bg = chip_scene
        ga = _grads(cam, scene, bg, blend="jnp")
        gb = _grads(cam, scene, bg, blend="pallas")
        for x, y in zip(ga, gb):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y), **GRAD_TOL)

    def test_ladder_permuted_kernel_on_chip(self, chip_scene):
        cam, scene, bg = chip_scene
        a = _fwd(cam, scene, bg, blend="pallas")
        b = _fwd(cam, scene, bg, blend="pallas", tile_ladder=LADDER)
        assert int(b["overflow_tiles"]) == 0
        np.testing.assert_allclose(np.asarray(a["image"]), np.asarray(b["image"]), atol=1e-4)
        ga = _grads(cam, scene, bg, blend="pallas")
        gb = _grads(cam, scene, bg, blend="pallas", tile_ladder=LADDER)
        for x, y in zip(ga, gb):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y), **GRAD_TOL)

    def test_gm_tiered_grads_on_chip(self, chip_scene):
        """The ladder path's gaussian-major kernels (BlockSpec (1, G_CHUNK,
        ROWS_GM=10) relies on the full-array lane-dim exemption from Mosaic's
        128-divisibility rule — interpret mode cannot validate that, ADVICE
        r3 #3), run with tiered enumeration, must match the plain-window
        channel-major path in image and gradients."""
        cam, scene, bg = chip_scene
        kw = dict(blend="pallas", tile_ladder=LADDER, max_tiles_per_gaussian=4,
                  mid_cap=64, mid_side=4)
        a = _fwd(cam, scene, bg, blend="pallas")
        b = _fwd(cam, scene, bg, **kw)
        np.testing.assert_allclose(
            np.asarray(a["image"]), np.asarray(b["image"]), atol=1e-4
        )
        ga = _grads(cam, scene, bg, blend="pallas")
        gb = _grads(cam, scene, bg, **kw)
        for x, y in zip(ga, gb):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y), **GRAD_TOL)

    def test_saturating_image_parity_on_chip(self, chip_scene_saturating):
        """Early-stop predication active: plain vs laddered+tiered images may
        differ only by T_EPS-boundary weight (< 1e-4 per pixel, summed over
        the few flipped splats)."""
        cam, scene, bg = chip_scene_saturating
        a = _fwd(cam, scene, bg, blend="pallas")
        b = _fwd(cam, scene, bg, blend="pallas", tile_ladder=LADDER,
                 max_tiles_per_gaussian=4, mid_cap=64, mid_side=4)
        assert int(b["overflow"]) == 0
        np.testing.assert_allclose(
            np.asarray(a["image"]), np.asarray(b["image"]), atol=2e-3
        )

    def test_overflow_escalation_on_chip(self, chip_scene_saturating):
        import dataclasses as dc

        import riggs_tpu.models.gaussians as G
        from riggs_tpu.render.api import render_auto

        cam, (m, c, o, s, r), bg = chip_scene_saturating
        gs = G.create_from_pcd(
            np.asarray(m), np.asarray(c), capacity=m.shape[0], max_sh_degree=0,
            with_motion_mask=False,
        )
        gs = dc.replace(
            gs,
            scaling=jnp.log(s),
            rotation=r,
            opacity=G.inverse_sigmoid(o)[:, None],
        )
        # tiny cap forces at least one escalation retry
        out = render_auto(cam, gs, bg, max_per_tile=64)
        assert int(out["overflow"]) == 0
        assert np.isfinite(np.asarray(out["render"])).all()


class TestChipTraining:
    def test_one_train_step_and_checkpoint(self, tmp_path):
        """One real stage-1 step on the chip + checkpoint round-trip of
        device arrays."""
        from riggs_tpu.data.synthetic import make_scene_data
        from riggs_tpu.train.config import Config
        from riggs_tpu.train.stage1 import train_stage1

        _, scene = make_scene_data(
            n_train=2, n_test=1, width=64, height=64, max_thinned=64, n_init_points=64
        )
        cfg = Config()
        cfg.model.capacity = 256
        cfg.model.node_num = 8
        cfg.model.sh_degree = 1
        cfg.model.hyper_dim = 2
        cfg.pipe.max_per_tile = 128
        o = cfg.opt
        o.iterations_node_rendering = 2
        o.iterations_node_sampling = 1
        o.node_warm_up = 1
        o.iterations = 2
        o.warm_up = 1
        o.densify_from_iter = 10
        o.densify_until_iter = 0
        o.opacity_reset_interval = 10_000_000
        state, hist = train_stage1(scene, cfg, log_every=1)
        assert len(hist) > 0
        assert np.isfinite(hist[-1][2]["loss"])

        from riggs_tpu.io.checkpoint import load_state_npz, save_state_npz

        p = tmp_path / "ck.npz"
        save_state_npz(p, state.gs)
        back = load_state_npz(p, state.gs)
        np.testing.assert_allclose(np.asarray(back.xyz), np.asarray(state.gs.xyz))
