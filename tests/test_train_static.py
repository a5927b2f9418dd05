"""End-to-end gate: static 3DGS training on a synthetic scene must converge."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from riggs_tpu.data.synthetic import make_stick_figure, ring_cameras, render_frame
from riggs_tpu.models import gaussians as G
from riggs_tpu.train import optim as O
from riggs_tpu.train.config import Config
from riggs_tpu.train.static import train_static, init_state, train_step, densify_step


def small_config(capacity=2048):
    cfg = Config()
    cfg.model.capacity = capacity
    cfg.model.sh_degree = 1
    cfg.model.gs_with_motion_mask = False
    cfg.pipe.max_per_tile = 256
    cfg.opt.densification_interval = 50
    cfg.opt.densify_from_iter = 40
    cfg.opt.opacity_reset_interval = 10_000_000  # off for the short test
    return cfg


class TestStaticTraining:
    @pytest.mark.slow
    def test_loss_decreases_and_psnr_rises(self, rng):
        fig = make_stick_figure()
        cams = ring_cameras(4, width=64, image_height=64)
        data = [(c, render_frame(fig, c, t=None)) for c in cams]
        # init from noisy subsample of the true points
        sel = rng.choice(len(fig.points), 200, replace=False)
        pts = fig.points[sel] + rng.normal(size=(200, 3)).astype(np.float32) * 0.02
        cols = fig.colors[sel]
        cfg = small_config()
        state, hist = train_static(data, cfg, 120, pts, cols, log_every=20)
        first = hist[0][1]
        last = hist[-1][1]
        assert last["loss"] < first["loss"] * 0.7, (first, last)
        assert last["psnr"] > first["psnr"] + 3.0, (first, last)

    @pytest.mark.slow
    def test_densify_allocates_and_zeroes_moments(self, rng):
        fig = make_stick_figure()
        cams = ring_cameras(2, width=64, image_height=64)
        data = [(c, render_frame(fig, c, t=None)) for c in cams]
        pts = fig.points[:100]
        cols = fig.colors[:100]
        cfg = small_config(capacity=512)
        gs = G.create_from_pcd(pts, cols, capacity=512, max_sh_degree=1, with_motion_mask=False)
        state = init_state(gs)
        lrs = {k: jnp.asarray(1e-3) for k in gs.params_dict()}
        for it in range(30):
            cam, img = data[it % 2]
            state, _ = train_step(state, cam, jnp.asarray(img), jnp.zeros(3), lrs, active_sh=0, max_per_tile=256)
        n0 = int(state.gs.num_alive)
        state = densify_step(state, jax.random.PRNGKey(0), 1e-7, 10.0)  # tiny threshold: split everything
        n1 = int(state.gs.num_alive)
        assert n1 != n0  # something happened (split/clone/prune)
        # moments of newly-allocated (previously dead) slots are zero
        alive_new = np.asarray(state.gs.alive)
        mu_xyz = np.asarray(state.opt.mu["xyz"])
        fresh = alive_new & (np.arange(512) >= 100)
        if fresh.any():
            assert np.abs(mu_xyz[fresh]).max() == 0.0


class TestAdam:
    def test_adam_converges_quadratic(self):
        p = {"x": jnp.array([5.0, -3.0])}
        st = O.adam_init(p)
        for _ in range(400):
            g = jax.grad(lambda q: jnp.sum(q["x"] ** 2))(p)
            p, st = O.adam_update(g, st, p, {"x": jnp.asarray(0.05)})
        assert float(jnp.abs(p["x"]).max()) < 1e-2

    def test_update_mask_freezes(self):
        p = {"a": jnp.ones(3), "b": jnp.ones(3)}
        st = O.adam_init(p)
        g = {"a": jnp.ones(3), "b": jnp.ones(3)}
        p2, st2 = O.adam_update(g, st, p, jnp.asarray(0.1), update_mask={"a": True, "b": False})
        assert not np.allclose(p2["a"], 1.0)
        np.testing.assert_allclose(p2["b"], 1.0)
        np.testing.assert_allclose(st2.mu["b"], 0.0)

    def test_zero_rows(self):
        p = {"x": jnp.ones((8, 3))}
        st = O.adam_init(p)
        g = {"x": jnp.ones((8, 3))}
        _, st = O.adam_update(g, st, p, jnp.asarray(0.1))
        st = O.zero_rows(st, jnp.array([2, 5, 100]))  # 100 out of range -> dropped
        mu = np.asarray(st.mu["x"])
        assert np.abs(mu[[2, 5]]).max() == 0.0
        assert np.abs(mu[0]).max() > 0.0
