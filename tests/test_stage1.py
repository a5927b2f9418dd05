"""Stage-1 smoke test: short two-phase run on the synthetic articulated scene."""
import jax
import numpy as np
import pytest

from riggs_tpu.data.synthetic import make_scene_data
from riggs_tpu.train.config import Config
from riggs_tpu.train.stage1 import train_stage1


def tiny_config():
    cfg = Config()
    cfg.model.capacity = 1024
    cfg.model.node_num = 24
    cfg.model.sh_degree = 1
    cfg.model.hyper_dim = 2
    cfg.pipe.max_per_tile = 256
    o = cfg.opt
    o.iterations_node_rendering = 60
    o.iterations_node_sampling = 40
    o.node_warm_up = 10
    o.node_max_num_ratio_during_init = 4
    o.iterations = 80
    o.warm_up = 10
    o.densification_interval = 30
    o.densify_from_iter = 20
    o.densify_until_iter = 70
    o.opacity_reset_interval = 10_000_000
    o.oneupSHdegree_step = 40
    return cfg


class TestStage1:
    @pytest.mark.slow
    def test_two_phase_training_improves(self, rng):
        _, scene = make_scene_data(n_train=6, n_test=2, width=64, height=64, max_thinned=128, n_init_points=200)
        cfg = tiny_config()
        state, hist = train_stage1(scene, cfg, log_every=10)
        a = [h for h in hist if h[0] == "A"]
        b = [h for h in hist if h[0] == "B"]
        assert len(a) > 0 and len(b) > 0
        # phase A: node rendering improves somewhere (per-frame loss is noisy
        # across the random frame sequence)
        assert min(h[2]["loss"] for h in a[1:]) < a[0][2]["loss"] * 1.05, a
        # phase B: full rendering converges toward the data
        assert max(h[2]["psnr"] for h in b[1:]) > b[0][2]["psnr"] + 1.0, b
        # node count after downsampling == node_num
        assert int(np.sum(np.asarray(state.node_gs.alive))) == cfg.model.node_num
        assert state.warp.node_num == cfg.model.node_num
        # warp nodes were finalized onto the node-gaussian positions (they keep
        # training in phase B, so only require they stayed in the neighborhood)
        alive_xyz = np.asarray(state.node_gs.xyz)[np.asarray(state.node_gs.alive)]
        drift = np.abs(np.sort(np.asarray(state.warp.nodes[:, 0])) - np.sort(alive_xyz[:, 0]))
        assert drift.max() < 0.3, drift.max()
