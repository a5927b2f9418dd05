"""Multi-chip sharding tests on the 8-device virtual CPU mesh."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from riggs_tpu.parallel.mesh import make_mesh, shard_batch, data_sharded
from riggs_tpu.parallel.train import make_dp_static_step, make_dp_stage2_step, stack_frames


@pytest.fixture(scope="module")
def scene_and_states():
    from riggs_tpu.data.synthetic import make_scene_data
    from riggs_tpu.models import gaussians as G
    from riggs_tpu.train.static import init_state

    _, scene = make_scene_data(n_train=8, n_test=1, width=64, height=64, max_thinned=64, n_init_points=150)
    gs = G.create_from_pcd(
        scene.init_points, scene.init_colors, capacity=256, max_sh_degree=1, with_motion_mask=False
    )
    return scene, init_state(gs)


class TestMesh:
    def test_make_mesh_shapes(self):
        mesh = make_mesh(data=4, tile=2)
        assert mesh.devices.shape == (4, 2)
        assert mesh.axis_names == ("data", "tile")

    def test_dp_static_step_runs_and_reduces(self, scene_and_states):
        scene, state = scene_and_states
        mesh = make_mesh(data=8, tile=1)
        step = make_dp_static_step(mesh, active_sh=0, max_per_tile=128)
        batch = shard_batch(stack_frames(scene.train_frames[:8]), mesh)
        state2, loss = step(state, batch, jnp.zeros(3), jnp.asarray(1e-3))
        assert np.isfinite(float(loss))
        # parameters changed (gradient was applied)
        assert not np.allclose(np.asarray(state.gs.xyz), np.asarray(state2.gs.xyz))

    def test_dp_matches_single_device_loss(self, scene_and_states):
        """The sharded mean loss must equal the unsharded mean of per-frame losses."""
        from riggs_tpu.render.api import render
        from riggs_tpu.train import losses as L

        scene, state = scene_and_states
        mesh = make_mesh(data=8, tile=1)
        step = make_dp_static_step(mesh, active_sh=0, max_per_tile=128)
        batch = shard_batch(stack_frames(scene.train_frames[:8]), mesh)
        _, loss = step(state, batch, jnp.zeros(3), jnp.asarray(0.0))

        ref_losses = []
        for f in scene.train_frames[:8]:
            out = render(f.cam, state.gs, jnp.zeros(3), active_sh_degree=0, max_per_tile=128)
            ref_losses.append(float(L.photometric_loss(out["render"], f.image, 0.2)))
        np.testing.assert_allclose(float(loss), np.mean(ref_losses), rtol=1e-4)

    def test_dp_stage2_step(self, scene_and_states):
        import sys

        sys.path.insert(0, "/root/repo")
        import __graft_entry__ as g

        scene, state2 = g._build_tiny_scene(width=64, height=64, n_train=8)
        mesh = make_mesh(data=4, tile=2)
        step = make_dp_stage2_step(mesh, active_sh=1, max_per_tile=128)
        batch = shard_batch(stack_frames(scene.train_frames[:4]), mesh)
        new_state, loss = step(state2, batch, jnp.zeros(3), jnp.asarray(1e-4))
        assert np.isfinite(float(loss))
