"""Two-process multi-host smoke: REAL cross-process collectives on one box.

Each process owns 4 virtual CPU devices; jax.distributed forms the 2-host
cluster (the DCN stand-in is localhost TCP), `make_host_mesh` folds the host
factor into 'data', each process loads only its own frame shard
(`host_local_frames` + `global_batch`), and one frame-parallel static
training step runs with its gradient all-reduce crossing processes.

Launch (the test does this):
  python scripts/multihost_smoke.py --num_processes 2 --process_id 0 &
  python scripts/multihost_smoke.py --num_processes 2 --process_id 1

Prints `MULTIHOST OK loss=<x> procs=2` from process 0 on success. This is
the executable form of SURVEY §2.2's multi-host design — same code path a
TPU pod launch takes, with ICI/DCN replaced by virtual devices/TCP.
"""
import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--coordinator", default="127.0.0.1:9911")
    ap.add_argument("--num_processes", type=int, default=2)
    ap.add_argument("--process_id", type=int, required=True)
    ap.add_argument("--devices_per_process", type=int, default=4)
    ap.add_argument(
        "--stage2", action="store_true",
        help="run the FULL stage-2 dp step (warmup/chamfer/template losses) "
        "instead of the static step",
    )
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", args.devices_per_process)
    jax.distributed.initialize(
        coordinator_address=args.coordinator,
        num_processes=args.num_processes,
        process_id=args.process_id,
    )
    import jax.numpy as jnp
    import numpy as np

    from riggs_tpu.models import gaussians as G
    from riggs_tpu.parallel.multihost import global_batch, host_local_frames, make_host_mesh
    from riggs_tpu.parallel.train import make_dp_static_step, stack_frames
    from riggs_tpu.data.synthetic import make_scene_data
    from riggs_tpu.train import optim as O
    from riggs_tpu.train.static import TrainState

    assert jax.process_count() == args.num_processes
    mesh = make_host_mesh(tile=1)
    n_data = mesh.shape["data"]

    if args.stage2:
        # deterministic flagship stage-2 state on every host; the FULL dp
        # stage-2 step (distillation/chamfer/template losses, traced flags)
        # with its all-reduce crossing processes
        import __graft_entry__ as g
        from riggs_tpu.parallel.train import make_dp_stage2_step, stage2_flags

        scene, state = g._build_tiny_scene(width=32, height=32, n_train=n_data)
        local, idx = host_local_frames(scene.train_frames, batch=n_data, step=0)
        batch = global_batch(stack_frames(local), mesh)
        B = n_data
        J = state.skel.joints.shape[0]
        lo = (B // jax.process_count()) * jax.process_index()
        hi = lo + B // jax.process_count()
        step = make_dp_stage2_step(mesh, max_per_tile=128, use_chamfer=True)
        new_state, metrics = step(
            state,
            batch,
            global_batch(np.asarray(idx, np.int32)[lo:hi], mesh),
            jnp.zeros(3),
            {k: jnp.asarray(1e-4, jnp.float32) for k in state.gs.params_dict()},
            jnp.asarray(1e-4, jnp.float32),
            global_batch(np.zeros((hi - lo, state.gs.capacity, 3), np.float32), mesh),
            global_batch(np.zeros((hi - lo, J, 3), np.float32), mesh),
            global_batch(np.full((hi - lo,), 1e-2, np.float32), mesh),
            global_batch(np.zeros((hi - lo,), np.float32), mesh),
            stage2_flags(active_sh=1),
        )
        loss_val = float(metrics["loss"])
        moved = float(jnp.abs(new_state.skel.node_radius_log - state.skel.node_radius_log).max())
    else:
        _, scene = make_scene_data(n_train=n_data, n_test=1, width=32, height=32, n_init_points=64)
        gs = G.create_from_pcd(scene.init_points, scene.init_colors, capacity=128, max_sh_degree=0)
        state = TrainState(gs=gs, opt=O.adam_init(gs.params_dict()), stats=G.init_densify_stats(128))

        local, _ = host_local_frames(scene.train_frames, batch=n_data, step=0)
        batch = global_batch(stack_frames(local), mesh)

        step = make_dp_static_step(mesh, active_sh=0, max_per_tile=128)
        new_state, loss = step(state, batch, jnp.zeros(3), jnp.asarray(1e-3))
        loss_val = float(loss)  # fully replicated scalar — same on every host
        moved = float(jnp.abs(new_state.gs.xyz - state.gs.xyz).max())
    assert np.isfinite(loss_val)
    # the step must have moved the replicated params identically on all hosts
    assert moved > 0.0
    if jax.process_index() == 0:
        print(f"MULTIHOST OK loss={loss_val:.6f} procs={jax.process_count()}", flush=True)
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
