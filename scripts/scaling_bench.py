"""Frame-parallel scaling harness: dp stage-2 step throughput vs mesh size.

Measures steps/s of the REAL frame-parallel stage-2 training step (full loss
set) at data=1..N on whatever devices exist. On real multi-chip hardware this
produces the scaling-efficiency row BASELINE.md asks for (>=85% to 2 hosts);
on this environment it runs on the virtual CPU mesh (pass --cpu N), which
validates the harness and the collective structure, not silicon throughput.

Usage:
  python scripts/scaling_bench.py --cpu 8          # 8 virtual CPU devices
  python scripts/scaling_bench.py                  # real devices
"""
import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", type=int, default=0, help="force N virtual CPU devices")
    ap.add_argument("--width", type=int, default=128)
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", args.cpu)
        print(
            "NOTE: virtual CPU devices share one host's cores — efficiency "
            "numbers validate the collective structure, NOT silicon scaling "
            "(real chips add compute per device; these do not)."
        )

    import jax.numpy as jnp
    import numpy as np

    import __graft_entry__ as g
    from riggs_tpu.parallel.multihost import make_host_mesh
    from riggs_tpu.parallel.train import make_dp_stage2_step, stack_frames, stage2_flags
    from riggs_tpu.parallel.mesh import shard_batch

    ndev = len(jax.devices())
    sizes = [n for n in (1, 2, 4, 8, 16) if n <= ndev]
    scene, state = g._build_tiny_scene(width=args.width, height=args.width, n_train=max(sizes))
    J = state.skel.joints.shape[0]
    lrs_gs = {k: jnp.asarray(1e-4, jnp.float32) for k in state.gs.params_dict()}
    base = None
    for n in sizes:
        mesh = make_host_mesh(data_per_host=n, tile=1, devices=jax.devices()[:n])
        step = make_dp_stage2_step(mesh, max_per_tile=128, use_chamfer=True)
        B = n  # one frame per device: fixed per-device work, ideal = flat time
        batch = shard_batch(stack_frames(scene.train_frames[:B]), mesh)
        a = (state, batch, jnp.arange(B, dtype=jnp.int32), jnp.zeros(3), lrs_gs,
             jnp.asarray(1e-4, jnp.float32), jnp.zeros((B, state.gs.capacity, 3)),
             jnp.zeros((B, J, 3)), jnp.full((B,), 1e-2, jnp.float32), jnp.zeros((B,)),
             stage2_flags(active_sh=1))
        out = step(*a)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = step(*a)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / args.iters
        fps = B / dt
        if base is None:
            base = fps
        eff = fps / (base * n)
        print(f"data={n:2d}: {dt*1e3:8.1f} ms/step  {fps:7.2f} frames/s  "
              f"scaling-eff {eff*100:5.1f}%", flush=True)


if __name__ == "__main__":
    main()
