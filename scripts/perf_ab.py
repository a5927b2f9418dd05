"""A/B the three binning backends end-to-end (fwd+bwd) at the bench point.

One process, sequential, run alone on the chip (see memory: axon
measurement discipline — cross-process comparisons are untrustworthy).
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax

jax.config.update("jax_compilation_cache_dir", str(Path(__file__).parent.parent / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from bench import build_scene
from riggs_tpu.camera import make_camera
from riggs_tpu.render.tiles import rasterize_tiled

N = 100_000
MAX = 1024
SIZE = 800


def main():
    cam = make_camera(np.eye(3), np.array([0, 0, 2.5]), SIZE, SIZE, fovx=0.9, fovy=0.9)
    means, colors, opacity, scales, rots = build_scene(N)
    bg = jnp.zeros(3)

    for binning in sys.argv[1:] or ["sort", "sort2", "compact"]:
        def loss_fn(means, colors, opacity, scales, rots):
            out = rasterize_tiled(
                cam, means, colors, opacity, scales, rots, bg,
                max_per_tile=MAX, binning=binning,
            )
            return jnp.mean(out["image"])

        fwd = jax.jit(loss_fn)
        step = jax.jit(jax.grad(loss_fn, argnums=(0, 1, 2, 3, 4)))
        for name, f in [("fwd", fwd), ("fwd+bwd", step)]:
            t0 = time.time()
            out = f(means, colors, opacity, scales, rots)
            jax.block_until_ready(out)
            comp = time.time() - t0
            t0 = time.perf_counter()
            for _ in range(20):
                out = f(means, colors, opacity, scales, rots)
            jax.block_until_ready(out)
            ms = (time.perf_counter() - t0) / 20 * 1e3
            mpix = SIZE * SIZE / (ms / 1e3) / 1e6
            print(f"{binning:8s} {name:8s}: {ms:7.2f} ms = {mpix:6.1f} Mpix/s  (compile {comp:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
