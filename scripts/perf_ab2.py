"""A/B: (E1) histogram vs searchsorted counts in the sort binner;
(E2) bwd-only Pallas chunk width 128 vs 256. One process, sequential.
"""
import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax

jax.config.update("jax_compilation_cache_dir", str(Path(__file__).parent.parent / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from bench import build_scene
from riggs_tpu.camera import make_camera
import riggs_tpu.render.pallas_blend as PB
from riggs_tpu.render import binning as B
from riggs_tpu.render.tiles import rasterize_tiled

N = 100_000
MAX = 1024
SIZE = 800


def run(tag, counts_via, bwd_chunk):
    PB.BWD_CHUNK = bwd_chunk
    orig = B.bin_gaussians_sorted
    cam = make_camera(np.eye(3), np.array([0, 0, 2.5]), SIZE, SIZE, fovx=0.9, fovy=0.9)
    means, colors, opacity, scales, rots = build_scene(N)
    bg = jnp.zeros(3)

    def loss_fn(means, colors, opacity, scales, rots):
        out = rasterize_tiled(
            cam, means, colors, opacity, scales, rots, bg, max_per_tile=MAX,
            binning="sort",
        )
        return jnp.mean(out["image"])

    import riggs_tpu.render.tiles as TI
    B.bin_gaussians_sorted = partial(orig, counts_via=counts_via)
    try:
        for name, f in [
            ("fwd", jax.jit(loss_fn)),
            ("fwd+bwd", jax.jit(jax.grad(loss_fn, argnums=(0, 1, 2, 3, 4)))),
        ]:
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
            print(f"{tag:24s} {name:8s}: {ms:7.2f} ms = {mpix:6.1f} Mpix/s  (compile {comp:.0f}s)", flush=True)
    finally:
        B.bin_gaussians_sorted = orig


if __name__ == "__main__":
    run("searchsorted bwd128", "searchsorted", 128)
    run("histogram    bwd128", "histogram", 128)
    run("histogram    bwd256", "histogram", 256)
    run("histogram    bwd512", "histogram", 512)
