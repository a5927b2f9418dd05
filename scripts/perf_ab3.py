"""A/B: exact tile culling, MXU cumsum, tighter MAX. One process, run alone."""
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
import riggs_tpu.render.pallas_blend as PB
import riggs_tpu.render.binning as B
import riggs_tpu.render.tiles as TI

N = 100_000
SIZE = 800
cam = make_camera(np.eye(3), np.array([0, 0, 2.5]), SIZE, SIZE, fovx=0.9, fovy=0.9)
means, colors, opacity, scales, rots = build_scene(N)
bg = jnp.zeros(3)


def stats():
    from riggs_tpu.render.project import build_cov3d_packed, project_gaussians

    proj = project_gaussians(cam, means, build_cov3d_packed(scales, rots))
    bins = B.bin_gaussians_sorted(proj, SIZE, SIZE, max_per_tile=1024, opacity=opacity)
    c = np.asarray(bins.count)
    print(f"post-cull: instances={c.sum()} max/tile={c.max()} mean={c.mean():.0f}", flush=True)


def run(tag, max_per_tile, mxu, cull=True):
    PB.CUMSUM_MXU = mxu
    orig = B.bin_gaussians_sorted
    if not cull:
        B.bin_gaussians_sorted = lambda *a, opacity=None, **k: orig(*a, opacity=None, **k)

    def loss_fn(means, colors, opacity, scales, rots):
        out = TI.rasterize_tiled(
            cam, means, colors, opacity, scales, rots, bg,
            max_per_tile=max_per_tile, binning="sort",
        )
        return jnp.mean(out["image"])

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
            print(f"{tag:28s} {name:8s}: {ms:7.2f} ms = {mpix:6.1f} Mpix/s  (compile {comp:.0f}s)", flush=True)
    finally:
        B.bin_gaussians_sorted = orig
        PB.CUMSUM_MXU = False


if __name__ == "__main__":
    stats()
    run("nocull max1024 roll", 1024, False, cull=False)
    run("cull   max1024 roll", 1024, False)
    run("cull   max1024 mxu", 1024, True)
    run("cull   max640  roll", 640, False)
    run("cull   max640  mxu", 640, True)
