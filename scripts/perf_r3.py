"""Round-3 on-chip A/B: cell-scatter backward x tiered enumeration x ladder.

Each variant is checked for zero overflow and image parity vs the round-2
default before timing. Run alone on the chip (memory: tpu-tunnel-wedge).
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
import riggs_tpu.render.tiles as tiles
from riggs_tpu.render.tiles import rasterize_tiled

# ladder for the bench scene's sorted-count curve (625 tiles, post-cull
# counts 63..616)
LADDER = ((64, 640), (128, 512), (192, 384), (241, 256))

TIER4 = dict(max_tiles_per_gaussian=4, mid_cap=8192, mid_side=4)

VARIANTS = {
    "r2-default": dict(kw=dict(), cell=False),
    "cell-bwd": dict(kw=dict(), cell=True),
    "ladder+cell": dict(kw=dict(tile_ladder=LADDER), cell=True),
    "tier4+ladder+cell": dict(kw=dict(tile_ladder=LADDER, **TIER4), cell=True),
    "tier4+ladder": dict(kw=dict(tile_ladder=LADDER, **TIER4), cell=False),
}


def main():
    cam = make_camera(np.eye(3), np.array([0, 0, 2.5]), 800, 800, fovx=0.9, fovy=0.9)
    means, colors, opacity, scales, rots = build_scene(100_000)
    bg = jnp.zeros(3)

    def make_step(kw):
        def loss_fn(means, colors, opacity, scales, rots):
            out = rasterize_tiled(
                cam, means, colors, opacity, scales, rots, bg, max_per_tile=640, **kw
            )
            return jnp.mean(out["image"]) + jnp.mean(out["depth"]) * 0.0

        return jax.jit(jax.grad(loss_fn, argnums=(0, 1, 2, 3, 4)))

    ref_img = None
    for name, v in VARIANTS.items():
        tiles.CELL_BWD = v["cell"]
        kw = v["kw"]
        out = rasterize_tiled(
            cam, means, colors, opacity, scales, rots, bg, max_per_tile=640, **kw
        )
        ov = int(out["overflow"])
        img = np.asarray(out["image"])
        if ref_img is None:
            ref_img = img
        err = float(np.abs(img - ref_img).max())
        step = make_step(kw)
        g = step(means, colors, opacity, scales, rots)
        jax.block_until_ready(g)
        t0 = time.perf_counter()
        iters = 20
        for _ in range(iters):
            g = step(means, colors, opacity, scales, rots)
        jax.block_until_ready(g)
        dt = (time.perf_counter() - t0) / iters
        print(
            f"{name:20s} {dt*1e3:7.2f} ms/iter  {800*800/dt/1e6:6.1f} Mpix/s  "
            f"overflow={ov} maxerr={err:.2e}",
            flush=True,
        )


if __name__ == "__main__":
    main()
