"""Round-3 on-chip A/B, part 3: backward-kernel knobs on top of tier4+ladder.

Variants: BWD_MOMENTS_MXU (six gradient moments as one (G,P)@(P,6) MXU
matmul against the constant tile-local monomial basis), G_CHUNK 64 (halve
padded-row waste for low-count tiles at 2x grid steps), and combinations
with MXU_SPLIT2. Run alone on the chip (memory: tpu-tunnel-wedge).

Measured 2026-08-19: moments 26.42 ms / moments+split2 23.47 ms — a small
regression vs split2 alone (23.01, perf_r3b), so BWD_MOMENTS_MXU was
REMOVED from pallas_blend; G_CHUNK=64 is illegal (Mosaic requires lane
block dims divisible by 128); base fwd-only 12.67 ms. The moments/gchunk
variants below are kept for the record and now no-op/fail cleanly.
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
import riggs_tpu.render.pallas_blend as pb
from riggs_tpu.render.ladder import make_tile_ladder
from riggs_tpu.render.tiles import rasterize_tiled

TIER4 = dict(max_tiles_per_gaussian=4, mid_cap=8192, mid_side=4)


def main():
    cam = make_camera(np.eye(3), np.array([0, 0, 2.5]), 800, 800, fovx=0.9, fovy=0.9)
    means, colors, opacity, scales, rots = build_scene(100_000)
    bg = jnp.zeros(3)

    probe = rasterize_tiled(
        cam, means, colors, opacity, scales, rots, bg, max_per_tile=640, **TIER4
    )
    counts = np.asarray(probe["tile_counts"])
    lad4 = make_tile_ladder(counts, n_buckets=4, margin=1.3)
    kw = dict(tile_ladder=lad4, **TIER4)

    def make_step(fwd_only=False):
        def loss_fn(means, colors, opacity, scales, rots):
            out = rasterize_tiled(
                cam, means, colors, opacity, scales, rots, bg, max_per_tile=640, **kw
            )
            return jnp.mean(out["image"]) + jnp.mean(out["depth"]) * 0.0

        if fwd_only:
            return jax.jit(loss_fn)
        return jax.jit(jax.grad(loss_fn, argnums=(0, 1, 2, 3, 4)))

    variants = [
        ("base t4+lad4", {}),
        ("moments", {"moments": True}),
        ("moments+split2", {"moments": True, "split": True}),
        ("gchunk64", {"gchunk": 64}),
        ("moments+gc64", {"moments": True, "gchunk": 64}),
        ("gc64 fwd-only", {"gchunk": 64, "fwd_only": True}),
        ("base fwd-only", {"fwd_only": True}),
    ]

    ref = None
    g0 = (pb.G_CHUNK, pb.BWD_CHUNK)
    for name, opts in variants:
        pb.BWD_MOMENTS_MXU = opts.get("moments", False)
        pb.MXU_SPLIT2 = opts.get("split", False)
        if "gchunk" in opts:
            pb.G_CHUNK = pb.BWD_CHUNK = opts["gchunk"]
        try:
            out = rasterize_tiled(
                cam, means, colors, opacity, scales, rots, bg, max_per_tile=640, **kw
            )
            ov = int(out["overflow"])
            img = np.asarray(out["image"])
            if ref is None:
                ref = img
            err = float(np.abs(img - ref).max())
            step = make_step(fwd_only=opts.get("fwd_only", False))
            g = step(means, colors, opacity, scales, rots)
            jax.block_until_ready(g)
            t0 = time.perf_counter()
            for _ in range(20):
                g = step(means, colors, opacity, scales, rots)
            jax.block_until_ready(g)
            dt = (time.perf_counter() - t0) / 20
            print(
                f"{name:16s} {dt*1e3:7.2f} ms/iter  {800*800/dt/1e6:6.1f} Mpix/s  "
                f"overflow={ov} maxerr={err:.2e}",
                flush=True,
            )
        except Exception as e:  # keep later variants measurable
            print(f"{name:16s} FAILED: {type(e).__name__}: {str(e)[:200]}", flush=True)
        finally:
            pb.BWD_MOMENTS_MXU = False
            pb.MXU_SPLIT2 = False
            pb.G_CHUNK, pb.BWD_CHUNK = g0


if __name__ == "__main__":
    main()
