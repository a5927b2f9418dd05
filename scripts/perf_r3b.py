"""Round-3 on-chip A/B, part 2: kernel knobs on top of tier4+ladder.

Base config = tiered enumeration (2x2 primary + mid 8192x4x4 + giant) with
count-adaptive ladder windows. Variants toggle: bf16-split MXU matmuls,
packed sort, tighter ladders. Also isolates the binning+gather+scatter-add
cost (no blend kernel). Run alone on the chip (memory: tpu-tunnel-wedge).

Measured 2026-08-19 (first run): base t4+lad4(m1.3) 25.26 ms, fwd-only
12.61 ms, bwd-chunk-256 26.07 ms (regression — dropped).
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
import riggs_tpu.render.binning as bn
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
    lad6t = make_tile_ladder(counts, n_buckets=6, margin=1.05)
    print(f"ladder4 rows={sum(n*c for n,c in lad4)} {lad4}", flush=True)
    print(f"ladder6t rows={sum(n*c for n,c in lad6t)} {lad6t}", flush=True)

    def make_step(kw, fwd_only=False):
        def loss_fn(means, colors, opacity, scales, rots):
            out = rasterize_tiled(
                cam, means, colors, opacity, scales, rots, bg, max_per_tile=640, **kw
            )
            return jnp.mean(out["image"]) + jnp.mean(out["depth"]) * 0.0

        if fwd_only:
            return jax.jit(loss_fn)
        return jax.jit(jax.grad(loss_fn, argnums=(0, 1, 2, 3, 4)))

    def gather_probe(fwd_only=False):
        # binning + window extraction + packed gather (fwd + scatter-add bwd),
        # no blend kernel — isolates the non-kernel pipeline cost
        from riggs_tpu.render.binning import bin_gaussians_sorted, _extract_windows
        from riggs_tpu.render.project import build_cov3d_packed, project_gaussians

        def f(means, colors, opacity, scales, rots):
            cov3d = build_cov3d_packed(scales, rots)
            proj = project_gaussians(cam, means, cov3d)
            opc = jax.lax.stop_gradient(jnp.where(proj.mask, opacity, 0.0))
            bins = bin_gaussians_sorted(
                proj, 800, 800, max_per_tile=640, opacity=opc, **TIER4
            )
            packed = jnp.concatenate(
                [proj.mean2d, proj.conic,
                 jnp.where(proj.mask, opacity, 0.0)[:, None], colors,
                 proj.depth[:, None]], axis=-1)
            tot = jnp.zeros((), jnp.float32)
            gid_pad = jnp.pad(bins.gid_sorted, (0, 640))
            ordr = jnp.argsort(-bins.count).astype(jnp.int32)
            r0 = 0
            for nb, cap in lad4:
                if cap == 0:
                    r0 += nb
                    continue
                tids_b = ordr[r0:r0 + nb]
                win = _extract_windows(gid_pad, bins.starts[tids_b], cap)
                valid_b = (jnp.arange(cap, dtype=jnp.int32)[None, :]
                           < jnp.minimum(bins.count[tids_b], cap)[:, None])
                g_b = packed[jnp.where(valid_b, win, 0)]
                tot += jnp.sum(jnp.where(valid_b[..., None], g_b, 0.0))
                r0 += nb
            return tot

        if fwd_only:
            return jax.jit(f)
        return jax.jit(jax.grad(f, argnums=(0, 1, 2, 3, 4)))

    variants = [
        ("base t4+lad4", dict(tile_ladder=lad4, **TIER4), {}),
        ("mxu-split2", dict(tile_ladder=lad4, **TIER4), {"split": True}),
        ("packed-sort", dict(tile_ladder=lad4, **TIER4), {"packed": True}),
        ("ladder6-m1.05", dict(tile_ladder=lad6t, **TIER4), {}),
        ("all3", dict(tile_ladder=lad6t, **TIER4), {"split": True, "packed": True}),
        ("gather-fwd", None, {"gather": True, "fwd_only": True}),
        ("gather-fwd+bwd", None, {"gather": True}),
    ]

    ref = None
    for name, kw, opts in variants:
        pb.MXU_SPLIT2 = opts.get("split", False)
        bn.SORT_PACKED = opts.get("packed", False)
        try:
            if opts.get("gather"):
                step = gather_probe(fwd_only=opts.get("fwd_only", False))
                args = (means, colors, opacity, scales, rots)
                g = step(*args)
                jax.block_until_ready(g)
                t0 = time.perf_counter()
                for _ in range(20):
                    g = step(*args)
                jax.block_until_ready(g)
                dt = (time.perf_counter() - t0) / 20
                print(f"{name:16s} {dt*1e3:7.2f} ms/iter", flush=True)
                continue
            out = rasterize_tiled(
                cam, means, colors, opacity, scales, rots, bg, max_per_tile=640, **kw
            )
            ov = int(out["overflow"])
            img = np.asarray(out["image"])
            if ref is None:
                ref = img
            err = float(np.abs(img - ref).max())
            step = make_step(kw, fwd_only=opts.get("fwd_only", False))
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
        finally:
            pb.MXU_SPLIT2 = False
            bn.SORT_PACKED = False


if __name__ == "__main__":
    main()
