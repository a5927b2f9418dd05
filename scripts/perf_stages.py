"""One-process clean stage benchmark of the rasterizer (run alone on the chip).

Measures every pipeline stage plus the end-to-end bench number sequentially,
so stage times are comparable and not poisoned by concurrent processes.
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

from riggs_tpu.camera import make_camera
from riggs_tpu.render.project import project_gaussians, build_cov3d_packed
from riggs_tpu.render.binning import bin_gaussians_sorted
from riggs_tpu.render.tiles import rasterize_tiled
from bench import build_scene

N = 100_000
MAX = 1024


def timed(fn, *a, iters=20):
    t0 = time.time()
    out = fn(*a)
    jax.block_until_ready(out)
    compile_s = time.time() - t0
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*a)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3, compile_s


def report(name, fn, *a, **kw):
    try:
        ms, comp = timed(fn, *a, **kw)
        print(f"{name}: {ms:.2f} ms   (compile {comp:.0f}s)", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)


def main():
    cam = make_camera(np.eye(3), np.array([0, 0, 2.5]), 800, 800, fovx=0.9, fovy=0.9)
    means, colors, opacity, scales, rots = build_scene(N)
    bg = jnp.zeros(3)

    projf = jax.jit(lambda m, s, r: project_gaussians(cam, m, build_cov3d_packed(s, r)))
    proj = projf(means, scales, rots)
    report("project", projf, means, scales, rots)

    binf = jax.jit(partial(bin_gaussians_sorted, width=800, height=800, max_per_tile=MAX))
    bins = binf(proj)
    print(f"  instances={int(jnp.sum(bins.count))} overflow_rect={int(bins.overflow)}")
    report("binning", binf, proj)

    packed = jnp.concatenate(
        [proj.mean2d, proj.conic, jnp.where(proj.mask, opacity, 0.0)[:, None],
         colors, proj.depth[:, None], jnp.zeros((N, 6))], axis=-1)
    gf = jax.jit(lambda p, d: jnp.transpose(p[d], (0, 2, 1)))
    gp = gf(packed, bins.idx)
    report("gather+transpose", gf, packed, bins.idx)

    import riggs_tpu.render.pallas_blend as PB

    counts = jnp.minimum(bins.count, MAX).astype(jnp.int32)
    gpm = gp.at[:, 5, :].set(jnp.where(bins.valid, gp[:, 5, :], 0.0))
    fwd = jax.jit(lambda g, c: PB.pallas_blend(g, c, 25, False))
    report("pallas fwd (real counts)", fwd, gpm, counts)
    fb = jax.jit(jax.grad(lambda g, c: jnp.sum(PB.pallas_blend(g, c, 25, False)), argnums=0))
    report("pallas fwd+bwd (real counts)", fb, gpm, counts)

    dg = jnp.ones_like(gp)
    sc = jax.jit(
        lambda g, d: jnp.zeros((N, 16)).at[d.reshape(-1)].add(
            jnp.transpose(g, (0, 2, 1)).reshape(-1, 16)
        )
    )
    report("scatter-add bwd-of-gather", sc, dg, bins.idx)

    def full(means, colors, opacity, scales, rots):
        out = rasterize_tiled(cam, means, colors, opacity, scales, rots, bg, max_per_tile=MAX)
        return jnp.mean(out["image"])

    report("FULL fwd", jax.jit(full), means, colors, opacity, scales, rots)
    gradf = jax.jit(jax.grad(full, argnums=(0, 1, 2, 3, 4)))
    ms, comp = timed(gradf, means, colors, opacity, scales, rots)
    mpix = 800 * 800 / (ms / 1e3) / 1e6
    print(f"FULL fwd+bwd: {ms:.2f} ms = {mpix:.1f} Mpix/s (vs 64 baseline: {mpix/64:.3f})  (compile {comp:.0f}s)")


if __name__ == "__main__":
    main()
