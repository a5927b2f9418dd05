"""Cumulative-stage decomposition of the fwd+bwd rasterizer cost.

Each program extends the previous by one pipeline stage; successive
differences give per-stage costs (incl. their backward where applicable)
without cross-process comparison hazards. Run alone on the chip.
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
from riggs_tpu.render.binning import bin_gaussians_sorted, bin_gaussians_runs
from riggs_tpu.render.project import build_cov3d_packed, project_gaussians
from riggs_tpu.render.tiles import rasterize_tiled

N = 100_000
MAX = 1024
SIZE = 800
cam = make_camera(np.eye(3), np.array([0, 0, 2.5]), SIZE, SIZE, fovx=0.9, fovy=0.9)
means, colors, opacity, scales, rots = build_scene(N)
bg = jnp.zeros(3)


def timed(tag, f, *a):
    t0 = time.time()
    out = f(*a)
    jax.block_until_ready(out)
    comp = time.time() - t0
    t0 = time.perf_counter()
    for _ in range(20):
        out = f(*a)
    jax.block_until_ready(out)
    ms = (time.perf_counter() - t0) / 20 * 1e3
    print(f"{tag:28s}: {ms:7.2f} ms  (compile {comp:.0f}s)", flush=True)
    return ms


def grad_of(fn):
    return jax.jit(jax.grad(fn, argnums=(0, 1, 2, 3, 4)))


def s_proj(m, c, o, s, r):
    proj = project_gaussians(cam, m, build_cov3d_packed(s, r))
    return jnp.sum(proj.mean2d) + jnp.sum(proj.conic) + jnp.sum(proj.depth)


def _bins(m, s, r, binning):
    proj = project_gaussians(cam, m, build_cov3d_packed(s, r))
    fn = bin_gaussians_sorted if binning == "sort" else bin_gaussians_runs
    return proj, fn(proj, SIZE, SIZE, max_per_tile=MAX)


def s_bin(m, c, o, s, r, binning="sort"):
    proj, bins = _bins(m, s, r, binning)
    extra = jnp.sum(bins.idx) if bins.idx is not None else jnp.sum(bins.runs.gid)
    # consume binning outputs + keep proj grads flowing
    return jnp.sum(proj.mean2d) * 0.0 + jnp.sum(proj.conic) * 0.0 + extra * 0.0 + jnp.sum(
        proj.depth
    ) + jnp.sum(bins.count) * 0.0


def s_gather(m, c, o, s, r, binning="sort"):
    proj, bins = _bins(m, s, r, binning)
    packed = jnp.concatenate(
        [proj.mean2d, proj.conic, jnp.where(proj.mask, o, 0.0)[:, None], c, proj.depth[:, None]],
        axis=-1,
    )
    if binning == "sort":
        g = packed[bins.idx]  # (T, MAX, 10) + XLA scatter-add backward
        return jnp.sum(g)
    packed_z = jnp.concatenate([packed, jnp.zeros((1, 10))], axis=0)
    attrs = packed_z[bins.runs.gid]
    return jnp.sum(attrs)


def s_full(m, c, o, s, r, binning="sort"):
    out = rasterize_tiled(cam, m, c, o, s, r, bg, max_per_tile=MAX, binning=binning)
    return jnp.mean(out["image"])


def main():
    a = (means, colors, opacity, scales, rots)
    timed("proj fwd+bwd", grad_of(s_proj), *a)
    for binning in ("sort",):
        timed(f"{binning}: +binning fwd+bwd", grad_of(lambda *x: s_bin(*x, binning=binning)), *a)
        timed(f"{binning}: +gather fwd+bwd", grad_of(lambda *x: s_gather(*x, binning=binning)), *a)
        timed(f"{binning}: full fwd+bwd", grad_of(lambda *x: s_full(*x, binning=binning)), *a)


if __name__ == "__main__":
    main()
