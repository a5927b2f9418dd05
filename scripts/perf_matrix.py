"""THE rasterizer measurement harness: named experiments over one scene.

Consolidates the round-2/3 one-off probes (perf_r3{,b,c}, perf_probe,
perf_ops2, perf_sortprobe, perf_cumstages, perf_ab*, perf_stages,
perf_tiered — VERDICT r3 item 9) into one discoverable surface. Every
opt-in knob on main has a variant here, so "measure, then default-on or
delete" can run as one chip session.

Usage:
    python scripts/perf_matrix.py variants [name ...]   # end-to-end A/B
    python scripts/perf_matrix.py stages                # cumulative stages
    python scripts/perf_matrix.py fwd                   # forward-only A/B

Run ONE process at a time on the chip (memory: tpu-tunnel-wedge). Each
variant asserts zero overflow and checks image parity vs the default
before timing, so recorded numbers are for correct configurations only.
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

N = 100_000
SIZE = 800
MAX_PER_TILE = 640
ITERS = 20

# measured-best ladder for the bench scene's sorted-count curve (625 tiles)
LADDER = ((64, 640), (128, 512), (192, 384), (241, 256))
TIER4 = dict(max_tiles_per_gaussian=4, mid_cap=8192, mid_side=4)

# name -> (render kwargs, module flags {(module, attr): value})
VARIANTS = {
    "plain": (dict(), {}),
    "tier4": (dict(**TIER4), {}),
    "ladder": (dict(tile_ladder=LADDER), {}),
    "default": (dict(tile_ladder=LADDER, **TIER4), {}),  # bench.py default
    # round-4 chip A/Bs (decided & deleted): struct-bwd 33.8 ms, packed-sort
    # 25.4 ms (both regressions vs default 21.4); gm 21.3 ms (now the
    # unconditional ladder layout). Remaining live knobs:
    "default+bwd256": (
        dict(tile_ladder=LADDER, **TIER4),
        {("pallas_blend", "BWD_CHUNK"): 256},
    ),
    "default+bwd384": (
        dict(tile_ladder=LADDER, **TIER4),
        {("pallas_blend", "BWD_CHUNK"): 384},
    ),
}


def _mod(name):
    import riggs_tpu.render.binning as binning
    import riggs_tpu.render.pallas_blend as pallas_blend
    import riggs_tpu.render.tiles as tiles

    return {"binning": binning, "pallas_blend": pallas_blend, "tiles": tiles}[name]


def _set_flags(flags):
    saved = {}
    for (m, a), v in flags.items():
        saved[(m, a)] = getattr(_mod(m), a)
        setattr(_mod(m), a, v)
    return saved


def _scene():
    cam = make_camera(np.eye(3), np.array([0, 0, 2.5]), SIZE, SIZE, fovx=0.9, fovy=0.9)
    return cam, build_scene(N), jnp.zeros(3)


def timed(fn, *args, iters=ITERS, warmup=None):
    t0 = time.time()
    out = fn(*args)
    jax.block_until_ready(out)
    comp = time.time() - t0
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3, comp


def run_variants(names=None, fwd_only=False):
    from riggs_tpu.render.tiles import rasterize_tiled

    cam, (means, colors, opacity, scales, rots), bg = _scene()
    ref_img = None
    rows = []
    for name in names or VARIANTS:
        kw, flags = VARIANTS[name]
        saved = _set_flags(flags)
        try:
            out = _check_and_time(
                name, kw, rasterize_tiled, cam, means, colors, opacity, scales,
                rots, bg, ref_img, rows, fwd_only,
            )
            if ref_img is None:
                ref_img = out
        except AssertionError as e:  # record and keep measuring the rest
            print(f"{name:24s}: FAILED {e}", flush=True)
        finally:
            _set_flags(saved)
    return rows


def _check_and_time(name, kw, rasterize_tiled, cam, means, colors, opacity,
                    scales, rots, bg, ref_img, rows, fwd_only):
    """Parity-check one variant vs the reference image, then time it.

    Returns the variant's image (the first call establishes the reference).
    Raises AssertionError on overflow or divergence — caller records and
    continues with the remaining variants.
    """
    out = rasterize_tiled(
        cam, means, colors, opacity, scales, rots, bg,
        max_per_tile=MAX_PER_TILE, **kw,
    )
    ov = int(out["overflow"])
    assert ov == 0, f"overflow {ov} — not a valid timing config"
    img = np.asarray(out["image"])
    if ref_img is not None:
        err = float(np.abs(img - ref_img).max())
        assert err < 1e-3, f"image diverges from reference by {err}"

    if fwd_only:
        step = jax.jit(
            lambda m, c, o, s, r: rasterize_tiled(
                cam, m, c, o, s, r, bg, max_per_tile=MAX_PER_TILE, **kw
            )["image"]
        )
    else:
        def loss_fn(m, c, o, s, r):
            res = rasterize_tiled(
                cam, m, c, o, s, r, bg, max_per_tile=MAX_PER_TILE, **kw
            )
            return jnp.mean(res["image"])

        step = jax.jit(jax.grad(loss_fn, argnums=(0, 1, 2, 3, 4)))
    ms, comp = timed(step, means, colors, opacity, scales, rots)
    mpix = SIZE * SIZE / ms / 1e3
    print(f"{name:24s}: {ms:7.2f} ms  {mpix:6.1f} Mpix/s  (compile {comp:.0f}s)", flush=True)
    rows.append((name, ms))
    return img


def run_stages():
    """Cumulative pipeline prefixes; successive differences = stage costs."""
    from riggs_tpu.render.binning import bin_gaussians_sorted
    from riggs_tpu.render.project import build_cov3d_packed, project_gaussians
    from riggs_tpu.render.tiles import rasterize_tiled

    cam, (means, colors, opacity, scales, rots), bg = _scene()

    def s_proj(m, c, o, s, r):
        proj = project_gaussians(cam, m, build_cov3d_packed(s, r))
        return jnp.sum(proj.mean2d) + jnp.sum(proj.conic) + jnp.sum(proj.depth)

    def _bins(m, o, s, r):
        proj = project_gaussians(cam, m, build_cov3d_packed(s, r))
        op_cull = jax.lax.stop_gradient(jnp.where(proj.mask, o, 0.0))
        return proj, bin_gaussians_sorted(
            proj, SIZE, SIZE, max_per_tile=MAX_PER_TILE, opacity=op_cull, **TIER4
        )

    def s_bin(m, c, o, s, r):
        proj, bins = _bins(m, o, s, r)
        return jnp.sum(proj.depth) + jnp.sum(bins.idx) * 0.0 + jnp.sum(bins.count) * 0.0

    def s_gather(m, c, o, s, r):
        proj, bins = _bins(m, o, s, r)
        packed = jnp.concatenate(
            [proj.mean2d, proj.conic, jnp.where(proj.mask, o, 0.0)[:, None], c,
             proj.depth[:, None]], axis=-1,
        )
        return jnp.sum(packed[bins.idx])

    def s_full(m, c, o, s, r):
        out = rasterize_tiled(
            cam, m, c, o, s, r, bg, max_per_tile=MAX_PER_TILE,
            tile_ladder=LADDER, **TIER4,
        )
        return jnp.mean(out["image"])

    a = (means, colors, opacity, scales, rots)
    for tag, f in [("proj", s_proj), ("+binning", s_bin), ("+gather", s_gather),
                   ("full (default)", s_full)]:
        ms, comp = timed(jax.jit(jax.grad(f, argnums=(0, 1, 2, 3, 4))), *a)
        print(f"{tag:24s}: {ms:7.2f} ms fwd+bwd  (compile {comp:.0f}s)", flush=True)


def main():
    what = sys.argv[1] if len(sys.argv) > 1 else "variants"
    if what == "variants":
        run_variants(sys.argv[2:] or None)
    elif what == "fwd":
        run_variants(sys.argv[2:] or None, fwd_only=True)
    elif what == "stages":
        run_stages()
    else:
        raise SystemExit(f"unknown experiment {what!r}; use variants|fwd|stages")


if __name__ == "__main__":
    main()
