"""On-chip microbenchmarks for rasterizer optimization candidates (round 2).

Compiles through axon are slow (~1-2 min/program), so run this in the
background and let the persistent cache absorb repeats.

Usage: python scripts/perf_probe.py [probe ...]   (default: all)
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = 100_000
T = 625  # 25x25 tiles at 800^2 / 32
MAX = 1024
K16 = 16
P = 1024
G = 128


def timed(fn, *args, iters=20, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3  # ms


def report(name, fn, *args, **kw):
    try:
        t = timed(fn, *args, **kw)
        print(f"{name}: {t:.2f} ms", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"{name}: FAILED {type(e).__name__}: {str(e)[:160]}", flush=True)


def probe_sort():
    rng = np.random.default_rng(0)
    M = N * K16
    key32 = jnp.asarray(rng.integers(0, 1 << 30, size=(M,), dtype=np.int32))
    key64 = jnp.asarray(rng.integers(0, 1 << 40, size=(M,), dtype=np.int64))
    tile_id = jnp.asarray(rng.integers(0, T + 1, size=(M,), dtype=np.int32))
    depth = jnp.asarray(rng.uniform(0.1, 10.0, size=(M,)).astype(np.float32))
    gid = jnp.arange(M, dtype=jnp.int32) % N

    report("sort int32 1.6M (no payload)", jax.jit(jnp.sort), key32)
    report("sort_key_val i32/i32 1.6M", jax.jit(jax.lax.sort_key_val), key32, gid)
    report("sort_key_val i64/i32 1.6M", jax.jit(jax.lax.sort_key_val), key64, gid)
    report(
        "lax.sort 2key(i32,f32)+payload 1.6M",
        jax.jit(lambda t, d, g: jax.lax.sort((t, d, g), num_keys=2)),
        tile_id, depth, gid,
    )
    # packed single key: tile*2^22 | depth-rank-ish (quantized depth)
    report(
        "pack key (tile<<22|dq) + sort_key_val",
        jax.jit(
            lambda t, d, g: jax.lax.sort_key_val(
                t * (1 << 22) + jnp.clip((d * 400000.0).astype(jnp.int32), 0, (1 << 22) - 1), g
            )
        ),
        tile_id, depth, gid,
    )
    # 64-bit packed: tile<<32 | depth-bits
    report(
        "pack key64 (tile<<32|bits) + sort_key_val",
        jax.jit(
            lambda t, d, g: jax.lax.sort_key_val(
                t.astype(jnp.int64) * (1 << 32)
                + jax.lax.bitcast_convert_type(d, jnp.int32).astype(jnp.int64),
                g,
            )
        ),
        tile_id, depth, gid,
    )


def probe_binning():
    from riggs_tpu.camera import make_camera
    from riggs_tpu.render.project import project_gaussians, build_cov3d_packed
    from riggs_tpu.render.binning import bin_gaussians_sorted
    from bench import build_scene

    cam = make_camera(np.eye(3), np.array([0, 0, 2.5]), 800, 800, fovx=0.9, fovy=0.9)
    means, colors, opacity, scales, rots = build_scene(N)
    projf = jax.jit(lambda m, s, r: project_gaussians(cam, m, build_cov3d_packed(s, r)))
    proj = projf(means, scales, rots)
    report("project", projf, means, scales, rots)
    binf = jax.jit(partial(bin_gaussians_sorted, width=800, height=800, max_per_tile=MAX))
    bins = binf(proj)
    report("binning v2 full", binf, proj)
    n_inst = int(jnp.sum(bins.count))
    print(f"  (true instances: {n_inst}, overflow cells: {int(bins.overflow)})")

    # decompose: instance generation only
    def instgen(proj):
        from riggs_tpu.render.binning import _rects, num_tiles
        tx_n, ty_n = num_tiles(800, 800)
        lox, loy, hix, hiy = _rects(proj, tx_n, ty_n, 32)
        w_rect = hix - lox + 1
        h_rect = hiy - loy + 1
        ks = jnp.arange(16, dtype=jnp.int32)
        dx = (ks % 4)[None, :]
        dy = (ks // 4)[None, :]
        tx = lox[:, None] + dx
        ty = loy[:, None] + dy
        cell_ok = proj.mask[:, None] & (dx < w_rect[:, None]) & (dy < h_rect[:, None])
        tile_id = jnp.where(cell_ok, ty * tx_n + tx, tx_n * ty_n).reshape(-1)
        depth = jnp.broadcast_to(proj.depth[:, None], (N, 16)).reshape(-1)
        gid = jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32)[:, None], (N, 16)).reshape(-1)
        return tile_id, depth, gid

    instf = jax.jit(instgen)
    tile_id, depth, gid = instf(proj)
    report("  instance gen", instf, proj)
    sortf = jax.jit(lambda t, d, g: jax.lax.sort((t, d, g), num_keys=2))
    ts, _, gs = sortf(tile_id, depth, gid)
    report("  3-op sort", sortf, tile_id, depth, gid)

    def windows(ts, gs):
        tids = jnp.arange(T, dtype=jnp.int32)
        starts = jnp.searchsorted(ts, tids)
        ends = jnp.searchsorted(ts, tids + 1)
        count = (ends - starts).astype(jnp.int32)
        s = jnp.arange(MAX, dtype=jnp.int32)[None, :]
        gather_pos = jnp.minimum(starts[:, None] + s, ts.shape[0] - 1)
        valid = s < jnp.minimum(count, MAX)[:, None]
        return jnp.where(valid, gs[gather_pos], 0), valid, count

    winf = jax.jit(windows)
    _ = winf(ts, gs)
    report("  window extract", winf, ts, gs)


def probe_gather():
    rng = np.random.default_rng(0)
    packed = jnp.asarray(rng.normal(size=(N, 16)).astype(np.float32))
    didx = jnp.asarray(rng.integers(0, N, size=(T, MAX), dtype=np.int32))
    dg = jnp.asarray(rng.normal(size=(T, MAX, 16)).astype(np.float32))
    dgT = jnp.asarray(rng.normal(size=(T, 16, MAX)).astype(np.float32))

    report("gather (T,MAX,16)", jax.jit(lambda p, d: p[d]), packed, didx)
    report(
        "gather+transpose (T,16,MAX)",
        jax.jit(lambda p, d: jnp.transpose(p[d], (0, 2, 1))), packed, didx,
    )
    report(
        "transpose only (T,MAX,16)->(T,16,MAX)",
        jax.jit(lambda g: jnp.transpose(g, (0, 2, 1))), dg,
    )
    report(
        "scatter-ADD 640k rows",
        jax.jit(lambda g, d: jnp.zeros((N, 16)).at[d.reshape(-1)].add(g.reshape(-1, 16))),
        dg, didx,
    )
    report(
        "scatter-ADD from (T,16,MAX) layout",
        jax.jit(
            lambda g, d: jnp.zeros((N, 16)).at[d.reshape(-1)].add(
                jnp.transpose(g, (0, 2, 1)).reshape(-1, 16)
            )
        ),
        dgT, didx,
    )
    dest = jnp.asarray(rng.permutation(N * K16)[: T * MAX].astype(np.int32))
    report(
        "scatter-SET unique + reduce",
        jax.jit(
            lambda g, d: jnp.zeros((N * K16, 16)).at[d].set(g.reshape(-1, 16), mode="drop")
            .reshape(N, K16, 16).sum(1)
        ),
        dg, dest,
    )
    # gather backward the way XLA transposes it
    report(
        "gather VJP (XLA transpose)",
        jax.jit(lambda p, d, g: jax.vjp(lambda pp: pp[d], p)[1](g)[0]),
        packed, didx, dg,
    )


def _run_grid_kernel(kernel, steps):
    return jax.jit(
        lambda a: pl.pallas_call(
            kernel,
            grid=(steps,),
            in_specs=[pl.BlockSpec((1, G, P), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, G, P), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((steps, G, P), jnp.float32),
        )(a)
    )


def probe_kernel_cumsum():
    steps = 5000  # ~tiles*chunks of the real workload

    def tri(x_ref, o_ref):
        x = x_ref[0]
        r = jax.lax.broadcasted_iota(jnp.int32, (G, G), 0)
        c = jax.lax.broadcasted_iota(jnp.int32, (G, G), 1)
        L = (c <= r).astype(jnp.float32)
        o_ref[0] = jnp.dot(L, x, preferred_element_type=jnp.float32)

    def cum(x_ref, o_ref):
        o_ref[0] = jnp.cumsum(x_ref[0], axis=0)

    def roll(x_ref, o_ref):
        x = x_ref[0]
        s = 1
        while s < G:
            rolled = pltpu.roll(x, shift=s, axis=0)
            row = jax.lax.broadcasted_iota(jnp.int32, (G, P), 0)
            x = jnp.where(row >= s, x + rolled, x)
            s *= 2
        o_ref[0] = x

    x = jnp.asarray(np.random.default_rng(0).normal(size=(steps, G, P)).astype(np.float32))
    for name, kern in [("tri-matmul", tri), ("jnp.cumsum", cum), ("roll-scan", roll)]:
        report(f"kernel cumsum[{name}] x{steps}", _run_grid_kernel(kern, steps), x, iters=10)


def _real_tile_inputs():
    """Realistic (g_packed, counts) from the bench scene's actual binning."""
    from riggs_tpu.camera import make_camera
    from riggs_tpu.render.project import project_gaussians, build_cov3d_packed
    from riggs_tpu.render.binning import bin_gaussians_sorted
    from bench import build_scene

    cam = make_camera(np.eye(3), np.array([0, 0, 2.5]), 800, 800, fovx=0.9, fovy=0.9)
    means, colors, opacity, scales, rots = build_scene(N)

    @jax.jit
    def prep(means, colors, opacity, scales, rots):
        proj = project_gaussians(cam, means, build_cov3d_packed(scales, rots))
        bins = bin_gaussians_sorted(proj, 800, 800, max_per_tile=MAX)
        packed = jnp.concatenate(
            [proj.mean2d, proj.conic,
             jnp.where(proj.mask, opacity, 0.0)[:, None], colors, proj.depth[:, None],
             jnp.zeros((N, 6))], axis=-1)
        g = jnp.transpose(packed[bins.idx], (0, 2, 1))
        g = g.at[:, 5, :].set(jnp.where(bins.valid, g[:, 5, :], 0.0))
        return g, jnp.minimum(bins.count, MAX).astype(jnp.int32)

    return prep(means, colors, opacity, scales, rots)


def probe_blend():
    import riggs_tpu.render.pallas_blend as PB

    gp, counts = _real_tile_inputs()
    print(f"  (counts: mean {float(jnp.mean(counts)):.0f}, max {int(jnp.max(counts))})")

    def tri_cumsum(x):
        g = x.shape[0]
        r = jax.lax.broadcasted_iota(jnp.int32, (g, g), 0)
        c = jax.lax.broadcasted_iota(jnp.int32, (g, g), 1)
        L = (c <= r).astype(jnp.float32)
        return jnp.dot(L, x, preferred_element_type=jnp.float32)

    roll_cumsum = PB._cumsum_sublanes
    for name, impl in [("roll", roll_cumsum), ("tri-mxu", tri_cumsum)]:
        PB._cumsum_sublanes = impl
        fwd = jax.jit(lambda g, c: PB.pallas_blend(g, c, 25, False))
        report(f"blend[{name}] fwd (real counts)", fwd, gp, counts)
        bwd = jax.jit(jax.grad(lambda g, c: jnp.sum(PB.pallas_blend(g, c, 25, False)), argnums=0))
        report(f"blend[{name}] fwd+bwd (real counts)", bwd, gp, counts)
    PB._cumsum_sublanes = roll_cumsum


def probe_full():
    from riggs_tpu.camera import make_camera
    from riggs_tpu.render.tiles import rasterize_tiled
    from bench import build_scene

    cam = make_camera(np.eye(3), np.array([0, 0, 2.5]), 800, 800, fovx=0.9, fovy=0.9)
    means, colors, opacity, scales, rots = build_scene(N)
    bg = jnp.zeros(3)

    def full(means, colors, opacity, scales, rots):
        out = rasterize_tiled(cam, means, colors, opacity, scales, rots, bg, max_per_tile=MAX)
        return jnp.mean(out["image"])

    report("full fwd", jax.jit(full), means, colors, opacity, scales, rots)
    report(
        "full fwd+bwd",
        jax.jit(jax.grad(full, argnums=(0, 1, 2, 3, 4))),
        means, colors, opacity, scales, rots,
    )


PROBES = {
    "sort": probe_sort,
    "binning": probe_binning,
    "gather": probe_gather,
    "cumsum": probe_kernel_cumsum,
    "blend": probe_blend,
    "full": probe_full,
}

if __name__ == "__main__":
    names = sys.argv[1:] or list(PROBES)
    for n in names:
        print(f"== {n} ==", flush=True)
        try:
            PROBES[n]()
        except Exception as e:  # noqa: BLE001
            print(f"probe {n} failed: {type(e).__name__}: {str(e)[:300]}", flush=True)
