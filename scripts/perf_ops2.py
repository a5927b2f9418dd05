"""In-pipeline primitive costs for the gather/scatter redesign.

Each program = proj baseline + ONE candidate primitive with real data
dependence (consumed via a non-constant-foldable sum). Differences vs the
baseline give the primitive's cost. One process, run alone on the chip.
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
from riggs_tpu.render.binning import _rects, _extract_windows, num_tiles, TILE
from riggs_tpu.render.project import build_cov3d_packed, project_gaussians

N = 100_000
MAX = 1024
SIZE = 800
K = 16
cam = make_camera(np.eye(3), np.array([0, 0, 2.5]), SIZE, SIZE, fovx=0.9, fovy=0.9)
means, colors, opacity, scales, rots = build_scene(N)


def pre(m, c, o, s, r):
    """Everything up to the instance enumeration (shared prologue)."""
    proj = project_gaussians(cam, m, build_cov3d_packed(s, r))
    tx_n, ty_n = num_tiles(SIZE, SIZE, TILE)
    T = tx_n * ty_n
    lox, loy, hix, hiy = _rects(proj, tx_n, ty_n, TILE)
    w_rect = hix - lox + 1
    h_rect = hiy - loy + 1
    side = 4
    ks = jnp.arange(K, dtype=jnp.int32)
    dx = (ks % side)[:, None]
    dy = (ks // side)[:, None]
    tx = lox[None, :] + dx
    ty = loy[None, :] + dy
    cell_ok = proj.mask[None, :] & (dx < w_rect[None, :]) & (dy < h_rect[None, :])
    tile_id = jnp.where(cell_ok, ty * tx_n + tx, T).reshape(-1)
    depth = jnp.broadcast_to(proj.depth[None, :], (K, N)).reshape(-1)
    gid = jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32)[None, :], (K, N)).reshape(-1)
    packed = jnp.concatenate(
        [proj.mean2d, proj.conic, jnp.where(proj.mask, o, 0.0)[:, None], c, proj.depth[:, None]],
        axis=-1,
    )
    return proj, tile_id, depth, gid, packed, T


def consume(*xs):
    return sum(jnp.sum(x.astype(jnp.float32)) * 1e-12 for x in xs)


def p_base(m, c, o, s, r):
    proj, tile_id, depth, gid, packed, T = pre(m, c, o, s, r)
    return consume(tile_id, depth, gid, packed)


def p_sort3(m, c, o, s, r):
    proj, tile_id, depth, gid, packed, T = pre(m, c, o, s, r)
    a, b, g = jax.lax.sort((tile_id, depth, gid), num_keys=2)
    return consume(a, b, g, packed)


def p_sort13(m, c, o, s, r):
    proj, tile_id, depth, gid, packed, T = pre(m, c, o, s, r)
    cols = [jnp.broadcast_to(packed[None, :, i], (K, N)).reshape(-1) for i in range(10)]
    out = jax.lax.sort((tile_id, depth, gid, *cols), num_keys=2)
    return consume(*out)


def p_gather_win(m, c, o, s, r):
    proj, tile_id, depth, gid, packed, T = pre(m, c, o, s, r)
    _, _, gs_ = jax.lax.sort((tile_id, depth, gid), num_keys=2)
    starts = jnp.searchsorted(jnp.sort(tile_id), jnp.arange(T, dtype=jnp.int32)).astype(jnp.int32)
    win = _extract_windows(jnp.pad(gs_, (0, MAX)), starts, MAX)
    g = packed[win]  # (T, MAX, 10) random row gather
    return consume(g)


def p_winx10(m, c, o, s, r):
    proj, tile_id, depth, gid, packed, T = pre(m, c, o, s, r)
    cols = [jnp.broadcast_to(packed[None, :, i], (K, N)).reshape(-1) for i in range(10)]
    out = jax.lax.sort((tile_id, depth, gid, *cols), num_keys=2)
    starts = jnp.searchsorted(out[0], jnp.arange(T, dtype=jnp.int32)).astype(jnp.int32)
    wins = [_extract_windows(jnp.pad(col, (0, MAX)), starts, MAX) for col in out[3:]]
    g16 = jnp.stack(wins + [jnp.zeros_like(wins[0])] * 6, axis=1)  # (T, 16, MAX)
    return consume(g16)


def p_scatter_add(m, c, o, s, r):
    proj, tile_id, depth, gid, packed, T = pre(m, c, o, s, r)
    _, _, gs_ = jax.lax.sort((tile_id, depth, gid), num_keys=2)
    starts = jnp.searchsorted(jnp.sort(tile_id), jnp.arange(T, dtype=jnp.int32)).astype(jnp.int32)
    win = _extract_windows(jnp.pad(gs_, (0, MAX)), starts, MAX)
    dg = jnp.broadcast_to(depth[: T * MAX, None], (T * MAX, 10)) * 1e-6  # fake cotangent
    dp = jnp.zeros((N, 10)).at[win.reshape(-1)].add(dg)
    return consume(dp)


def p_sort11_bwd(m, c, o, s, r):
    proj, tile_id, depth, gid, packed, T = pre(m, c, o, s, r)
    dg = [jnp.broadcast_to(depth[: T * MAX], (T * MAX,)) * 1e-6 for _ in range(10)]
    key = jnp.broadcast_to(gid[: T * MAX], (T * MAX,))
    out = jax.lax.sort((key, *dg), num_keys=1)
    return consume(*out)


def p_cumsum_seg(m, c, o, s, r):
    proj, tile_id, depth, gid, packed, T = pre(m, c, o, s, r)
    rows = jnp.stack([jnp.broadcast_to(depth[: T * MAX], (T * MAX,)) * 1e-6] * 10, -1)
    cs = jnp.cumsum(rows, axis=0)
    b = jnp.searchsorted(jnp.sort(gid[: T * MAX]), jnp.arange(N, dtype=jnp.int32)).astype(jnp.int32)
    seg = cs[jnp.clip(b + 1, 0, T * MAX - 1)] - cs[b]
    return consume(seg)


def main():
    progs = [
        ("base(proj+enum)", p_base),
        ("+sort 3op 1.6M", p_sort3),
        ("+sort 13op 1.6M", p_sort13),
        ("+win+rowgather 640k (cur fwd)", p_gather_win),
        ("+13op sort+win x10+stack", p_winx10),
        ("+scatter-add 640k->N (cur bwd)", p_scatter_add),
        ("+sort 11op 640k (bwd cand)", p_sort11_bwd),
        ("+cumsum-seg 640k (bwd cand)", p_cumsum_seg),
    ]
    a = (means, colors, opacity, scales, rots)
    for tag, f in progs:
        fj = jax.jit(f)
        t0 = time.time()
        out = fj(*a)
        jax.block_until_ready(out)
        comp = time.time() - t0
        t0 = time.perf_counter()
        for _ in range(20):
            out = fj(*a)
        jax.block_until_ready(out)
        ms = (time.perf_counter() - t0) / 20 * 1e3
        print(f"{tag:32s}: {ms:7.2f} ms  (compile {comp:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
