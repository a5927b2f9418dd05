"""Decisive sort/gather/scatter measurements on REAL binning data, one process.

Answers, with inputs materialized on device before timing (nothing foldable):
  1. single-op int32 sort vs 2-op vs 3-op at 1.6M (the binning sort choice)
  2. argsort cost at N=100k (depth pre-sort for the v3 single-key scheme)
  3. searchsorted 1.6M->1.6M, flat permutation scatter (backward-path options)
  4. scatter-add rows (current gather-backward) vs masked (K,N) row gather
Run alone on the chip (memory: stray processes poison timings 100x).
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
from riggs_tpu.render.binning import _rects, num_tiles, TILE
from bench import build_scene

N = 100_000
K = 16
MAX = 1024


def timed(fn, *a, iters=30):
    out = fn(*a)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*a)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3


def report(name, fn, *a, **kw):
    try:
        ms = timed(fn, *a, **kw)
        print(f"{name}: {ms:.2f} ms", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"{name}: FAILED {type(e).__name__}: {str(e)[:160]}", flush=True)


def main():
    cam = make_camera(np.eye(3), np.array([0, 0, 2.5]), 800, 800, fovx=0.9, fovy=0.9)
    means, colors, opacity, scales, rots = build_scene(N)
    proj = jax.jit(lambda m, s, r: project_gaussians(cam, m, build_cov3d_packed(s, r)))(
        means, scales, rots
    )
    tx_n, ty_n = num_tiles(800, 800)
    T = tx_n * ty_n

    # real instance arrays, materialized
    @jax.jit
    def instgen(proj):
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
        return tile_id, depth, gid, cell_ok

    tile_id, depth, gid, cell_ok = jax.block_until_ready(instgen(proj))
    report("instgen", instgen, proj)
    M = tile_id.shape[0]
    print(f"  M={M} real={int(jnp.sum(cell_ok))}")

    # depth-rank pre-sort (v3 scheme): argsort N, then single int32 key
    @jax.jit
    def depth_rank(proj):
        order = jnp.argsort(jnp.where(proj.mask, proj.depth, jnp.inf))
        rank = jnp.zeros((N,), jnp.int32).at[order].set(jnp.arange(N, dtype=jnp.int32))
        return order, rank

    order, rank = jax.block_until_ready(depth_rank(proj))
    report("argsort+invert N=100k", depth_rank, proj)

    @jax.jit
    def single_key(tile_id, rank):
        key = jnp.where(
            tile_id < T,
            tile_id * N + jnp.broadcast_to(rank[None, :], (K, N)).reshape(-1),
            jnp.iinfo(jnp.int32).max,
        )
        return key

    key = jax.block_until_ready(single_key(tile_id, rank))
    report("keybuild", single_key, tile_id, rank)

    sort1 = jax.jit(jnp.sort)
    report("sort 1-op int32 1.6M (real keys)", sort1, key)
    knp = np.asarray(key)
    rng = np.random.default_rng(0)
    synth = jnp.asarray(rng.permutation(knp))  # same values, shuffled
    report("sort 1-op int32 1.6M (shuffled)", sort1, synth)
    usynth = jnp.asarray(rng.integers(0, 2**31 - 1, size=M, dtype=np.int32))
    report("sort 1-op int32 1.6M (uniform)", sort1, usynth)

    sort2 = jax.jit(lambda k, v: jax.lax.sort_key_val(k, v))
    report("sort 2-op (key,gid)", sort2, key, gid)
    sort3 = jax.jit(lambda t, d, g: jax.lax.sort((t, d, g), num_keys=2))
    report("sort 3-op 2-key (current)", sort3, tile_id, depth, gid)

    key_sorted = jax.block_until_ready(sort1(key))
    ss = jax.jit(lambda s, q: jnp.searchsorted(s, q).astype(jnp.int32))
    report("searchsorted T=625 queries", ss, key_sorted, jnp.arange(T, dtype=jnp.int32) * N)
    report("searchsorted 1.6M queries", ss, key_sorted, key)

    perm = jnp.asarray(rng.permutation(M).astype(np.int32))
    pscat = jax.jit(lambda p: jnp.zeros((M,), jnp.int32).at[p].set(jnp.arange(M, dtype=jnp.int32)))
    report("flat perm scatter 1.6M int32", pscat, perm)

    # gather/scatter row experiments (D=10 packed)
    packed10 = jnp.concatenate(
        [proj.mean2d, proj.conic, opacity[:, None], colors, proj.depth[:, None]], axis=-1
    )
    idx = jnp.asarray(rng.integers(0, N, size=(T, MAX), dtype=np.int32))
    g10 = jax.jit(lambda p, d: p[d])
    report("row gather (T,MAX) D=10", g10, packed10, idx)
    dg10 = jnp.ones((T, MAX, 10))
    sc10 = jax.jit(lambda d, i: jnp.zeros((N, 10)).at[i.reshape(-1)].add(d.reshape(-1, 10)))
    report("scatter-add 640k rows D=10", sc10, dg10, idx)
    dg16 = jnp.ones((T, MAX, 16))
    sc16 = jax.jit(lambda d, i: jnp.zeros((N, 16)).at[i.reshape(-1)].add(d.reshape(-1, 16)))
    report("scatter-add 640k rows D=16 (current)", sc16, dg16, idx)

    # (K, N) masked row-gather backward candidate: dpacked[n] = sum_k dg_flat[pos(k,n)]
    pos = jnp.asarray(rng.integers(0, T * MAX, size=(K, N), dtype=np.int32))
    ok = cell_ok
    kg = jax.jit(
        lambda d, p, m: jnp.sum(
            jnp.where(m.reshape(K, N)[..., None], d.reshape(-1, 10)[p], 0.0), axis=0
        )
    )
    report("(K,N) masked row gather D=10", kg, dg10, pos, ok)


if __name__ == "__main__":
    main()
