"""Host-side tile-ladder construction from observed per-tile hit counts.

The laddered-window renderer (render/tiles.py ``tile_ladder``) assigns
rank-dependent window capacities to count-sorted tiles, shrinking the
row-op-bound instance gather + scatter-add backward from T * max(count) rows
to roughly the area under the sorted-count curve. This module derives the
ladder: probe-render one or more frames, collect ``count`` (the binner's true
per-tile hit counts), and fit a static rank->capacity partition with safety
margin. The ladder is a compile-time constant — recompute it only when the
scene changes character (capacity growth, big camera moves); bucket
truncation is counted in ``overflow_tiles`` so a stale ladder is detected,
never silent.

No reference counterpart: the CUDA rasterizer (reference
gaussian_renderer/__init__.py:133) materializes exact-size per-tile lists via
device-side dynamic allocation, which has no static-shape XLA equivalent.
"""
from __future__ import annotations

import numpy as np

CHUNK = 128  # window caps are multiples of the blend kernel chunk


def make_tile_ladder(
    counts,
    n_buckets: int = 4,
    margin: float = 1.3,
    min_cap: int = CHUNK,
    max_cap: int | None = None,
) -> tuple[tuple[int, int], ...]:
    """Build a ``tile_ladder`` from per-tile hit counts.

    counts: (T,) or (F, T) observed counts (multiple probe frames give a
    per-rank envelope: each frame's counts are sorted descending and the
    max over frames is taken per rank position, so the ladder holds for
    every probed frame simultaneously).
    margin: multiplicative headroom on the envelope before rounding up to a
    CHUNK multiple (absorbs count drift between reprobes).
    n_buckets: maximum number of rank buckets (more buckets = tighter area,
    more kernel instantiations; 3-5 is the useful range).

    Returns ((n_tiles, cap), ...) summing to T, caps non-increasing.
    """
    c = np.asarray(counts)
    if c.ndim == 1:
        c = c[None, :]
    T = c.shape[1]
    env = np.sort(c, axis=1)[:, ::-1].max(axis=0)  # (T,) rank envelope
    need = np.maximum(np.ceil(env * margin / CHUNK).astype(int) * CHUNK, min_cap)
    if max_cap is not None:
        need = np.minimum(need, max_cap)
    # need is non-increasing along ranks; a bucket [a, b) must use cap need[a].
    # Candidate boundaries are the positions where need drops (few distinct
    # CHUNK levels), so exact area minimization over <= n_buckets-1 splits is
    # a tiny combinatorial search.
    drops = [r for r in range(1, T) if need[r] < need[r - 1]]
    from itertools import combinations

    best, best_area = None, None
    for k in range(0, min(n_buckets - 1, len(drops)) + 1):
        for splits in combinations(drops, k):
            bounds = [0, *splits, T]
            area = sum(
                (bounds[i + 1] - bounds[i]) * int(need[bounds[i]])
                for i in range(len(bounds) - 1)
            )
            if best_area is None or area < best_area:
                best_area = area
                best = tuple(
                    (bounds[i + 1] - bounds[i], int(need[bounds[i]]))
                    for i in range(len(bounds) - 1)
                )
    return best


def ladder_rows(ladder) -> int:
    """Total window rows a ladder materializes (the gather/scatter cost)."""
    return int(sum(n * cap for n, cap in ladder))
