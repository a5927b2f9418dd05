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
    quantize: str = "chunk",
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
    if quantize == "pow2":
        # power-of-two-of-CHUNK caps: a growing envelope only changes the
        # ladder when a bucket crosses a pow2 boundary, and the same tuples
        # recur across refits/runs so the persistent compile cache absorbs
        # them. The price is <= 2x bucket area vs CHUNK-exact — the right
        # trade for TRAINING loops, where every distinct ladder is a fresh
        # multi-minute remote compile (round-5 refpoint: 17 refit compiles
        # dominated stage-1 wall). Benches with one static fit keep "chunk".
        need = np.maximum(env * margin, min_cap)
        need = CHUNK * 2 ** np.ceil(np.log2(np.maximum(need / CHUNK, 1.0))).astype(int)
        need = need.astype(int)
    else:
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


class LadderPolicy:
    """Probe -> fit -> refit-on-overflow ladder manager for training loops.

    Training can't pay a probe render per step, so the policy rides the
    training steps themselves: every ``observe(tile_counts, overflow_tiles)``
    call folds the step's TRUE per-tile hit counts (the binner reports them
    pre-truncation, so even an overflowing step yields an exact envelope
    sample) into a rank-sorted running envelope. ``ladder`` stays None for the
    first ``n_probe`` observations (steps render with plain windows — correct,
    just slower); it is then fit once, and refit whenever a step reports
    ladder truncation (``overflow_tiles > 0``, counted by the renderer, never
    silent). Each refit is one new jit specialization of the train step; the
    envelope only grows, and caps are CHUNK-quantized with ``margin``
    headroom, so refits are few (scene-change scale: densification bursts,
    big camera moves).

    No reference counterpart (the CUDA rasterizer allocates exact per-tile
    lists dynamically; /root/reference/gaussian_renderer/__init__.py:133).
    """

    def __init__(
        self,
        n_buckets: int = 4,
        margin: float = 1.3,
        n_probe: int = 12,
        min_cap: int = CHUNK,
        max_cap: int | None = None,
        quantize: str = "pow2",
    ):
        # n_probe default 12: with per-frame count variation (e.g. 64-frame
        # scenes) a 3-step probe undersamples the envelope and the first
        # training frames each trigger an overflow refit (round-5 refpoint:
        # each refit is a multi-minute remote compile)
        self.n_buckets = n_buckets
        self.margin = margin
        self.n_probe = n_probe
        self.min_cap = min_cap
        self.max_cap = max_cap
        self.quantize = quantize
        self.env = None  # (T,) rank-sorted count envelope
        self.seen = 0
        self.ladder: tuple | None = None
        self.refits = 0

    def observe(self, tile_counts, overflow_tiles: int = 0) -> bool:
        """Fold one step's true counts in; returns True when the ladder
        changed (callers re-pass it as the step's static arg).
        tile_counts: (T,) or (B, T) — a frame batch contributes each frame's
        rank-sorted counts to the envelope separately."""
        a = np.asarray(tile_counts)
        if a.ndim == 1:
            a = a[None]
        c = np.sort(a, axis=1)[:, ::-1].max(axis=0)
        self.env = c if self.env is None else np.maximum(self.env, c)
        self.seen += 1
        if self.ladder is None:
            if self.seen >= self.n_probe:
                self._fit()
                return True
            return False
        if overflow_tiles > 0:
            old = self.ladder
            self._fit()
            if self.ladder != old:
                self.refits += 1
                return True
        return False

    def anticipate(self, growth_ratio: float) -> bool:
        """Pre-scale the envelope after a densification event so ONE refit
        rides ahead of the growth, instead of overflow-triggered refit churn
        (each refit is a new jit specialization — minutes on the axon
        remote-compile path; round-5 refpoint finding). growth_ratio is the
        alive-count ratio after/before the event; counts scale with alive
        density to first order and ``margin`` absorbs the remainder (an
        overflow-triggered refit still backstops any underestimate).
        Returns True when the ladder changed."""
        if self.env is None or growth_ratio <= 1.0:
            return False
        self.env = self.env * float(growth_ratio)
        old = self.ladder
        self._fit()
        if self.ladder != old:
            self.refits += 1
            return True
        return False

    def _fit(self):
        self.ladder = make_tile_ladder(
            self.env, n_buckets=self.n_buckets, margin=self.margin,
            min_cap=self.min_cap, max_cap=self.max_cap, quantize=self.quantize,
        )
