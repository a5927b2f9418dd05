"""LadderPolicy: probe -> fit -> refit-on-overflow window-ladder manager.

The policy rides training steps (render/ladder.py): the binner reports TRUE
per-tile hit counts pre-truncation, so even an overflowing step yields an
exact envelope sample; ``observe`` fits the ladder after ``n_probe`` steps
and refits whenever a step reports ladder truncation. No reference
counterpart (the CUDA rasterizer sizes per-tile lists dynamically,
/root/reference/gaussian_renderer/__init__.py:133).
"""
import numpy as np
import pytest

from riggs_tpu.render.ladder import CHUNK, LadderPolicy, ladder_rows, make_tile_ladder


@pytest.fixture
def counts(rng):
    # a skewed tile-count profile: a few hot tiles, many cold ones
    return (rng.pareto(2.0, size=(625,)) * 60).astype(np.int64)


class TestLadderPolicy:
    def test_probe_then_fit(self, counts):
        pol = LadderPolicy(n_probe=3)
        assert pol.observe(counts) is False and pol.ladder is None
        assert pol.observe(counts * 2) is False and pol.ladder is None
        assert pol.observe(counts) is True  # fit on the n_probe-th sample
        lad = pol.ladder
        assert lad is not None and sum(n for n, _ in lad) == counts.size
        # the fitted caps cover the envelope (elementwise max of samples)
        env = np.sort(counts * 2)[::-1]
        caps = np.concatenate([np.full(n, c) for n, c in lad])
        assert (caps >= np.minimum(env, caps.max())).all()
        assert all(c % CHUNK == 0 for _, c in lad if c)

    def test_batched_counts_fold_per_frame(self, counts):
        # a (B, T) batch must contribute each frame's rank-sorted counts,
        # not the batch mean/sum
        pol = LadderPolicy(n_probe=1)
        pol.observe(np.stack([counts, counts * 3]))
        big = make_tile_ladder(np.sort(counts * 3)[::-1], margin=pol.margin)
        assert ladder_rows(pol.ladder) >= ladder_rows(big) * 0.99

    def test_overflow_triggers_refit(self, counts):
        pol = LadderPolicy(n_probe=1)
        pol.observe(counts)
        first = pol.ladder
        # clean steps never refit, even as the envelope grows a little
        assert pol.observe(counts, overflow_tiles=0) is False
        assert pol.ladder == first and pol.refits == 0
        # a truncating step (overflow counted by the renderer) refits with
        # the grown envelope
        assert pol.observe(counts * 8, overflow_tiles=5) is True
        assert pol.refits == 1
        assert ladder_rows(pol.ladder) > ladder_rows(first)

    def test_overflow_with_unchanged_envelope_keeps_ladder(self, counts):
        # truncation reported but the envelope (and hence the fit) is
        # unchanged -> no recompile churn
        pol = LadderPolicy(n_probe=1)
        pol.observe(counts)
        first = pol.ladder
        assert pol.observe(counts // 2, overflow_tiles=1) is False
        assert pol.ladder == first and pol.refits == 0

    def test_envelope_only_grows(self, counts):
        pol = LadderPolicy(n_probe=1)
        pol.observe(counts * 4)
        rows = ladder_rows(pol.ladder)
        pol.observe(counts // 4, overflow_tiles=1)
        assert ladder_rows(pol.ladder) == rows

    # NOTE: the trainer wiring (train/stage1.py, train/stage2.py, the dp
    # loops) is exercised end-to-end by the stage-1/stage-2 smokes in
    # test_stage1.py and the dp smokes in test_parallel.py —
    # PipelineConfig.use_tile_ladder defaults to True, so those loops probe,
    # fit and train THROUGH the fitted ladder (pallas interpret on CPU).
