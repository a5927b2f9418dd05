"""Observability: per-step timing, TensorBoard scalars/images, eval reports.

Equivalent of the reference's auxiliary subsystems (SURVEY.md §5):
  * CUDA-event step timing (train_rig.py:101-102,538,549) -> wall-clock +
    optional jax.profiler traces;
  * TensorBoard SummaryWriter scalar/image channels (train_utils.py:54-243);
  * periodic held-out evaluation with best-PSNR tracking
    (training_report / skeleton_training_report).
"""
from __future__ import annotations

import contextlib
import time
from pathlib import Path
from typing import Any, Callable

import numpy as np


class StepTimer:
    """Wall-clock per-step timing with an EMA (the iter_start/iter_end pair)."""

    def __init__(self, ema: float = 0.9):
        self.ema = ema
        self.avg_ms: float | None = None
        self._t0 = 0.0

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        dt = (time.perf_counter() - self._t0) * 1000.0
        self.avg_ms = dt if self.avg_ms is None else self.ema * self.avg_ms + (1 - self.ema) * dt
        return False


@contextlib.contextmanager
def profile_trace(log_dir: str | Path, enabled: bool = True):
    """jax.profiler trace scope (view with tensorboard or xprof)."""
    import jax

    if not enabled:
        yield
        return
    jax.profiler.start_trace(str(log_dir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class TrainLogger:
    """TensorBoard writer + best-metric tracking. No-op without a log dir."""

    def __init__(self, log_dir: str | Path | None):
        self.writer = None
        if log_dir is not None:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self.writer = SummaryWriter(str(log_dir))
            except ImportError:
                try:
                    from tensorboardX import SummaryWriter  # pragma: no cover

                    self.writer = SummaryWriter(str(log_dir))
                except ImportError:
                    self.writer = None
        self.best = {"psnr": 0.0, "iteration": 0}

    def scalars(self, step: int, prefix: str, values: dict):
        if self.writer is None:
            return
        for k, v in values.items():
            try:
                self.writer.add_scalar(f"{prefix}/{k}", float(v), step)
            except (TypeError, ValueError):
                pass

    def image(self, step: int, tag: str, img: np.ndarray):
        if self.writer is None:
            return
        self.writer.add_image(tag, np.clip(np.asarray(img), 0, 1), step, dataformats="HWC")

    def histogram(self, step: int, tag: str, values: np.ndarray):
        if self.writer is None:
            return
        self.writer.add_histogram(tag, np.asarray(values), step)

    def close(self):
        if self.writer is not None:
            self.writer.close()


def evaluation_report(
    logger: TrainLogger,
    step: int,
    render_fn: Callable,
    test_frames: list,
    lpips_model=None,
    log_images: int = 3,
    prefix: str = "test",
) -> dict:
    """Full held-out evaluation (the training_report pattern): renders every
    test frame with ``render_fn(frame) -> image``, logs mean metrics + a few
    image panels, tracks the best PSNR. Returns the mean metrics."""
    from riggs_tpu.eval.metrics import evaluate_image

    rows = []
    for i, frame in enumerate(test_frames):
        img = render_fn(frame)
        rows.append(evaluate_image(img, frame.image, lpips_model))
        if i < log_images:
            logger.image(step, f"{prefix}/render_{i}", np.asarray(img))
            if step == 0:
                logger.image(step, f"{prefix}/gt_{i}", np.asarray(frame.image))
    means = {k: float(np.mean([r[k] for r in rows])) for k in rows[0]} if rows else {}
    logger.scalars(step, prefix, means)
    if means.get("psnr", 0.0) > logger.best["psnr"]:
        logger.best = {"psnr": means["psnr"], "iteration": step, **means}
    return means
