"""Hyper-parameter schedules (host-side, numpy) and jit-safe variants.

Parity with /root/reference/utils/general_utils.py:49-118 (expon / linear
decay with sine delay ramp) and /root/reference/utils/time_utils.py:485-503
(landmark_interpolate — piecewise log/linear interpolation over step
landmarks, used for ARAP/elastic lambda scheduling).
"""
from __future__ import annotations

import numpy as np


def expon_lr(lr_init, lr_final, lr_delay_steps=0, lr_delay_mult=1.0, max_steps=1_000_000):
    """Log-linear decay lr_init -> lr_final with optional sine delay ramp."""

    def helper(step):
        if lr_init == 0.0 and lr_final == 0.0:
            return 0.0
        if lr_delay_steps > 0:
            delay = lr_delay_mult + (1 - lr_delay_mult) * np.sin(
                0.5 * np.pi * np.clip(step / lr_delay_steps, 0, 1)
            )
        else:
            delay = 1.0
        t = np.clip(step / max_steps, 0, 1)
        return float(delay * np.exp(np.log(lr_init) * (1 - t) + np.log(lr_final) * t))

    return helper


def linear_lr(lr_init, lr_final, lr_delay_steps=0, lr_delay_mult=1.0, max_steps=1_000_000):
    def helper(step):
        if lr_init == 0.0 and lr_final == 0.0:
            return 0.0
        if lr_delay_steps > 0:
            delay = lr_delay_mult + (1 - lr_delay_mult) * np.sin(
                0.5 * np.pi * np.clip(step / lr_delay_steps, 0, 1)
            )
        else:
            delay = 1.0
        t = np.clip(step / max_steps, 0, 1)
        return float(delay * (lr_init * (1 - t) + lr_final * t))

    return helper


def landmark_interpolate(landmarks, steps, step, interpolation="log"):
    """Piecewise interpolation of a lambda over training-step landmarks.

    Before the first landmark -> 0; after the last -> max(0, last value);
    between landmarks: log- or linear-interpolated.
    """
    stage = int((step >= np.asarray(steps)).sum())
    if stage == len(steps):
        return max(0, landmarks[-1])
    if stage == 0:
        return 0
    l1, l2 = landmarks[stage - 1], landmarks[stage]
    if l2 <= 0:
        return 0
    s1, s2 = steps[stage - 1], steps[stage]
    ratio = (step - s1) / (s2 - s1)
    if interpolation == "log":
        return float(np.exp(np.log(l1) * (1 - ratio) + np.log(l2) * ratio))
    if interpolation == "linear":
        return float(l1 * (1 - ratio) + l2 * ratio)
    raise NotImplementedError(f"Unknown interpolation: {interpolation}")
