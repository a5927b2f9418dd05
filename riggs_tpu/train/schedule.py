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


def expon_lr_jit(lr_init, lr_final, lr_delay_steps=0, lr_delay_mult=1.0, max_steps=1_000_000):
    """Traced-step variant of :func:`expon_lr`: returns ``fn(it: Array) -> Array``.

    Computing the schedule ON DEVICE from a state-carried iteration counter
    removes the per-step host->device lr transfers, which cost ~25-35 ms each
    over the tunneled chip (measured round 5; the training loop used to ship
    ~14 scalars per step). Hyper-parameters are python floats at trace time,
    so the exp/log constants fold into the compiled program.
    """
    import jax.numpy as jnp

    if lr_init == 0.0 and lr_final == 0.0:
        return lambda it: jnp.float32(0.0)

    def helper(it):
        step = jnp.asarray(it, jnp.float32)
        if lr_delay_steps > 0:
            delay = lr_delay_mult + (1 - lr_delay_mult) * jnp.sin(
                0.5 * jnp.pi * jnp.clip(step / lr_delay_steps, 0.0, 1.0)
            )
        else:
            delay = 1.0
        t = jnp.clip(step / max_steps, 0.0, 1.0)
        return (delay * jnp.exp(np.log(lr_init) * (1 - t) + np.log(lr_final) * t)).astype(
            jnp.float32
        )

    return helper


def landmark_interpolate_jit(landmarks, steps, it, interpolation="log"):
    """Traced-step variant of :func:`landmark_interpolate` (same semantics:
    0 before the first landmark, clamped after the last, piecewise log/linear
    between). landmarks/steps are python constants; ``it`` is a traced array."""
    import jax.numpy as jnp

    landmarks = [float(v) for v in landmarks]
    steps_f = [float(s) for s in steps]
    step = jnp.asarray(it, jnp.float32)
    stage = jnp.sum(step >= jnp.asarray(steps_f))  # traced stage index

    vals = []
    for k in range(len(steps_f) + 1):
        if k == len(steps_f):
            vals.append(jnp.float32(max(0.0, landmarks[-1])))
        elif k == 0:
            vals.append(jnp.float32(0.0))
        else:
            l1, l2 = landmarks[k - 1], landmarks[k]
            if l2 <= 0:
                vals.append(jnp.float32(0.0))
                continue
            s1, s2 = steps_f[k - 1], steps_f[k]
            ratio = (step - s1) / (s2 - s1)
            if interpolation == "log":
                # clamp: un-selected branches must stay finite (one NaN in the
                # stacked candidates would not matter for take, but keep all
                # lanes clean for debug-nans runs)
                l1s = max(l1, 1e-30)
                vals.append(jnp.exp(np.log(l1s) * (1 - ratio) + np.log(l2) * ratio).astype(jnp.float32))
            elif interpolation == "linear":
                vals.append(jnp.float32(l1 * (1 - ratio) + l2 * ratio))
            else:
                raise NotImplementedError(f"Unknown interpolation: {interpolation}")
    return jnp.take(jnp.stack(vals), stage)


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
