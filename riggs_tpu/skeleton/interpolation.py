"""Key-pose SLERP interpolation for animation playback.

Parity with /root/reference/skeleton_utils/interpolation_utils.py:4-86:
pairwise spherical interpolation of per-joint local rotations between saved
key poses, with linear interpolation of the global translation.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from riggs_tpu.ops.quaternion import quat_slerp


def slerp_batch(q0: jax.Array, q1: jax.Array, t: jax.Array) -> jax.Array:
    """q0, q1: (J, 4); t: (M,) -> (M, J, 4) interpolated unit quats."""
    return jax.vmap(lambda ti: quat_slerp(q0, q1, ti))(t)


def interpolate_key_poses(
    rotations: jax.Array, translations: jax.Array, frames_per_segment: int = 20
) -> tuple[jax.Array, jax.Array]:
    """rotations: (P, J, 4) key poses; translations: (P, 3).

    Returns ((P-1)*F, J, 4) rotations and ((P-1)*F, 3) translations sweeping
    through the key poses.
    """
    P = rotations.shape[0]
    assert P >= 2, "need at least two key poses"
    t = jnp.linspace(0.0, 1.0, frames_per_segment + 1)[:-1]
    rots, trans = [], []
    for i in range(P - 1):
        rots.append(slerp_batch(rotations[i], rotations[i + 1], t))
        trans.append((1.0 - t[:, None]) * translations[i] + t[:, None] * translations[i + 1])
    return jnp.concatenate(rots, axis=0), jnp.concatenate(trans, axis=0)
