"""Canonical Gaussian cloud as a capacity-padded, static-shape pytree.

Capability parity with the reference GaussianModel
(/root/reference/scene/gaussian_model.py:37-546) — parameters, activations,
isotropic mode, motion-mask feature channel, SH warmup, adaptive
densify/clone/split/prune, FPS subsampling — re-designed for XLA:

  * arrays have a fixed capacity C with an ``alive`` mask; densification is a
    masked scatter into free slots (no tensor re-allocation, no re-jit until
    capacity itself is grown host-side);
  * the reference's Adam "optimizer surgery" (slicing/concatenating moment
    tensors, gaussian_model.py:356-416) becomes zeroing moment rows of
    (re)allocated slots — the optimizer state lives in the same capacity
    layout as the parameters;
  * split-sampling uses explicit jax PRNG keys.

All functions are pure: (state, inputs) -> state.
"""
from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from riggs_tpu.ops.knn import mean_knn_dist2
from riggs_tpu.ops.fps import farthest_point_sample
from riggs_tpu.ops.quaternion import quat_normalize, quat_multiply, quat_to_rotmat
from riggs_tpu.ops.sh import rgb_to_sh_dc, sh_dim


def inverse_sigmoid(x):
    return jnp.log(x / (1.0 - x))


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class Gaussians:
    """Parameter pytree. Leading dim of every array is the capacity C."""

    xyz: jax.Array  # (C, 3)
    features_dc: jax.Array  # (C, 1, 3)
    features_rest: jax.Array  # (C, K-1, 3)
    scaling: jax.Array  # (C, 1) isotropic or (C, 3); log-scale
    rotation: jax.Array  # (C, 4) unnormalized quat
    opacity: jax.Array  # (C, 1) logit
    feature: jax.Array  # (C, F) hyper coords + motion-mask logit (F may be 0)
    alive: jax.Array  # (C,) bool
    max_sh_degree: int = dataclasses.field(metadata=dict(static=True))
    isotropic: bool = dataclasses.field(metadata=dict(static=True))
    with_motion_mask: bool = dataclasses.field(metadata=dict(static=True))
    # StandardGaussianModel(all_the_same=True) mode for node Gaussians:
    # every splat shares the mean log-scale (gaussian_model.py:534-546)
    shared_scale: bool = dataclasses.field(default=False, metadata=dict(static=True))

    # ---- activations -----------------------------------------------------
    @property
    def capacity(self) -> int:
        return self.xyz.shape[0]

    @property
    def get_scaling(self) -> jax.Array:
        s = self.scaling
        if self.isotropic:
            s = jnp.repeat(s[:, :1], 3, axis=1)
        if self.shared_scale:
            mean = jnp.sum(jnp.where(self.alive[:, None], s, 0.0)) / jnp.maximum(
                3 * jnp.sum(self.alive), 1
            )
            s = jnp.broadcast_to(mean, s.shape)
        return jnp.exp(s)

    @property
    def get_rotation(self) -> jax.Array:
        return quat_normalize(self.rotation)

    @property
    def get_opacity(self) -> jax.Array:
        return jax.nn.sigmoid(self.opacity)

    @property
    def get_features(self) -> jax.Array:
        return jnp.concatenate([self.features_dc, self.features_rest], axis=1)

    @property
    def motion_mask(self) -> jax.Array:
        if self.with_motion_mask and self.feature.shape[-1] > 0:
            return jax.nn.sigmoid(self.feature[:, -1:])
        return jnp.ones_like(self.xyz[:, :1])

    @property
    def num_alive(self) -> jax.Array:
        return jnp.sum(self.alive)

    def params_dict(self) -> dict[str, jax.Array]:
        """The trainable leaves (alive mask excluded)."""
        return {
            "xyz": self.xyz,
            "f_dc": self.features_dc,
            "f_rest": self.features_rest,
            "scaling": self.scaling,
            "rotation": self.rotation,
            "opacity": self.opacity,
            "feature": self.feature,
        }

    def replace_params(self, p: dict[str, jax.Array]) -> "Gaussians":
        return dataclasses.replace(
            self,
            xyz=p["xyz"],
            features_dc=p["f_dc"],
            features_rest=p["f_rest"],
            scaling=p["scaling"],
            rotation=p["rotation"],
            opacity=p["opacity"],
            feature=p["feature"],
        )


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class DensifyStats:
    """Screen-space gradient statistics driving clone/split decisions."""

    xyz_gradient_accum: jax.Array  # (C,)
    denom: jax.Array  # (C,)
    max_radii2d: jax.Array  # (C,)


def init_densify_stats(capacity: int) -> DensifyStats:
    z = jnp.zeros(capacity)
    return DensifyStats(xyz_gradient_accum=z, denom=z, max_radii2d=z)


def create_from_pcd(
    points: np.ndarray,
    colors: np.ndarray,
    capacity: int,
    max_sh_degree: int = 3,
    isotropic: bool = False,
    fea_dim: int = 0,
    with_motion_mask: bool = True,
    shared_scale: bool = False,
) -> Gaussians:
    """Initialize from a point cloud (reference create_from_pcd semantics:
    scales from mean 3-NN distance, opacity 0.1, identity rotation, DC color)."""
    n = points.shape[0]
    assert n <= capacity, f"{n} points > capacity {capacity}"
    if with_motion_mask:
        fea_dim += 1

    pts = jnp.asarray(points, jnp.float32)
    dist2 = jnp.clip(mean_knn_dist2(pts, k=3), 1e-7)
    log_scale = 0.5 * jnp.log(dist2)  # log(sqrt(dist2))
    s_dim = 1 if isotropic else 3
    rest = sh_dim(max_sh_degree) - 1

    def pad(a, fill=0.0):
        return jnp.concatenate(
            [a, jnp.full((capacity - n,) + a.shape[1:], fill, a.dtype)], axis=0
        )

    feature = -1e-2 * jnp.ones((n, fea_dim))
    if with_motion_mask and fea_dim > 0:
        feature = feature.at[:, -1].set(0.0)

    return Gaussians(
        xyz=pad(pts),
        features_dc=pad(rgb_to_sh_dc(jnp.asarray(colors, jnp.float32))[:, None, :]),
        features_rest=pad(jnp.zeros((n, rest, 3))),
        scaling=pad(jnp.tile(log_scale[:, None], (1, s_dim))),
        # dead slots also get identity quats: zero quats have degenerate
        # normalization gradients that can poison reductions coupling rows
        rotation=jnp.tile(jnp.array([1.0, 0, 0, 0]), (capacity, 1)),
        opacity=pad(inverse_sigmoid(0.1 * jnp.ones((n, 1)))),
        feature=pad(feature),
        alive=jnp.arange(capacity) < n,
        max_sh_degree=max_sh_degree,
        isotropic=isotropic,
        with_motion_mask=with_motion_mask,
        shared_scale=shared_scale,
    )


# ---------------------------------------------------------------------------
# Densification (masked static-shape editions of clone / split / prune)
# ---------------------------------------------------------------------------


def _free_slot_map(alive: jax.Array, selected: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Map the k-th selected row to the k-th free slot.

    Returns (dest (C,) int32 — destination slot per source row, C = dropped;
    ok (C,) — selected rows that actually got a slot)."""
    C = alive.shape[0]
    free_order = jnp.argsort(alive)  # free slots first (False < True)
    n_free = C - jnp.sum(alive)
    k = jnp.cumsum(selected) - 1  # rank among selected
    ok = selected & (k < n_free)
    dest = jnp.where(ok, free_order[jnp.clip(k, 0, C - 1)], C)
    return dest.astype(jnp.int32), ok


def _scatter_rows(gs: Gaussians, dest: jax.Array, rows: dict[str, jax.Array]) -> Gaussians:
    p = gs.params_dict()
    newp = {k: p[k].at[dest].set(rows[k], mode="drop") for k in p}
    alive = gs.alive.at[dest].set(True, mode="drop")
    return dataclasses.replace(gs.replace_params(newp), alive=alive)


def densify_clone(
    gs: Gaussians,
    stats_grad: jax.Array,
    grad_threshold: float,
    scene_extent: float,
    percent_dense: float = 0.01,
) -> tuple[Gaussians, jax.Array]:
    """Clone small high-gradient Gaussians into free slots. Returns (gs, dest)."""
    max_scale = jnp.max(gs.get_scaling, axis=1)
    selected = (
        gs.alive
        & (stats_grad >= grad_threshold)
        & (max_scale <= percent_dense * scene_extent)
    )
    dest, ok = _free_slot_map(gs.alive, selected)
    rows = {k: v for k, v in gs.params_dict().items()}
    return _scatter_rows(gs, dest, rows), dest


def densify_split(
    gs: Gaussians,
    stats_grad: jax.Array,
    grad_threshold: float,
    scene_extent: float,
    key: jax.Array,
    n_split: int = 2,
    percent_dense: float = 0.01,
) -> tuple[Gaussians, jax.Array]:
    """Split large high-gradient Gaussians: sample n_split children from the
    Gaussian, shrink scale by 1/(0.8 n), kill the parent. Returns (gs, dests)."""
    max_scale = jnp.max(gs.get_scaling, axis=1)
    selected = (
        gs.alive
        & (stats_grad >= grad_threshold)
        & (max_scale > percent_dense * scene_extent)
    )
    scales = gs.get_scaling
    R = quat_to_rotmat(gs.rotation)
    dests = []
    for i in range(n_split):
        key, sub = jax.random.split(key)
        noise = jax.random.normal(sub, gs.xyz.shape) * scales
        new_xyz = jnp.einsum("nab,nb->na", R, noise) + gs.xyz
        new_scaling = jnp.log(scales / (0.8 * n_split))
        if gs.isotropic:
            new_scaling = new_scaling[:, :1]
        rows = dict(
            gs.params_dict(), xyz=new_xyz, scaling=new_scaling
        )
        # child i of each selected parent goes to a fresh free slot
        dest, ok = _free_slot_map(gs.alive, selected)
        gs = _scatter_rows(gs, dest, rows)
        dests.append(dest)
    # kill the parents (only those whose children were placed)
    gs = dataclasses.replace(gs, alive=gs.alive & ~selected)
    return gs, jnp.stack(dests)


def prune(gs: Gaussians, prune_mask: jax.Array) -> Gaussians:
    return dataclasses.replace(gs, alive=gs.alive & ~prune_mask)


def prune_by_opacity(
    gs: Gaussians,
    min_opacity: float,
    max_radii2d: jax.Array | None = None,
    max_screen_size: float = 0.0,
    scene_extent: float = 0.0,
) -> Gaussians:
    m = gs.get_opacity[:, 0] < min_opacity
    if max_screen_size > 0.0 and max_radii2d is not None:
        m = m | (max_radii2d > max_screen_size)
        m = m | (jnp.max(gs.get_scaling, axis=1) > 0.1 * scene_extent)
    return prune(gs, m)


def sampling_and_prune(gs: Gaussians, num_sample: int) -> Gaussians:
    """Keep only an FPS subset of the alive Gaussians (stage-2 pre-pruning,
    reference sampling_and_prune)."""
    idx = farthest_point_sample(gs.xyz, num_sample, mask=gs.alive)
    keep = jnp.zeros(gs.capacity, bool).at[idx].set(True)
    return dataclasses.replace(gs, alive=gs.alive & keep)


def reset_opacity(gs: Gaussians, max_opacity: float = 0.01) -> Gaussians:
    new_op = jnp.minimum(gs.opacity, inverse_sigmoid(max_opacity))
    return dataclasses.replace(gs, opacity=new_op)


def add_densification_stats(
    stats: DensifyStats,
    screen_grad: jax.Array,
    radii: jax.Array,
    visible: jax.Array,
    width: int | None = None,
    height: int | None = None,
) -> DensifyStats:
    """Accumulate the norm of screen-space mean gradients for visible splats.

    ``screen_grad`` is dL/d(mean2d) in PIXEL units (mean2d_bias is added to
    pixel coordinates in render/project.py). The reference CUDA rasterizer
    returns dL_dmean2D in the NDC convention (ddelx_dx = 0.5*W in
    backward.cu), and densify_grad_threshold=0.0002 is calibrated to that
    scale — so convert pixel-space grads by 0.5*[W, H] before accumulating.
    Pass the render width/height; omitting them keeps raw pixel units (only
    for callers that rescaled the threshold themselves).
    """
    g = screen_grad[:, :2]
    if width is not None:
        g = g * jnp.asarray([0.5 * width, 0.5 * height], dtype=g.dtype)
    gnorm = jnp.linalg.norm(g, axis=-1)
    return DensifyStats(
        xyz_gradient_accum=stats.xyz_gradient_accum + jnp.where(visible, gnorm, 0.0),
        denom=stats.denom + visible.astype(jnp.float32),
        max_radii2d=jnp.maximum(stats.max_radii2d, jnp.where(visible, radii, 0.0)),
    )
