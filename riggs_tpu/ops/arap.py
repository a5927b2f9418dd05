"""As-rigid-as-possible graph energies over control-node trajectories.

TPU-first re-design of /root/reference/utils/deform_utils.py: the reference
builds sparse (ii, jj, nn) edge lists with data-dependent sizes and python
loops; here connectivity is a dense (N, K) neighbor table with a validity
mask — static shapes, vmapped Procrustes (XLA batched SVD replaces the
torch_batch_svd CUDA extension), no host sync.

  * ``connectivity_from_points``  <- cal_connectivity_from_points (:51-103)
  * ``estimate_rotations``        <- estimate_rotation (:123-159)
  * ``arap_error``                <- cal_arap_error (:170-198)
  * ``arap_deformation_loss``     <- arap_deformation_loss (:239-280)
  * ``geodesic_floyd``            <- geodesic_distance_floyd (:40-48)
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from riggs_tpu.ops.geometry import fit_rotations
from riggs_tpu.ops.knn import knn, pairwise_dist2
from riggs_tpu.ops.quaternion import quat_to_rotmat


class Connectivity(NamedTuple):
    nn_idx: jax.Array  # (N, K) neighbor indices
    weight: jax.Array  # (N, K) normalized edge weights (0 where invalid)
    valid: jax.Array  # (N, K) bool


def connectivity_from_points(
    points: jax.Array,
    radius: float = 0.1,
    K: int = 10,
    trajectory: jax.Array | None = None,
    least_edge_num: int = 3,
) -> Connectivity:
    """KNN graph with radius cutoff beyond the first ``least_edge_num`` edges
    and adaptive gaussian weighting exp(-d2/mean(d2)), normalized per node."""
    query = points if trajectory is None else trajectory.reshape(points.shape[0], -1) / trajectory.shape[1]
    d2, idx = knn(query, query, K + 1)
    d2, idx = d2[:, 1:], idx[:, 1:]  # drop self
    keep = jnp.ones_like(d2, bool)
    keep = keep.at[:, least_edge_num:].set(d2[:, least_edge_num:] < radius**2)
    mean_d2 = jnp.sum(jnp.where(keep, d2, 0.0)) / jnp.maximum(jnp.sum(keep), 1)
    weight = jnp.exp(-d2 / jnp.maximum(mean_d2, 1e-12))
    weight = jnp.where(keep, weight, 0.0)
    weight = weight / jnp.maximum(weight.sum(-1, keepdims=True), 1e-12)
    return Connectivity(nn_idx=idx, weight=weight, valid=keep)


def edge_matrix(verts: jax.Array, conn: Connectivity) -> jax.Array:
    """E[i, k] = v_i - v_{nn[i,k]}, zero where invalid. (N, K, 3)."""
    e = verts[:, None, :] - verts[conn.nn_idx]
    return jnp.where(conn.valid[..., None], e, 0.0)


def estimate_rotations(source: jax.Array, target: jax.Array, conn: Connectivity) -> jax.Array:
    """Per-node best-fit rotation source->target over the weighted edge fan."""
    src = edge_matrix(source, conn)
    tgt = edge_matrix(target, conn)
    # S^T with S = sum_k w src tgt^T -> fit_rotations wants sum (R p) p^T = tgt-major
    cov = jnp.einsum("nka,nk,nkb->nab", tgt, conn.weight, src)
    return fit_rotations(cov)


def arap_error(nodes_sequence: jax.Array, conn: Connectivity) -> jax.Array:
    """Sum of ARAP stretch energies of each frame vs frame 0.

    nodes_sequence: (T, N, 3). Rotations are best-fit under stop_gradient
    (matching the reference's torch.no_grad Procrustes), the stretch term is
    differentiable.
    """
    src = edge_matrix(nodes_sequence[0], conn)

    def one(tgt_nodes):
        R = jax.lax.stop_gradient(estimate_rotations(nodes_sequence[0], tgt_nodes, conn))
        tgt = edge_matrix(tgt_nodes, conn)
        stretch = tgt - jnp.einsum("nab,nkb->nka", R, src)
        return jnp.sum(conn.weight * jnp.sum(stretch**2, axis=-1))

    return jnp.sum(jax.vmap(one)(nodes_sequence[1:]))


def arap_deformation_loss(
    trajectory: jax.Array,
    key: jax.Array,
    trajectory_rot: jax.Array | None = None,
    K: int = 50,
) -> tuple[jax.Array, jax.Array]:
    """ARAP energy between frame 0 and a random frame of a node trajectory.

    trajectory: (N, T, 3). Returns (arap_error, rot_error*100) where the rot
    term compares best-fit rotations against MLP-predicted ones (only when
    trajectory_rot given).
    """
    n, T, _ = trajectory.shape
    init = trajectory[:, 0]
    fid = jax.random.randint(key, (), 1, T)
    tar = jnp.take_along_axis(trajectory, fid[None, None, None].repeat(n, 0), axis=1)[:, 0]
    K = min(K, n - 1)
    radius = jnp.linalg.norm(jnp.max(init, axis=0) - jnp.min(init, axis=0)) / 8.0
    conn = connectivity_from_points(
        jax.lax.stop_gradient(init),
        radius=radius,
        K=K,
        trajectory=jax.lax.stop_gradient(trajectory),
    )
    src = edge_matrix(init, conn)
    tgt = edge_matrix(tar, conn)
    R = jax.lax.stop_gradient(estimate_rotations(init, tar, conn))
    stretch = tgt - jnp.einsum("nab,nkb->nka", R, src)
    err = jnp.sum(jnp.mean(conn.weight[..., None] * stretch**2, axis=0))
    if trajectory_rot is not None:
        init_rot = quat_to_rotmat(trajectory_rot[:, 0])
        tar_rot = quat_to_rotmat(
            jnp.take_along_axis(trajectory_rot, fid[None, None, None].repeat(n, 0), axis=1)[:, 0]
        )
        rot_err = jnp.sum(jnp.mean((jnp.einsum("nab,nbc->nac", R, init_rot) - tar_rot) ** 2, axis=0))
    else:
        rot_err = jnp.zeros(())
    return err, rot_err * 1e2


def geodesic_floyd(points: jax.Array, K: int = 8) -> jax.Array:
    """All-pairs geodesic distance over the KNN graph (Floyd-Warshall as a
    lax.fori_loop of dense min-plus relaxations — N<=512 nodes)."""
    n = points.shape[0]
    d2, idx = knn(points, points, K + 1)
    d = jnp.sqrt(d2)
    mat = jnp.full((n, n), jnp.inf)
    rows = jnp.arange(n)[:, None].repeat(K + 1, 1)
    mat = mat.at[rows.reshape(-1), idx.reshape(-1)].min(d.reshape(-1))
    mat = jnp.minimum(mat, mat.T)

    def body(i, m):
        return jnp.minimum(m, m[:, i, None] + m[None, i, :])

    return jax.lax.fori_loop(0, n, body, mat)
