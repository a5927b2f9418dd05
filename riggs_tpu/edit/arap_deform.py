"""Interactive drag deformation: Laplacian editing + iterative ARAP solve.

Functional JAX re-design of /root/reference/lap_deform.py:96-236 (LapDeform)
and /root/reference/utils/arap_deform.py:38-171 (ARAPDeformer): a KNN graph
with learnable edge weights, a Laplacian built from them, and a local-global
ARAP solve (3 iterations of batched-SVD rotation fitting + a linear solve)
that drags handle points to target positions while the rest follows
as-rigidly-as-possible.

Handle constraints are imposed by Dirichlet row replacement (rows of the
Laplacian for handles become identity rows), which keeps every shape static
under jit — versus the reference's dynamic column elimination + lstsq; the
constrained solutions coincide.
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from riggs_tpu.ops.arap import Connectivity, connectivity_from_points, edge_matrix
from riggs_tpu.ops.geometry import fit_rotations
from riggs_tpu.ops.quaternion import rotmat_to_quat


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class ArapDeformer:
    verts: jax.Array  # (N, 3) rest positions
    nn_idx: jax.Array  # (N, K)
    weight: jax.Array  # (N, K) learnable edge weights
    valid: jax.Array  # (N, K)

    @property
    def conn(self) -> Connectivity:
        return Connectivity(nn_idx=self.nn_idx, weight=self.weight * self.valid, valid=self.valid)

    @property
    def laplacian(self) -> jax.Array:
        """L = I - W (rows scatter -w onto neighbor columns)."""
        n = self.verts.shape[0]
        L = jnp.eye(n)
        rows = jnp.arange(n)[:, None].repeat(self.nn_idx.shape[1], 1)
        w = self.weight * self.valid
        return L.at[rows.reshape(-1), self.nn_idx.reshape(-1)].add(-w.reshape(-1))


def make_deformer(verts: jax.Array, K: int = 16, radius: float | None = None, trajectory=None) -> ArapDeformer:
    if radius is None:
        radius = float(jnp.linalg.norm(jnp.max(verts, 0) - jnp.min(verts, 0)) / 8.0)
    conn = connectivity_from_points(verts, radius=radius, K=min(K, verts.shape[0] - 1), trajectory=trajectory)
    return ArapDeformer(verts=verts, nn_idx=conn.nn_idx, weight=conn.weight, valid=conn.valid)


def solve_with_handles(L: jax.Array, b: jax.Array, handle_idx: jax.Array, handle_pos: jax.Array) -> jax.Array:
    """Solve L x = b subject to x[handles] = handle_pos (Dirichlet rows)."""
    n = L.shape[0]
    is_handle = jnp.zeros(n, bool).at[handle_idx].set(True)
    eye = jnp.eye(n)
    A = jnp.where(is_handle[:, None], eye, L)
    rhs = b.at[handle_idx].set(handle_pos)
    return jnp.linalg.solve(A, rhs)


@partial(jax.jit, static_argnames=("num_iter", "return_rot"))
def deform_arap(
    deformer: ArapDeformer,
    handle_idx: jax.Array,
    handle_pos: jax.Array,
    num_iter: int = 3,
    return_rot: bool = True,
):
    """Drag handles to handle_pos; returns (positions, rotations-as-quats).

    The local-global loop of arap_deform.py:98-171: initialize with the
    Laplacian-editing solve, then alternate best-fit rotations (Procrustes)
    with the ARAP normal-equation solve b_i = 1/2 sum_k w_ik (R_i+R_j)(p_i-p_j).
    """
    L = deformer.laplacian
    conn = deformer.conn
    P = edge_matrix(deformer.verts, conn)  # (N, K, 3) rest edges
    p_prime = solve_with_handles(L, L @ deformer.verts, handle_idx, handle_pos)

    def body(p_prime, _):
        Pp = edge_matrix(p_prime, conn)
        cov = jnp.einsum("nka,nk,nkb->nab", Pp, conn.weight, P)
        R = fit_rotations(cov)
        Rsum = R[:, None] + R[conn.nn_idx]  # (N, K, 3, 3)
        b = 0.5 * jnp.sum(
            jnp.einsum("nkab,nkb->nka", Rsum, P) * conn.weight[..., None], axis=1
        )
        return solve_with_handles(L, b, handle_idx, handle_pos), R

    p_prime, Rs = jax.lax.scan(body, p_prime, None, length=num_iter)
    R_final = Rs[-1]
    if return_rot:
        return p_prime, rotmat_to_quat(R_final)
    return p_prime, None


def arap_energy(deformer: ArapDeformer, prev: jax.Array, cur: jax.Array) -> jax.Array:
    """ARAP energy between two configurations (for online weight optimization,
    LapDeform.energy_arap)."""
    from riggs_tpu.ops.arap import arap_error

    return arap_error(jnp.stack([prev, cur]), deformer.conn)


def optimize_weights(
    deformer: ArapDeformer, prev: jax.Array, cur: jax.Array, lr: float = 1e-3, steps: int = 1
) -> ArapDeformer:
    """One (or a few) gradient steps on the edge weights to better explain an
    observed deformation (the reference optimizes deformer.weight online)."""

    def loss(w):
        d = dataclasses.replace(deformer, weight=w)
        return arap_energy(d, prev, cur)

    w = deformer.weight
    for _ in range(steps):
        w = w - lr * jax.grad(loss)(w)
    return dataclasses.replace(deformer, weight=w)


def n_ring_neighbors(nn_idx: np.ndarray, idxs: np.ndarray, rings: int = 2) -> np.ndarray:
    """Expand a set of point indices by n rings of the KNN graph
    (LapDeform.add_n_ring_nbs)."""
    idxs = np.atleast_1d(np.asarray(idxs))
    for _ in range(rings):
        idxs = np.unique(np.concatenate([idxs, np.asarray(nn_idx)[idxs].reshape(-1)]))
    return idxs
