"""Minimum-spanning-tree construction over node trajectory distances.

Behavioral equivalent of /root/reference/skeleton_utils/mst_utils.py:60-95
(primMST) and :352-361 (gene_tree): Prim's algorithm on a dense cost matrix
(mean pairwise trajectory distance), rooted at node 2, zero-cost edges
treated as absent. Vectorized numpy instead of the reference's O(K^2) python
min-scan (K <= 200, runs once between stages — clarity over speed, but the
argmin is vectorized anyway).
"""
from __future__ import annotations

import numpy as np


def prim_mst(cost: np.ndarray, init_id: int = 0) -> np.ndarray:
    """Prim MST. cost: (K, K) symmetric; entries <= 0 mean "no edge".

    Returns parents (K,) with parent[init_id] = -1.
    """
    K = cost.shape[0]
    INF = np.inf
    key = np.full(K, INF)
    parent = np.full(K, -1, np.int64)
    in_tree = np.zeros(K, bool)
    key[init_id] = 0.0
    for _ in range(K):
        masked = np.where(in_tree, INF, key)
        u = int(np.argmin(masked))
        if not np.isfinite(masked[u]):
            break  # disconnected remainder
        in_tree[u] = True
        row = cost[u]
        better = (~in_tree) & (row > 0) & (row < key)
        key[better] = row[better]
        parent[better] = u
    return parent


def build_tree(cost: np.ndarray, init_id: int = 2) -> np.ndarray:
    """gene_tree equivalent: MST rooted at node 2 (the reference's fixed seed).
    Dispatches to the native C++ Prim when built (identical output)."""
    init_id = min(init_id, cost.shape[0] - 1)
    from riggs_tpu import native

    if native.available():
        return native.prim_mst(np.asarray(cost, np.float32), init_id)
    return prim_mst(cost, init_id)
