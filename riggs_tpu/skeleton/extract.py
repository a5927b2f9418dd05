"""Skeleton-tree extraction from learned node trajectories (stage 1 -> 2).

Numpy re-implementation of /root/reference/skeleton_utils/
extract_skeleton_utils.py:1-472 — the offline pipeline that turns the stage-1
control nodes into a sparse kinematic tree:

  1. FPS-subsample nodes to <= 200 candidates;
  2. edge cost = mean pairwise distance of node *trajectories* over frames;
  3. Prim MST (skeleton/mst.py);
  4. root re-selection at the junction with the longest BFS run to an
     endpoint + BFS reorder (``adjust_arrow_dir``);
  5. prune short dangling branches and merge adjacent junctions
     (``prune_tree``);
  6. simplify chains by recursive farthest-point edge insertion
     (``compute_insert_points`` / ``simplify_tree``);
  7. optional symmetry correction using per-node semantic labels
     (``apply_symmetry``);
  8. final BFS reorder -> (joints, parents, original node indices).

Runs once on the host between stages; arrays in, arrays out.
"""
from __future__ import annotations

from collections import deque

import numpy as np

from riggs_tpu.skeleton.mst import build_tree


# ---------------------------------------------------------------------------
# BFS reorder
# ---------------------------------------------------------------------------


def _neighbors(n: int, parents) -> list[list[int]]:
    nb = [[] for _ in range(n)]
    for i in range(n):
        pi = int(parents[i])
        if pi >= 0:
            nb[i].append(pi)
            nb[pi].append(i)
    return nb


def _bfs_run_length(start: int, ends: np.ndarray, nb: list[list[int]]) -> int:
    """Number of nodes enqueued before the BFS from ``start`` pops an endpoint
    (the reference's root score, extract_skeleton_utils.py:7-29)."""
    q = deque([start])
    visited = np.zeros(len(nb), bool)
    visited[start] = True
    count = 0
    while q:
        node = q.popleft()
        if ends[node]:
            return count
        for ni in nb[node]:
            if not visited[ni]:
                q.append(ni)
                visited[ni] = True
                count += 1
    return -1


def _bfs_reorder(root: int, nodes: np.ndarray, nb: list[list[int]], select_indices):
    """BFS from root -> (new_nodes, new_parents, new_indices); isolated nodes
    (no neighbors) are dropped (extract_skeleton_utils.py:31-56)."""
    q = deque([root])
    visited = np.zeros(len(nb), bool)
    visited[root] = True
    new_nodes, new_parents, new_indices = [], [-1], []
    while q:
        node = q.popleft()
        if len(nb[node]) == 0:
            continue
        new_nodes.append(nodes[node])
        new_indices.append(int(select_indices[node]))
        for ni in nb[node]:
            if not visited[ni]:
                q.append(int(ni))
                visited[ni] = True
                new_parents.append(len(new_nodes) - 1)
    return new_nodes, new_parents, new_indices


def adjust_arrow_dir(nodes: np.ndarray, parents, select_indices):
    """Re-root at the junction whose BFS reaches an endpoint latest, then
    BFS-reorder so parents always precede children."""
    n = len(nodes)
    nb = _neighbors(n, parents)
    deg = np.array([len(nb[i]) for i in range(n)])
    junctions = deg >= 3
    ends = deg == 1
    candidates = np.nonzero(junctions)[0]
    if len(candidates) == 0:
        # a pure chain: root at one end (the reference always has junctions;
        # chains appear in tiny synthetic scenes)
        candidates = np.nonzero(ends)[0]
        if len(candidates) == 0:
            candidates = np.array([0])
    scores = [_bfs_run_length(int(i), ends, nb) for i in candidates]
    root = int(candidates[int(np.argmax(scores))])
    return _bfs_reorder(root, nodes, nb, select_indices)


# ---------------------------------------------------------------------------
# Pruning
# ---------------------------------------------------------------------------


def _children_of(parents) -> tuple[list[list[int]], np.ndarray]:
    ch = [[] for _ in range(len(parents))]
    for i, pi in enumerate(parents):
        if pi >= 0:
            ch[int(pi)].append(i)
    return ch, np.array([len(c) for c in ch])


def compute_average_edge_length(all_points: np.ndarray, parents):
    """Per-edge mean-over-frames length + global mean. all_points: (F, K, 3)."""
    parents = np.asarray(parents)
    select = parents >= 0
    pp = all_points[:, parents[select]]
    pc = all_points[:, select]
    edge_len = np.linalg.norm(pp - pc, axis=-1).mean(axis=0)
    all_edge = np.zeros(len(parents))
    all_edge[select] = edge_len
    return all_edge, float(edge_len.mean()) if edge_len.size else 0.0


def prune_tree(
    nodes: np.ndarray,
    all_points: np.ndarray,
    parents,
    leaf_prune_hops: int = 4,
    junction_merge_hops: int = 3,
):
    """Remove short dangling leaf chains (< ``leaf_prune_hops`` nodes back to
    a junction) and merge junctions separated by <= ``junction_merge_hops``
    pass-through nodes, averaging their positions
    (extract_skeleton_utils.py:319-423; the hop constants are the reference's
    literals 4 and 3, exposed so small/simple scenes can keep more joints —
    round-1 verdict item 9). ``nodes`` is modified in place (junction merge
    repositions); removed nodes get parent -2."""
    new_parents = np.asarray(parents).copy()
    children, _ = _children_of(parents)
    edge_length, _ = compute_average_edge_length(all_points, parents)

    # pass 1: drop leaf chains that hit a junction within 4 hops
    for idx in range(len(parents)):
        if len(children[idx]) == 0:
            pi = int(parents[idx])
            ci = idx
            passing = []
            prune = False
            while pi >= 0 and len(passing) < leaf_prune_hops:
                if len(children[pi]) > 1:
                    prune = True
                    break
                passing.append(pi)
                ci = pi
                pi = int(parents[ci])
            if prune:
                new_parents[idx] = -2
                if idx in children[int(parents[idx])]:
                    children[int(parents[idx])].remove(idx)
                for p in passing:
                    new_parents[p] = -2
                    if p in children[int(parents[p])]:
                        children[int(parents[p])].remove(p)

    # pass 2: merge junction pairs joined by <= 3 single-child pass nodes
    visited = np.zeros(len(parents))
    for k in range(len(parents)):
        ci = len(parents) - 1 - k
        pi = int(new_parents[ci])
        if pi < 0 or visited[ci] > 0 or visited[pi] > 0:
            continue
        if len(children[ci]) <= 1:
            continue
        passing = []
        end_junction = -2
        while len(passing) < junction_merge_hops:
            if pi < 0:
                break
            if len(children[pi]) == 1:
                passing.append(pi)
                pi = int(new_parents[pi])
            elif len(children[pi]) > 1:
                end_junction = pi
                break
            else:
                break
        if end_junction > -1:
            pos = nodes[ci] + nodes[end_junction]
            for p in passing:
                pos = pos + nodes[p]
            nodes[end_junction] = pos / (2 + len(passing))
            visited[end_junction] = 1
            visited[ci] = 1
            for cci in children[ci]:
                if cci not in children[end_junction]:
                    children[end_junction].append(cci)
                    new_parents[cci] = end_junction
            new_parents[ci] = -2
            children[ci] = []
            for p in passing:
                pp = int(new_parents[p])
                if pp >= 0 and p in children[pp]:
                    children[pp].remove(p)
                visited[p] = 1
                new_parents[p] = -2
                children[p] = []
    return new_parents


# ---------------------------------------------------------------------------
# Simplification
# ---------------------------------------------------------------------------


def _segment_dist(a: np.ndarray, b: np.ndarray, pts: np.ndarray) -> np.ndarray:
    """Mean-over-frames distance of pts to segment [a, b]; all (F, n, 3)."""
    ab = b - a
    denom = np.maximum((ab * ab).sum(-1, keepdims=True), 1e-6)
    t = ((pts - a) * ab).sum(-1, keepdims=True) / denom
    t = np.clip(t, 0.0, 1.0)
    s = a + t * ab
    return np.sqrt(((s - pts) ** 2).sum(-1) + 1e-6)


def _span_max_dev(all_points: np.ndarray, path, a: int, b: int) -> float:
    """Max mean-over-frames deviation of path[a+1:b] from segment [a, b]."""
    if b - a < 2:
        return 0.0
    pa = all_points[:, path[a] : path[a] + 1]
    pb = all_points[:, path[b] : path[b] + 1]
    pab = all_points[:, path[a + 1 : b]]
    return float(_segment_dist(pa, pb, pab).mean(0).max())


def compute_insert_points(path, all_points: np.ndarray, dist_thres: float, num_thres: int):
    """Recursive farthest-point polyline simplification of one chain
    (extract_skeleton_utils.py:122-161). Returns local-index edge pairs."""
    edges_idxs = []
    q = deque([[0, len(path) - 1]])
    while q:
        a, b = q.popleft()
        if b - a < 2:
            edges_idxs.append([a, b])
            continue
        pa = all_points[:, path[a] : path[a] + 1]
        pb = all_points[:, path[b] : path[b] + 1]
        pab = all_points[:, path[a + 1 : b]]
        d_ab = _segment_dist(pa, pb, pab).mean(0)
        d_a = np.linalg.norm(pab - pa, axis=-1).mean(0)
        d_b = np.linalg.norm(pab - pb, axis=-1).mean(0)
        d_end = np.minimum(d_a, d_b)
        score = d_ab - 0.1 * d_end
        if d_ab.max() < dist_thres:
            edges_idxs.append([a, b])
            continue
        if len(edges_idxs) > num_thres:
            # the reference drops pending segments here
            # (extract_skeleton_utils.py:155-156), disconnecting part of the
            # chain when the edge budget is hit; emit the unsplit segment
            # instead so the tree stays connected (same result whenever the
            # budget is not exceeded)
            edges_idxs.append([a, b])
            continue
        mid = int(np.argmax(score)) + a + 1
        # Feasibility repair (deliberate divergence from the reference,
        # which recurses unconditionally on the score-chosen split): when
        # that split leaves a half at/above threshold but SOME single split
        # satisfies both halves, take the best-scoring feasible split — one
        # joint instead of two on borderline chains. Found via the r3 red
        # fixture: the 3-joint stick figure's learned chain had a feasible
        # single split (max dev 28% under threshold) while the greedy choice
        # left its far half 0.2% over, inserting a 4th joint.
        if (
            _span_max_dev(all_points, path, a, mid) >= dist_thres
            or _span_max_dev(all_points, path, mid, b) >= dist_thres
        ):
            feas = [
                m
                for m in range(a + 1, b)
                if _span_max_dev(all_points, path, a, m) < dist_thres
                and _span_max_dev(all_points, path, m, b) < dist_thres
            ]
            if feas:
                mid = max(feas, key=lambda m: float(score[m - a - 1]))
        q.append([a, mid])
        q.append([mid, b])
    return edges_idxs


def _path_arclength(all_points: np.ndarray, path) -> np.ndarray:
    pa = all_points[:, path[:-1]]
    pb = all_points[:, path[1:]]
    diff = np.linalg.norm(pa - pb, axis=-1).mean(0)
    out = np.zeros(len(path))
    out[1:] = np.cumsum(diff)
    return out


def pair_limbs(paths, edge_idxs, semantic_label, length_thres=0.7, semantic_thres=0.6):
    """Greedy limb pairing by length ratio + semantic-label overlap
    (the selection half of extract_skeleton_utils.py:177-255). Exposed
    separately so the k-means-vs-ground-truth semantic gap can be measured
    directly on the pairing decision (scripts/eval_semseg_gap.py)."""
    semantics = [np.asarray(semantic_label)[path] for path in paths]
    pairs = []
    visited = np.zeros(len(paths), int)
    for i in range(len(paths)):
        if visited[i]:
            continue
        best_score, best_j = 0.0, -1
        for j in range(i + 1, len(paths)):
            if len(edge_idxs[i]) == 1 and len(edge_idxs[j]) == 1:
                continue
            li, lj = len(paths[i]), len(paths[j])
            length_ratio = 1.0 - abs(li - lj) / (max(li, lj) + 1e-10)
            if length_ratio > length_thres:
                si, sj = np.unique(semantics[i]), np.unique(semantics[j])
                inter = np.intersect1d(si, sj)
                sem_score = len(inter) / (max(len(si), len(sj)) + 1e-10)
                if sem_score > semantic_thres:
                    score = length_ratio + sem_score
                    if score > best_score:
                        best_score, best_j = score, j
        if best_j >= 0:
            pairs.append([i, best_j])
            visited[best_j] = 1
    return pairs


def apply_symmetry(paths, edge_idxs, all_points, semantic_label, length_thres=0.7, semantic_thres=0.6):
    """Pair up limbs of similar length and semantics; copy the better-simplified
    limb's joint placement onto its partner by normalized arclength
    (extract_skeleton_utils.py:177-255)."""
    pairs = pair_limbs(paths, edge_idxs, semantic_label, length_thres, semantic_thres)

    for a, b in pairs:
        sel, oth = (a, b) if abs(len(edge_idxs[a]) - 2) < abs(len(edge_idxs[b]) - 2) else (b, a)
        sorted_edges = sorted(edge_idxs[sel], key=lambda e: e[0])
        d_sel = _path_arclength(all_points, paths[sel])
        d_oth = _path_arclength(all_points, paths[oth])
        if d_sel[-1] <= 0 or d_oth[-1] <= 0:
            continue
        d_sel = d_sel / d_sel[-1]
        d_oth = d_oth / d_oth[-1]
        new_idxs = []
        last = len(paths[oth]) - 1
        for i in range(len(sorted_edges)):
            if i == 0:
                s = 0
            else:
                s = int(np.argmin(np.abs(d_sel[sorted_edges[i][0]] - d_oth)))
            e = int(np.argmin(np.abs(d_sel[min(sorted_edges[i][1], len(d_sel) - 1)] - d_oth)))
            new_idxs.append([min(s, last), min(e, last)])
        edge_idxs[oth] = new_idxs
    return edge_idxs


def simplify_tree(
    all_points: np.ndarray, parents, semantic_label=None, dist_thres=1.0, max_edges=3
):
    """Chain-wise simplification between key points (junctions/leaves), with
    optional symmetry correction. Returns new parents (-2 = removed)."""
    children, children_num = _children_of(parents)
    key_points = children_num > 1
    _, avg_edge = compute_average_edge_length(all_points, parents)

    paths = []
    for idx in range(len(parents)):
        pi = int(parents[idx])
        if pi < 0:
            continue
        if len(children[idx]) == 0 or key_points[idx]:
            path = [idx]
            while True:
                path.append(pi)
                if pi < 0 or key_points[pi]:
                    break
                pi = int(parents[pi])
            if path[-1] < 0:
                # walked past the root (root wasn't a junction — happens on
                # chain-shaped trees): end the path at the root itself
                path = path[:-1]
            if len(path) >= 2:
                paths.append(path)

    new_parents = -2 * np.ones(len(parents), np.int64)
    edge_idxs = []
    for path in paths:
        edge_idxs.append(
            compute_insert_points(path, all_points, dist_thres * avg_edge, max_edges)
        )
    if semantic_label is not None:
        edge_idxs = apply_symmetry(paths, edge_idxs, all_points, semantic_label)
    for i, eis in enumerate(edge_idxs):
        for e in eis:
            a = min(e[0], len(paths[i]) - 1)
            b = min(e[1], len(paths[i]) - 1)
            new_parents[paths[i][a]] = paths[i][b]
    new_parents[0] = -1
    return new_parents


def dissolve_degree2_joints(all_points, tree_parents, joint_parents, dist_thres):
    """Remove redundant degree-2 joints — including ACROSS junctions, which
    per-path simplification structurally cannot merge (``simplify_tree``
    splits chains at key points and keeps every junction). A joint j with
    exactly two neighbors u, w is dissolved when every pruned-tree node on
    the u..w chain stays within ``dist_thres`` (trajectory-mean) of segment
    (u, w). Together with the insert-point feasibility repair this makes the
    returned joint set MINIMAL under the deviation semantics: no single
    joint can be removed without violating the threshold.

    No reference counterpart: the reference keeps every MST junction; on
    noisy learned chains the junction can sit mid-bone, leaving a spurious
    elbow (the r3 J=4-on-the-3-joint-fixture finding).

    all_points: (F, K, 3) trajectories; tree_parents: pruned-tree parents
    (-2 removed); joint_parents: simplified-tree parents (-2 removed).
    Returns new joint parents (any orientation; callers BFS-reorder).
    """
    jp = np.asarray(joint_parents).copy()
    n = len(jp)
    nb = {i: set() for i in range(n) if jp[i] > -2}
    for i in list(nb):
        p = int(jp[i])
        if p >= 0:
            nb[i].add(p)
            nb[p].add(i)
    pn = [[] for _ in range(n)]
    for i in range(n):
        p = int(tree_parents[i])
        if p >= 0:
            pn[i].append(p)
            pn[p].append(i)

    def chain(u, w):
        """The unique pruned-tree path u..w (passes through the joint between
        them: joint edges are pruned-tree sub-chains)."""
        prev = {u: None}
        q = deque([u])
        while q:
            x = q.popleft()
            if x == w:
                break
            for y in pn[x]:
                if y not in prev:
                    prev[y] = x
                    q.append(y)
        path = [w]
        while path[-1] != u:
            path.append(prev[path[-1]])
        return path[::-1]

    changed = True
    while changed:
        changed = False
        for j in sorted(nb):
            if len(nb[j]) != 2:
                continue
            u, w = sorted(nb[j])
            inter = chain(u, w)[1:-1]  # always contains j itself
            pa = all_points[:, u : u + 1]
            pb = all_points[:, w : w + 1]
            dev = float(_segment_dist(pa, pb, all_points[:, inter]).mean(0).max())
            if dev < dist_thres:
                nb[u].discard(j)
                nb[w].discard(j)
                nb[u].add(w)
                nb[w].add(u)
                del nb[j]
                changed = True
                break

    out = -2 * np.ones(n, np.int64)
    if not nb:
        return out
    root = 0 if 0 in nb else min(nb)
    out[root] = -1
    q = deque([root])
    seen = {root}
    while q:
        x = q.popleft()
        for y in nb[x]:
            if y not in seen:
                seen.add(y)
                out[y] = x
                q.append(y)
    return out


# ---------------------------------------------------------------------------
# Top level
# ---------------------------------------------------------------------------


def obtain_skeleton_tree(
    nodes: np.ndarray,
    all_deformed_nodes: np.ndarray,
    seg_labels: np.ndarray | None = None,
    max_candidates: int = 200,
    fps_fn=None,
    leaf_prune_hops: int = 4,
    junction_merge_hops: int = 3,
    simplify_dist_thres: float = 1.0,
    simplify_max_edges: int = 3,
):
    """nodes (K, 3) rest positions; all_deformed_nodes (F, K, 3) trajectories;
    seg_labels (K,) optional semantic part labels.

    Returns (joints (J, 3), parents (J,), joint_node_indices (J,)).
    """
    K = nodes.shape[0]
    indices = np.arange(K)
    if K > max_candidates:
        if fps_fn is None:
            from riggs_tpu.ops.fps import farthest_point_sample
            import jax.numpy as jnp

            fps_fn = lambda pts, n: np.asarray(farthest_point_sample(jnp.asarray(pts), n))
        sample = fps_fn(nodes, max_candidates)
    else:
        sample = indices
    sel_nodes = nodes[sample].copy()
    sel_traj = all_deformed_nodes[:, sample]
    diff = sel_traj[:, :, None, :] - sel_traj[:, None, :, :]
    mean_dist = np.linalg.norm(diff, axis=-1).mean(axis=0)

    parents = build_tree(mean_dist)
    sel_indices = indices[sample]
    r_nodes, r_parents, r_indices = adjust_arrow_dir(sel_nodes, parents, sel_indices)
    r_nodes = np.stack(r_nodes)
    r_traj = all_deformed_nodes[:, r_indices]

    p_parents = prune_tree(
        r_nodes, r_traj, r_parents,
        leaf_prune_hops=leaf_prune_hops,
        junction_merge_hops=junction_merge_hops,
    )
    seg = np.asarray(seg_labels)[r_indices] if seg_labels is not None else None
    s_parents = simplify_tree(
        r_traj, p_parents, seg, dist_thres=simplify_dist_thres, max_edges=simplify_max_edges
    )
    _, avg_edge = compute_average_edge_length(r_traj, p_parents)
    s_parents = dissolve_degree2_joints(
        r_traj, p_parents, s_parents, simplify_dist_thres * avg_edge
    )

    n_nodes, n_parents, n_indices = adjust_arrow_dir(r_nodes, s_parents, r_indices)
    return np.stack(n_nodes), np.asarray(n_parents), np.asarray(n_indices)
