"""Tests for MST + skeleton-tree extraction on synthetic trajectories."""
import numpy as np
import pytest

from riggs_tpu.skeleton.mst import prim_mst, build_tree
from riggs_tpu.skeleton.extract import (
    adjust_arrow_dir,
    compute_average_edge_length,
    compute_insert_points,
    obtain_skeleton_tree,
    prune_tree,
    simplify_tree,
)


class TestPrim:
    def test_chain(self):
        # 4 points on a line: MST must be the chain
        cost = np.array(
            [
                [0, 1, 2, 3],
                [1, 0, 1, 2],
                [2, 1, 0, 1],
                [3, 2, 1, 0],
            ],
            float,
        )
        parents = prim_mst(cost, 0)
        assert parents[0] == -1
        # every non-root connects to an adjacent node
        for i in range(1, 4):
            assert abs(parents[i] - i) == 1

    def test_total_weight_minimal(self, rng):
        pts = rng.normal(size=(12, 2))
        cost = np.linalg.norm(pts[:, None] - pts[None], axis=-1)
        parents = prim_mst(cost, 0)
        w = sum(cost[i, parents[i]] for i in range(12) if parents[i] >= 0)
        # compare against scipy's MST if available; else sanity bound
        try:
            from scipy.sparse.csgraph import minimum_spanning_tree

            ref = minimum_spanning_tree(cost).sum()
            np.testing.assert_allclose(w, ref, rtol=1e-6)
        except ImportError:
            assert w < cost[cost > 0].mean() * 12

    def test_root_is_two(self):
        cost = np.ones((5, 5)) - np.eye(5)
        parents = build_tree(cost)
        assert parents[2] == -1


def make_synthetic_trajectories(n_frames=6):
    """A plus-sign shaped articulated 'body': spine + two arms, sampled densely,
    with limb-dependent motion."""
    rng = np.random.default_rng(0)
    segs = {
        "spine": (np.array([0.0, -1.0, 0.0]), np.array([0.0, 1.0, 0.0]), 28),
        "left": (np.array([0.0, 0.3, 0.0]), np.array([-1.0, 0.3, 0.0]), 18),
        "right": (np.array([0.0, 0.3, 0.0]), np.array([1.0, 0.3, 0.0]), 18),
    }
    pts, labels = [], []
    for li, (name, (a, b, n)) in enumerate(segs.items()):
        t = np.linspace(0, 1, n)[:, None]
        pts.append(a + t * (b - a) + rng.normal(size=(n, 3)) * 0.01)
        labels.append(np.full(n, li))
    nodes = np.concatenate(pts).astype(np.float32)
    labels = np.concatenate(labels)
    # trajectories: arms swing in opposite phases
    frames = []
    for f in range(n_frames):
        ang = 0.5 * np.sin(2 * np.pi * f / n_frames)
        cur = nodes.copy()
        for sign, lab in ((1, 1), (-1, 2)):
            m = labels == lab
            x = cur[m]
            c, s = np.cos(sign * ang), np.sin(sign * ang)
            R = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])
            pivot = np.array([0.0, 0.3, 0.0])
            cur[m] = (x - pivot) @ R.T + pivot
        frames.append(cur)
    return nodes, np.stack(frames).astype(np.float32), labels


class TestExtraction:
    def test_obtain_skeleton_tree(self):
        nodes, traj, labels = make_synthetic_trajectories()
        joints, parents, idx = obtain_skeleton_tree(nodes, traj, None)
        J = len(joints)
        assert 3 <= J <= 30, J
        assert parents[0] == -1
        # valid topological order: parents precede children
        assert all(parents[i] < i for i in range(1, J))
        # joints span the shape: some joint near each limb tip
        for tip in ([0, -1, 0], [0, 1, 0], [-1, 0.3, 0], [1, 0.3, 0]):
            d = np.linalg.norm(joints - np.array(tip), axis=-1).min()
            assert d < 0.45, (tip, d)

    def test_with_semantics(self):
        nodes, traj, labels = make_synthetic_trajectories()
        joints, parents, idx = obtain_skeleton_tree(nodes, traj, labels)
        assert parents[0] == -1
        assert all(parents[i] < i for i in range(1, len(joints)))

    def test_prune_removes_short_dangles(self):
        # long chain 0..8 with a 2-node dangle (9, 10) off junction node 3.
        # The main tail (8<-7<-6<-5<-4) is > 4 hops from the junction so it
        # survives; the short dangle is removed.
        parents = [-1, 0, 1, 2, 3, 4, 5, 6, 7, 3, 9]
        nodes = np.zeros((11, 3))
        nodes[:9, 0] = np.arange(9)
        nodes[9] = [3, 1, 0]
        nodes[10] = [3, 2, 0]
        traj = np.tile(nodes[None], (2, 1, 1))
        newp = prune_tree(nodes.copy(), traj, parents)
        assert newp[10] == -2 and newp[9] == -2  # dangle removed
        assert newp[8] == 7  # main tail intact

    def test_insert_points_straight_line(self):
        # straight chain: single edge end-to-end
        path = list(range(10))
        pts = np.zeros((2, 10, 3))
        pts[:, :, 0] = np.arange(10)
        edges = compute_insert_points(path, pts, dist_thres=0.5, num_thres=3)
        assert edges == [[0, 9]]

    def test_insert_points_corner(self):
        # an L-shape: should split near the corner
        path = list(range(11))
        pts = np.zeros((1, 11, 3))
        pts[0, :6, 0] = np.arange(6)
        pts[0, 6:, 0] = 5
        pts[0, 6:, 1] = np.arange(1, 6)
        edges = compute_insert_points(path, pts, dist_thres=0.5, num_thres=3)
        assert len(edges) >= 2
        flat = {i for e in edges for i in e}
        assert any(4 <= i <= 6 for i in flat - {0, 10})

    def test_avg_edge_length(self):
        parents = [-1, 0, 1]
        pts = np.zeros((2, 3, 3))
        pts[:, 1, 0] = 1.0
        pts[:, 2, 0] = 3.0
        per_edge, avg = compute_average_edge_length(pts, parents)
        np.testing.assert_allclose(per_edge[1:], [1.0, 2.0])
        np.testing.assert_allclose(avg, 1.5)


class TestTopologies:
    """Joint counts pinned per synthetic topology, and the exposed
    prune/simplify knobs recover detail on small scenes (round-1 verdict
    item 9: the 64-node chain used to collapse to 2 joints with no recourse)."""

    @staticmethod
    def _animate(nodes, n_frames=8, amp=0.15, seed=0):
        rng = np.random.default_rng(seed)
        traj = [nodes]
        for f in range(1, n_frames):
            phase = f / n_frames * 2 * np.pi
            bend = np.stack(
                [
                    np.sin(nodes[:, 1] * 2.5 + phase) * amp,
                    np.zeros(len(nodes)),
                    np.cos(nodes[:, 1] * 1.5 + phase) * amp * 0.5,
                ],
                -1,
            )
            traj.append(nodes + bend + rng.normal(scale=1e-3, size=nodes.shape))
        return np.stack(traj).astype(np.float32)

    def test_chain_keeps_more_joints_with_lower_simplify_thres(self):
        from riggs_tpu.skeleton.extract import obtain_skeleton_tree

        nodes = np.stack(
            [np.zeros(64), np.linspace(-1, 1, 64), np.zeros(64)], -1
        ).astype(np.float32)
        traj = self._animate(nodes)
        j_default, p_default, _ = obtain_skeleton_tree(nodes, traj)
        j_fine, p_fine, _ = obtain_skeleton_tree(nodes, traj, simplify_dist_thres=0.05)
        assert len(j_fine) > len(j_default)
        assert len(j_fine) >= 6  # a bending chain must keep intermediate joints
        # valid tree: root parent -1, others point backward
        assert p_fine[0] == -1 and (np.asarray(p_fine[1:]) < np.arange(1, len(j_fine))).all()

    def test_star_keeps_all_arms(self):
        from riggs_tpu.skeleton.extract import obtain_skeleton_tree

        arms = []
        for k in range(5):
            ang = 2 * np.pi * k / 5
            t = np.linspace(0.15, 1.0, 10)[:, None]
            arms.append(t * np.array([np.cos(ang), np.sin(ang), 0.0]))
        nodes = np.concatenate([[[0.0, 0, 0]]] + arms).astype(np.float32)
        traj = self._animate(nodes, amp=0.1)
        joints, parents, _ = obtain_skeleton_tree(
            nodes, traj, leaf_prune_hops=2, simplify_dist_thres=0.3
        )
        leaves = set(range(len(joints))) - set(int(p) for p in parents[1:])
        assert len(leaves) >= 4  # the arms survive as distinct branches
        assert 5 <= len(joints) <= 40

    def test_biped_keeps_limbs(self):
        from riggs_tpu.skeleton.extract import obtain_skeleton_tree

        spine = np.stack([np.zeros(12), np.linspace(-0.2, 1.0, 12), np.zeros(12)], -1)
        def limb(ox, oy, dx, dy, n=8):
            t = np.linspace(0.08, 0.7, n)
            return np.stack([ox + dx * t, oy + dy * t, np.zeros(n)], -1)
        nodes = np.concatenate(
            [spine, limb(0, 1.0, 0.8, -0.2), limb(0, 1.0, -0.8, -0.2),
             limb(0, -0.2, 0.5, -0.9), limb(0, -0.2, -0.5, -0.9)]
        ).astype(np.float32)
        traj = self._animate(nodes, amp=0.12)
        joints, parents, _ = obtain_skeleton_tree(
            nodes, traj, leaf_prune_hops=2, simplify_dist_thres=0.3
        )
        leaves = set(range(len(joints))) - set(int(p) for p in parents[1:])
        assert len(leaves) >= 4  # two arms + two legs (+ head) remain
        assert len(joints) >= 7


class TestInsertPointRepair:
    def test_feasibility_repair_saves_a_joint(self):
        """When the score-chosen split leaves a half over threshold but a
        feasible single split exists, the repair must take it (deliberate
        divergence from the reference's unconditional greedy recursion —
        found via the r3 J=4-on-the-3-joint-fixture regression)."""
        from riggs_tpu.skeleton.extract import _span_max_dev, compute_insert_points

        n = 11
        x = np.arange(n, dtype=np.float32)
        y = np.minimum(x, 10 - x) * 0.5  # tent: true bend (apex) at node 5
        z = np.zeros(n, np.float32)
        z[9] = 2.25  # near-endpoint spike: wins the d_end-penalized score
        pts = np.stack([x, y, z], -1)[None]  # (1 frame, n, 3)
        path = list(range(n))
        thres = 2.3
        # the fixture is adversarial by construction: greedy's split (node 9)
        # leaves [0, 9] over threshold while splitting at the bend satisfies
        # both halves
        assert _span_max_dev(pts, path, 0, 9) >= thres
        assert _span_max_dev(pts, path, 0, 5) < thres
        assert _span_max_dev(pts, path, 5, 10) < thres
        edges = compute_insert_points(path, pts, thres, 5)
        assert sorted(edges) == [[0, 5], [5, 10]], edges


class TestDissolveDegree2:
    def _run(self, ys):
        """5-node pruned chain 0-1-2-3-4 with joints {0, 2, 4}; returns the
        joint parents after dissolution (thres 0.1)."""
        from riggs_tpu.skeleton.extract import dissolve_degree2_joints

        x = np.arange(5, dtype=np.float32)
        pts = np.stack([x, np.asarray(ys, np.float32), np.zeros(5, np.float32)], -1)[None]
        tree_parents = np.array([-1, 0, 1, 2, 3])
        joint_parents = np.array([-1, -2, 0, -2, 2])
        return dissolve_degree2_joints(pts, tree_parents, joint_parents, 0.1)

    def test_collinear_joint_dissolved(self):
        out = self._run([0.0, 0.0, 0.0, 0.0, 0.0])
        alive = [i for i in range(5) if out[i] > -2]
        assert alive == [0, 4], out
        assert out[0] == -1 and out[4] == 0

    def test_bent_joint_kept(self):
        out = self._run([0.0, 0.0, 0.5, 0.0, 0.0])  # bend at the joint
        alive = [i for i in range(5) if out[i] > -2]
        assert alive == [0, 2, 4], out

    def test_junction_never_dissolved(self):
        """Degree-3 joints are structural; only degree-2 ones are tested."""
        from riggs_tpu.skeleton.extract import dissolve_degree2_joints

        # star: center 0 with three straight 2-node arms (all collinear
        # pairwise through the center, but degree 3 -> kept)
        pts = np.array(
            [[0, 0, 0], [1, 0, 0], [2, 0, 0], [-1, 0, 0], [-2, 0, 0],
             [0, 1, 0], [0, 2, 0]], np.float32
        )[None]
        tree_parents = np.array([-1, 0, 1, 0, 3, 0, 5])
        joint_parents = np.array([-1, -2, 0, -2, 0, -2, 0])
        out = dissolve_degree2_joints(pts, tree_parents, joint_parents, 10.0)
        alive = sorted(i for i in range(7) if out[i] > -2)
        assert alive == [0, 2, 4, 6], out
