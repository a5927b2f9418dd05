"""Quantify the k-means semantic-seg stand-in vs ground-truth part labels.

The reference segments parts by clustering DINO-ViT features
(/root/reference/process_data/cal_semantic_seg.py:104-153); those weights
are unfetchable here, so scripts/process_data.py ships a k-means-over-
(y, x, rgb) stand-in. The labels feed exactly ONE consumer: the symmetry
correction's limb pairing (extract_skeleton_utils.py:177-255 -> our
skeleton/extract.py pair_limbs). This script measures, on the synthetic
biped (known per-bone parts), the stand-in's damage at each stage
(VERDICT r2 item 9 / r3 item 8):

  1. node-label agreement (median-over-frames projected labels, greedy
     label matching) — k-means vs ground truth;
  2. limb-pairing decisions of pair_limbs with each label set;
  3. the extracted skeleton (J, parents) with each label set.

Deterministic, CPU-only, a few seconds. Record the numbers in BASELINE.md.
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from riggs_tpu.camera.camera import project_nodes_2d
from riggs_tpu.data.synthetic import (
    deform_points,
    make_biped_figure,
    pose_at_time,
    render_frame,
    ring_cameras,
)
from riggs_tpu.skeleton.extract import (
    _children_of,
    adjust_arrow_dir,
    compute_average_edge_length,
    compute_insert_points,
    obtain_skeleton_tree,
    pair_limbs,
    prune_tree,
)
from riggs_tpu.skeleton.mst import build_tree
from scripts.process_data import kmeans_semantic_seg

N_NODES = 64
N_FRAMES = 8
SIZE = 160
PARTS = 11


def build_paths(p_parents):
    """simplify_tree's chain construction (between key points), replicated
    for direct pair_limbs measurement."""
    children, children_num = _children_of(p_parents)
    key_points = children_num > 1
    paths = []
    for idx in range(len(p_parents)):
        pi = int(p_parents[idx])
        if pi < 0:
            continue
        if len(children[idx]) == 0 or key_points[idx]:
            path = [idx]
            while True:
                path.append(pi)
                if pi < 0 or key_points[pi]:
                    break
                pi = int(p_parents[pi])
            if path[-1] < 0:
                path = path[:-1]
            if len(path) >= 2:
                paths.append(path)
    return paths


def match_labels(pred, gt):
    """Greedy majority matching pred->gt label space; returns agreement."""
    pred = np.asarray(pred)
    gt = np.asarray(gt)
    mapping = {}
    for p in np.unique(pred):
        sel = pred == p
        vals, cnt = np.unique(gt[sel], return_counts=True)
        mapping[p] = vals[np.argmax(cnt)]
    mapped = np.array([mapping[p] for p in pred])
    return float((mapped == gt).mean())


def main():
    fig = make_biped_figure(0)
    rng = np.random.default_rng(1)
    sel = rng.choice(len(fig.points), N_NODES, replace=False)
    gt_node_part = fig.skin_idx[sel]

    cams = ring_cameras(4, width=SIZE, image_height=SIZE)
    ts = np.linspace(0, 1, N_FRAMES, endpoint=False)
    traj, node_lab_km, node_lab_gt = [], [], []
    for i, t in enumerate(ts):
        pts = deform_points(fig, pose_at_time(fig, float(t)))
        traj.append(pts[sel])
        cam = cams[i % len(cams)]
        img = render_frame(fig, cam, float(t))
        seg_km = kmeans_semantic_seg(img, PARTS)
        # ground-truth seg: nearest projected figure point's part per pixel
        proj_all = np.asarray(project_nodes_2d(cam, pts))
        mask = img.sum(-1) > 0.05
        ys, xs = np.nonzero(mask)
        d2 = (ys[:, None] - proj_all[None, :, 0]) ** 2 + (
            xs[:, None] - proj_all[None, :, 1]
        ) ** 2
        seg_gt = np.zeros((SIZE, SIZE), np.int64)
        seg_gt[ys, xs] = fig.skin_idx[np.argmin(d2, 1)] + 1
        # node labels: sample both segs at projected node pixels
        pn = np.asarray(project_nodes_2d(cam, pts[sel])).astype(np.int64)
        pn[:, 0] = np.clip(pn[:, 0], 0, SIZE - 1)
        pn[:, 1] = np.clip(pn[:, 1], 0, SIZE - 1)
        node_lab_km.append(seg_km[pn[:, 0], pn[:, 1]])
        node_lab_gt.append(seg_gt[pn[:, 0], pn[:, 1]])
    traj = np.stack(traj)
    med_km = np.median(np.stack(node_lab_km), 0).astype(np.int64)
    med_gt = np.median(np.stack(node_lab_gt), 0).astype(np.int64)

    agree_vs_skin = match_labels(med_km, gt_node_part)
    agree_gtseg_vs_skin = match_labels(med_gt, gt_node_part)
    print(f"node-label agreement (k-means vs true parts): {agree_vs_skin:.3f}")
    print(f"node-label agreement (GT-seg projection vs true parts): {agree_gtseg_vs_skin:.3f}")

    # limb pairing on the SAME paths with each label set
    nodes = traj[0]
    diff = traj[:, :, None, :] - traj[:, None, :, :]
    mean_dist = np.linalg.norm(diff, axis=-1).mean(0)
    parents = build_tree(mean_dist)
    r_nodes, r_parents, r_idx = adjust_arrow_dir(nodes.copy(), parents, np.arange(N_NODES))
    r_nodes = np.stack(r_nodes)
    r_traj = traj[:, r_idx]
    p_parents = prune_tree(r_nodes, r_traj, r_parents)
    paths = build_paths(p_parents)
    _, avg_edge = compute_average_edge_length(r_traj, p_parents)
    edge_idxs = [compute_insert_points(p, r_traj, avg_edge, 3) for p in paths]
    km_r = np.asarray(med_km)[r_idx]
    gt_r = np.asarray(gt_node_part)[r_idx]
    pairs_km = sorted(map(tuple, pair_limbs(paths, edge_idxs, km_r)))
    pairs_gt = sorted(map(tuple, pair_limbs(paths, edge_idxs, gt_r)))
    same = set(pairs_km) == set(pairs_gt)
    print(f"limb paths: {len(paths)}; pairs GT={pairs_gt} kmeans={pairs_km} same={same}")

    for name, lab in [("none", None), ("gt", gt_node_part), ("kmeans", med_km)]:
        joints, par, _ = obtain_skeleton_tree(nodes, traj, lab)
        print(f"extraction[{name}]: J={len(joints)} parents={par.tolist()}")


if __name__ == "__main__":
    main()
