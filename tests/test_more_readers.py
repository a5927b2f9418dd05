"""DTU / plenopticVideo / CMU readers + RAFT flow store on tiny fixtures.

Covers the three remaining sceneLoadTypeCallbacks
(/root/reference/scene/dataset_readers.py:1171-1183) and the
raft_neighbouring/ flow wiring (/root/reference/scene/__init__.py:87-91).
"""
import json

import numpy as np
import pytest
from PIL import Image

from riggs_tpu.data.scene import load_scene


def _save_png(path, arr):
    Image.fromarray(arr).save(path)


@pytest.fixture
def dtu_dir(tmp_path):
    n = 3
    (tmp_path / "image").mkdir()
    (tmp_path / "mask").mkdir()
    cams = {}
    for i in range(n):
        img = (np.random.default_rng(i).random((32, 40, 3)) * 255).astype(np.uint8)
        _save_png(tmp_path / "image" / f"{i:06d}.png", img)
        _save_png(tmp_path / "mask" / f"{i:06d}.png", np.full((32, 40), 255, np.uint8))
        K = np.array([[40.0, 0, 20], [0, 40.0, 16], [0, 0, 1]])
        R = np.eye(3)
        t = np.array([0.1 * i, 0, 2.5])
        P = K @ np.concatenate([R, t[:, None]], axis=1)
        world = np.eye(4)
        world[:3, :4] = P
        cams[f"world_mat_{i}"] = world
        cams[f"scale_mat_{i}"] = np.eye(4)
        cams[f"fid_{i}"] = np.array(float(i))
    np.savez(tmp_path / "cameras_sphere.npz", **cams)
    return tmp_path


class TestDTU:
    def test_loads(self, dtu_dir):
        scene = load_scene(dtu_dir)
        assert len(scene.train_frames) == 3
        f = scene.train_frames[0]
        assert f.image.shape == (32, 40, 3)
        assert f.alpha_mask is not None
        assert scene.train_image_names == ["000000", "000001", "000002"]
        assert np.isfinite(np.asarray(f.cam.w2c)).all()
        # fids follow the reference normalization fid/(n/12-1)
        fids = [float(fr.cam.fid) for fr in scene.train_frames]
        assert fids[0] == 0.0 and fids[1] != fids[2]

    def test_projection_decomposition_roundtrip(self):
        from riggs_tpu.data.more_readers import decompose_projection

        rng = np.random.default_rng(0)
        K = np.array([[50.0, 0, 24], [0, 48.0, 18], [0, 0, 1]])
        # random rotation via QR
        Q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
        if np.linalg.det(Q) < 0:
            Q[:, 0] = -Q[:, 0]
        t = rng.normal(size=3)
        P = K @ np.concatenate([Q, t[:, None]], axis=1)
        K2, R2, c2 = decompose_projection(P)
        np.testing.assert_allclose(K2 / K2[2, 2], K, atol=1e-6)
        np.testing.assert_allclose(R2, Q, atol=1e-6)
        np.testing.assert_allclose(Q @ c2, -t, atol=1e-6)  # P @ [c;1] = 0


@pytest.fixture
def plenoptic_dir(tmp_path):
    n_cams, n_frames = 3, 4
    poses = np.zeros((n_cams, 3, 5))
    for i in range(n_cams):
        c2w = np.eye(4)
        c2w[0, 3] = 0.2 * i
        c2w[2, 3] = 2.0
        # store in LLFF convention: the reader applies [y,-x,z] swap; invert it
        m = np.concatenate([-c2w[:3, 1:2], c2w[:3, 0:1], c2w[:3, 2:4]], axis=1)
        poses[i, :, :4] = m
        poses[i, :, 4] = [24, 32, 30.0]  # H, W, focal
    bounds = np.ones((n_cams, 2))
    np.save(tmp_path / "poses_bounds.npy", np.concatenate([poses.reshape(n_cams, 15), bounds], axis=1))
    for i in range(n_cams):
        d = tmp_path / "frames" / f"cam{i:02d}"
        d.mkdir(parents=True)
        for f in range(n_frames):
            _save_png(d / f"{f:04d}.png", np.full((24, 32, 3), 40 * (f + 1), np.uint8))
    return tmp_path


class TestPlenoptic:
    def test_loads_with_holdout(self, plenoptic_dir):
        scene = load_scene(plenoptic_dir, num_images=4, hold_id=(0,))
        # 2 train cams x 4 frames, 1 test cam x 4 frames
        assert len(scene.train_frames) == 8
        assert len(scene.test_frames) == 4
        fids = sorted({float(f.cam.fid) for f in scene.train_frames})
        np.testing.assert_allclose(fids, [0.0, 1 / 3, 2 / 3, 1.0], atol=1e-6)
        assert scene.train_frames[0].image.shape == (24, 32, 3)


@pytest.fixture
def cmu_dir(tmp_path):
    n_t, n_c = 2, 2
    (tmp_path / "ims").mkdir()
    (tmp_path / "seg").mkdir()
    fn, ks, w2cs = [], [], []
    for t in range(n_t):
        fn.append([f"{c}/{t:06d}.jpg" for c in range(n_c)])
        (tmp_path / "ims" / f"{t}").mkdir(exist_ok=True)
        ks.append([[[30.0, 0, 16], [0, 30.0, 12], [0, 0, 1]] for _ in range(n_c)])
        row = []
        for c in range(n_c):
            w2c = np.eye(4)
            w2c[0, 3] = 0.1 * c
            w2c[2, 3] = 2.0
            row.append(w2c.tolist())
        w2cs.append(row)
    for t in range(n_t):
        for c in range(n_c):
            (tmp_path / "ims" / f"{c}").mkdir(exist_ok=True)
            _save_png(tmp_path / "ims" / f"{c}" / f"{t:06d}.jpg", np.full((24, 32, 3), 120, np.uint8))
            (tmp_path / "seg" / f"{c}").mkdir(exist_ok=True)
            _save_png(tmp_path / "seg" / f"{c}" / f"{t:06d}.png", np.full((24, 32), 255, np.uint8))
    meta = {"w": 32, "h": 24, "k": ks, "w2c": w2cs, "fn": fn}
    (tmp_path / "train_meta.json").write_text(json.dumps(meta))
    pts = np.random.default_rng(0).random((50, 7)).astype(np.float32)
    np.savez(tmp_path / "init_pt_cld.npz", data=pts)
    return tmp_path


class TestCMU:
    def test_loads_normalized(self, cmu_dir):
        scene = load_scene(cmu_dir)
        assert len(scene.train_frames) == 4  # 2 timesteps x 2 cams
        f = scene.train_frames[0]
        assert f.image.shape == (24, 32, 3)
        assert f.alpha_mask is not None
        assert float(scene.train_frames[0].cam.fid) == 0.0
        assert float(scene.train_frames[-1].cam.fid) == pytest.approx(1 / 150)
        # recenter_by_pcl leaves the init cloud zero-mean
        np.testing.assert_allclose(scene.init_points.mean(0), 0.0, atol=1e-5)


class TestFlowStore:
    def test_sample_and_resize(self, tmp_path):
        from riggs_tpu.data.flow import FlowStore

        names = ["r_000", "r_001"]
        fids = [0.0, 0.5]
        (tmp_path / "raft_neighbouring").mkdir()
        (tmp_path / "raft_masks").mkdir()
        flow = np.stack(
            [np.full((16, 20), 2.0, np.float32), np.full((16, 20), -1.0, np.float32)], -1
        )
        np.save(tmp_path / "raft_neighbouring" / "r_000.to_r_001.npy", flow)
        m = np.zeros((16, 20, 3), np.uint8)
        m[..., 0] = 255  # cycle-consistent everywhere
        _save_png(tmp_path / "raft_masks" / "r_000.to_r_001.png", m)

        store = FlowStore(tmp_path, names, fids)
        assert store.has_flow(0) and not store.has_flow(1)
        rng = np.random.default_rng(0)
        out = store.sample(0, rng, height=32, width=40)
        assert out is not None
        fl, mask, pfid = out
        assert fl.shape == (32, 40, 2) and mask.shape == (32, 40)
        np.testing.assert_allclose(fl[..., 0], 2.0, atol=1e-5)
        np.testing.assert_allclose(mask, 1.0)
        assert pfid == np.float32(0.5)

    def test_unknown_partner_skipped(self, tmp_path):
        from riggs_tpu.data.flow import FlowStore

        (tmp_path / "raft_neighbouring").mkdir()
        np.save(
            tmp_path / "raft_neighbouring" / "r_000.to_r_xyz.npy",
            np.zeros((4, 4, 2), np.float32),
        )
        store = FlowStore(tmp_path, ["r_000"], [0.0])
        assert store.sample(0, np.random.default_rng(0), 4, 4) is None
