"""Tests: hash-grid deform network, HTTP viewer round-trip, nerfies reader."""
import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from riggs_tpu.models.hash_encoding import (
    HashGridDef,
    init_hash_grid,
    init_hash_deform,
    apply_hash_deform,
    hash_encode,
    progressive_level_mask,
)


class TestHashEncoding:
    @pytest.fixture(scope="class")
    def grid(self):
        return HashGridDef(n_levels=4, log2_table=10, base_res=4, max_res=32)

    def test_shapes_and_finite(self, grid):
        tables = init_hash_grid(jax.random.PRNGKey(0), grid)
        x = jax.random.uniform(jax.random.PRNGKey(1), (50, 3))
        enc = hash_encode(tables, grid, x)
        assert enc.shape == (50, grid.out_dim)
        assert np.isfinite(np.asarray(enc)).all()

    def test_continuity(self, grid):
        tables = init_hash_grid(jax.random.PRNGKey(0), grid)
        x = jax.random.uniform(jax.random.PRNGKey(1), (50, 3))
        e1 = hash_encode(tables, grid, x)
        e2 = hash_encode(tables, grid, x + 1e-4)
        assert float(jnp.abs(e1 - e2).max()) < 1e-2

    def test_progressive_mask_unlocks(self):
        m0 = progressive_level_mask(8, 0, start_level=2, steps_per_level=100)
        m5 = progressive_level_mask(8, 500, start_level=2, steps_per_level=100)
        assert m0.sum() == 2 and m5.sum() == 7

    def test_deform_network(self, grid):
        net = init_hash_deform(jax.random.PRNGKey(0), grid=grid)
        x = jax.random.uniform(jax.random.PRNGKey(1), (40, 3)) * 2 - 1
        out = apply_hash_deform(net, x, jnp.asarray(0.5))
        assert out["d_xyz"].shape == (40, 3)
        assert float(jnp.abs(out["d_xyz"]).max()) < 1e-2  # tiny head init

        g = jax.grad(
            lambda p: jnp.sum(apply_hash_deform(net.replace_params(p), x, jnp.asarray(0.5))["d_xyz"] ** 2)
        )(net.params_dict())
        assert all(np.isfinite(np.asarray(l)).all() for l in jax.tree.leaves(g))


class TestViewerHTTP:
    def test_serves_page_and_frames(self):
        import time
        import urllib.request

        import __graft_entry__ as g

        scene, state = g._build_tiny_scene(width=48, height=48)
        from riggs_tpu.viz.web_viewer import ViewerServer

        v = ViewerServer(state.gs, skel=state.skel, width=64, height=64)
        server = v.serve(port=18931, blocking=False)
        try:
            time.sleep(0.3)
            html = urllib.request.urlopen("http://localhost:18931/").read()
            assert b"canvas" in html
            for q in ("mode=rgb", "mode=skinning", "mode=rgb&joint=1&angle=30"):
                png = urllib.request.urlopen(f"http://localhost:18931/render?t=0.3&{q}").read()
                assert png[:4] == b"\x89PNG", q
        finally:
            server.shutdown()

    def test_edit_pose_retarget_endpoints(self, tmp_path):
        """Round-trip the drag-edit / pose-library / playback / retarget API
        (reference surface: interactive_GUI.py:1268 drag, :1216-1261 key-pose
        SLERP playback, :449+ reference-skeleton retargeting)."""
        import time
        import urllib.request

        import __graft_entry__ as g

        def get(url):
            return json.loads(urllib.request.urlopen(f"http://localhost:18932{url}").read())

        scene, state = g._build_tiny_scene(width=48, height=48)
        from riggs_tpu.viz.web_viewer import ViewerServer

        v = ViewerServer(
            state.gs, skel=state.skel, width=64, height=64,
            pose_lib_path=tmp_path / "poses.json",
        )
        server = v.serve(port=18932, blocking=False)
        try:
            time.sleep(0.3)
            # pose library: save two poses (one edited), list, SLERP playback
            assert get("/pose/save?name=rest&t=0.0") == {"saved": "rest"}
            assert get("/pose/save?name=bent&t=0.5&joint=1&angle=45") == {"saved": "bent"}
            assert get("/pose/list") == ["bent", "rest"]
            play = get("/pose/play?names=rest,bent&frames=4")
            assert play["frames"] >= 4
            png = urllib.request.urlopen("http://localhost:18932/render?seq=1").read()
            assert png[:4] == b"\x89PNG"
            assert get("/pose/clear") == {"ok": True}

            # retargeting: drive this skeleton from a saved (src) skeleton dir
            src = tmp_path / "src_model"
            src.mkdir()
            np.save(src / "_", np.zeros(1))  # ensure dir materialized
            np.savez(src / "skeleton_tree.npz", joints=np.asarray(v.skel.joints))
            (src / "poses.json").write_text((tmp_path / "poses.json").read_text())
            out = get(f"/retarget?path={src}&name=bent")
            assert out["joints_dst"] == int(np.asarray(v.skel.joints).shape[0])
            urllib.request.urlopen("http://localhost:18932/render?t=0").read()
            get("/pose/clear")

            # drag-edit session: init -> pick a control point at its projected
            # pixel -> drag -> the edited cloud renders and d_xyz is nonzero
            init = get("/edit/init?n=32")
            assert init["n_ctrl"] >= 1
            from riggs_tpu.camera.camera import project_nodes_2d
            import jax.numpy as jnp

            cam = v._camera(0.0, 0.3, 3.0)
            rc = np.asarray(project_nodes_2d(cam, jnp.asarray(v.edit.ctrl_rest)))
            r0, c0 = float(rc[0, 0]), float(rc[0, 1])
            pick = get(f"/edit/pick?x={c0}&y={r0}&az=0&el=0.3&r=3.0")
            assert pick["picked"] >= 0 and pick["n_keypoints"] == 1
            get("/edit/drag?dx=6&dy=0&az=0&el=0.3&r=3.0")
            assert float(np.abs(v.edit.d_xyz).max()) > 0
            png = urllib.request.urlopen("http://localhost:18932/render?mode=edited").read()
            assert png[:4] == b"\x89PNG"
            assert get("/edit/clear") == {"ok": True}
            assert float(np.abs(v.edit.d_xyz).max()) == 0

            # bad request -> 400 JSON error
            import urllib.error

            with pytest.raises(urllib.error.HTTPError):
                get("/retarget?path=/nonexistent&name=x")
        finally:
            server.shutdown()


class TestNerfiesReader:
    def test_roundtrip(self, tmp_path):
        from PIL import Image

        ids = ["000001", "000002", "000003"]
        (tmp_path / "camera").mkdir()
        (tmp_path / "rgb" / "2x").mkdir(parents=True)
        json.dump(
            {"ids": ids, "train_ids": ids[:2], "val_ids": ids[2:]},
            open(tmp_path / "dataset.json", "w"),
        )
        json.dump(
            {i: {"time_id": k, "camera_id": 0} for k, i in enumerate(ids)},
            open(tmp_path / "metadata.json", "w"),
        )
        rng = np.random.default_rng(0)
        for i in ids:
            json.dump(
                {
                    "orientation": np.eye(3).tolist(),
                    "position": [0, 0, -3.0],
                    "focal_length": 400.0,
                    "principal_point": [64, 64],
                    "image_size": [128, 128],
                },
                open(tmp_path / "camera" / f"{i}.json", "w"),
            )
            Image.fromarray((rng.uniform(size=(64, 64, 3)) * 255).astype(np.uint8)).save(
                tmp_path / "rgb" / "2x" / f"{i}.png"
            )
        from riggs_tpu.data.scene import load_scene
        from riggs_tpu.camera.camera import project_points

        scene = load_scene(tmp_path, n_init_points=200)
        assert len(scene.train_frames) == 2 and len(scene.test_frames) == 1
        f = scene.train_frames[0]
        pix, z = project_points(f.cam, jnp.zeros((1, 3)))
        np.testing.assert_allclose(float(z[0]), 3.0, atol=1e-4)
