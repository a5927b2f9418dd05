"""SIBR network_gui wire-protocol round trip (reference
gaussian_renderer/network_gui.py + train_gui.py:983-996)."""
import threading
import time

import numpy as np
import pytest

from riggs_tpu.camera.camera import make_camera
from riggs_tpu.viz.sibr import SibrClient, SibrServer, camera_from_message, encode_image


def _to_view_matrix(w2c: np.ndarray) -> np.ndarray:
    """Inverse of camera_from_message's convention: the torch-side
    world_view_transform (row-vector w2c^T) with Y/Z columns negated."""
    m = np.asarray(w2c, np.float32).T.copy()
    m[:, 1] = -m[:, 1]
    m[:, 2] = -m[:, 2]
    return m


class TestCameraFromMessage:
    def test_round_trips_w2c(self):
        rng = np.random.default_rng(0)
        A = rng.normal(size=(3, 3))
        q, _ = np.linalg.qr(A)
        cam0 = make_camera(q, np.array([0.1, -0.2, 2.5]), 64, 48, fovx=0.9, fovy=0.8)
        msg = dict(
            resolution_x=64, resolution_y=48, fov_x=0.9, fov_y=0.8,
            z_near=0.01, z_far=100.0,
            view_matrix=_to_view_matrix(np.asarray(cam0.w2c)).reshape(-1).tolist(),
        )
        cam = camera_from_message(msg)
        np.testing.assert_allclose(np.asarray(cam.w2c), np.asarray(cam0.w2c), atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(cam.intrinsics), np.asarray(cam0.intrinsics), rtol=1e-6
        )
        assert (cam.width, cam.height) == (64, 48)

    def test_zero_resolution_is_none(self):
        assert camera_from_message(dict(resolution_x=0, resolution_y=0)) is None


class TestSibrRoundTrip:
    def test_render_request_reply(self):
        served = {}

        def render_fn(cam, scaling_modifier):
            served["cam"] = cam
            served["scale"] = scaling_modifier
            img = np.zeros((cam.height, cam.width, 3), np.float32)
            img[..., 0] = 1.0  # red
            return img

        server = SibrServer("127.0.0.1", 0, verify="/data/scene")
        port = server.port
        result = {}

        def client_side():
            c = SibrClient("127.0.0.1", port)
            w2c = np.eye(4, dtype=np.float32)
            w2c[2, 3] = 2.5
            result["img"], result["verify"] = c.request(
                32, 24, _to_view_matrix(w2c), train=True, scaling_modifier=0.7
            )
            c.close()

        t = threading.Thread(target=client_side)
        t.start()
        # service passes until the client request has been answered (the
        # sleep yields to the client thread: under a loaded box all polls
        # could otherwise complete before the client's connect lands)
        for _ in range(200):
            server.poll(render_fn)
            if result:
                break
            time.sleep(0.05)
        t.join(timeout=5)
        server.close()
        assert result["verify"] == "/data/scene"
        assert result["img"].shape == (24, 32, 3)
        assert (result["img"][..., 0] == 255).all() and (result["img"][..., 1] == 0).all()
        assert served["scale"] == pytest.approx(0.7)
        np.testing.assert_allclose(np.asarray(served["cam"].w2c)[2, 3], 2.5)

    def test_encode_image_clips(self):
        img = np.array([[[-0.1, 0.5, 1.5]]], np.float32)
        b = encode_image(img)
        assert b == bytes([0, 127, 255]) or b == bytes([0, 128, 255])
