"""SIBR remote-viewer wire protocol (network_gui parity).

Speaks the exact TCP protocol of the reference's
gaussian_renderer/network_gui.py so an unmodified SIBR_remoteGaussian_app
client can watch training:

  client -> server   4-byte little-endian length, then a JSON message with
                     resolution_x/y, train, fov_x/y, z_near/z_far,
                     shs_python, rot_scale_python, keep_alive,
                     scaling_modifier, view_matrix (16 floats),
                     view_projection_matrix (16 floats)
                     (network_gui.py:47-52, 63-91)
  server -> client   raw H*W*3 uint8 image bytes, then 4-byte little-endian
                     length + ascii verify string (the dataset source path)
                     (network_gui.py:55-59; train_gui.py:991-992)

The server is non-blocking: ``try_connect`` polls ``accept`` each training
iteration (network_gui.py:36-42), and ``poll`` mirrors the training-loop
drain at train_gui.py:983-996 — while a client is connected, receive a
camera, render, reply, and keep looping when training is paused
(``do_training`` false) so the viewer stays interactive between steps.
"""
from __future__ import annotations

import json
import socket
from typing import Callable, Optional

import numpy as np

from riggs_tpu.camera.camera import Camera, fov2focal


def camera_from_message(msg: dict) -> Optional[Camera]:
    """Build a Camera from a SIBR viewer message (network_gui.py:63-88).

    The client sends torch-convention row-vector matrices
    (``world_view_transform`` = w2c^T) with the Y/Z columns negated relative
    to the reference's load-time flip (network_gui.py:79-81), so:
    w2c = (M with columns 1, 2 negated)^T.
    """
    import jax.numpy as jnp

    width = int(msg["resolution_x"])
    height = int(msg["resolution_y"])
    if width == 0 or height == 0:
        return None
    m = np.asarray(msg["view_matrix"], np.float32).reshape(4, 4)
    m[:, 1] = -m[:, 1]
    m[:, 2] = -m[:, 2]
    w2c = m.T
    fovx, fovy = float(msg["fov_x"]), float(msg["fov_y"])
    intr = np.array(
        [fov2focal(fovx, width), fov2focal(fovy, height), width / 2.0, height / 2.0],
        np.float32,
    )
    return Camera(
        w2c=jnp.asarray(w2c),
        intrinsics=jnp.asarray(intr),
        fid=jnp.asarray(0.0, jnp.float32),
        width=width,
        height=height,
        znear=float(msg.get("z_near", 0.01)),
        zfar=float(msg.get("z_far", 100.0)),
    )


def encode_image(img) -> bytes:
    """float [0,1] (H, W, 3) -> the raw uint8 byte stream the client expects
    (train_gui.py:991)."""
    a = np.asarray(img)
    return np.ascontiguousarray(
        np.clip(a * 255.0, 0.0, 255.0).astype(np.uint8)
    ).tobytes()


class SibrServer:
    """Non-blocking SIBR viewer endpoint for a training loop."""

    def __init__(self, host: str = "127.0.0.1", port: int = 6009, verify: str = "."):
        self.verify = verify
        self.conn: Optional[socket.socket] = None
        self.listener = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self.listener.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self.listener.bind((host, port))
        self.listener.listen()
        self.listener.settimeout(0)  # network_gui.py:42 — accept never blocks

    @property
    def port(self) -> int:
        return self.listener.getsockname()[1]

    def try_connect(self) -> None:
        if self.conn is not None:
            return
        try:
            conn, _ = self.listener.accept()
            conn.settimeout(None)
            self.conn = conn
        except (BlockingIOError, socket.timeout, OSError):
            pass

    def _recv_exact(self, n: int) -> bytes:
        buf = b""
        while len(buf) < n:
            chunk = self.conn.recv(n - len(buf))
            if not chunk:
                raise ConnectionError("SIBR client closed")
            buf += chunk
        return buf

    def receive(self) -> dict:
        n = int.from_bytes(self._recv_exact(4), "little")
        return json.loads(self._recv_exact(n).decode("utf-8"))

    def send(self, image_bytes: Optional[bytes]) -> None:
        if image_bytes is not None:
            self.conn.sendall(image_bytes)
        self.conn.sendall(len(self.verify).to_bytes(4, "little"))
        self.conn.sendall(bytes(self.verify, "ascii"))

    def poll(
        self,
        render_fn: Callable[[Camera, float], "np.ndarray"],
        training_done: bool = False,
    ) -> None:
        """One training-iteration service pass (train_gui.py:983-996).

        ``render_fn(cam, scaling_modifier)`` returns a float [0,1] (H, W, 3)
        image. Drains viewer requests until the client either asks training
        to continue (``train``) or disconnects; a ``keep_alive`` request
        also returns control unless training has finished.
        """
        self.try_connect()
        while self.conn is not None:
            try:
                msg = self.receive()
                cam = camera_from_message(msg)
                img_bytes = None
                if cam is not None:
                    img_bytes = encode_image(
                        render_fn(cam, float(msg.get("scaling_modifier", 1.0)))
                    )
                self.send(img_bytes)
                if bool(msg.get("train", False)) and not training_done:
                    break
                if not bool(msg.get("keep_alive", True)) and training_done:
                    break
            except Exception:
                try:
                    self.conn.close()
                except OSError:
                    pass
                self.conn = None

    def close(self) -> None:
        if self.conn is not None:
            self.conn.close()
            self.conn = None
        self.listener.close()


class SibrClient:
    """Minimal protocol client (what SIBR_remoteGaussian_app sends) — used by
    tests and as a reference for the wire format."""

    def __init__(self, host: str, port: int):
        self.sock = socket.create_connection((host, port))

    def request(
        self,
        width: int,
        height: int,
        view_matrix,
        fovx: float = 0.9,
        fovy: float = 0.9,
        train: bool = True,
        keep_alive: bool = True,
        scaling_modifier: float = 1.0,
    ) -> tuple[np.ndarray, str]:
        msg = dict(
            resolution_x=width,
            resolution_y=height,
            train=train,
            fov_y=fovy,
            fov_x=fovx,
            z_near=0.01,
            z_far=100.0,
            shs_python=False,
            rot_scale_python=False,
            keep_alive=keep_alive,
            scaling_modifier=scaling_modifier,
            view_matrix=list(map(float, np.asarray(view_matrix).reshape(-1))),
            view_projection_matrix=list(map(float, np.asarray(view_matrix).reshape(-1))),
        )
        payload = json.dumps(msg).encode("utf-8")
        self.sock.sendall(len(payload).to_bytes(4, "little") + payload)
        img = self._recv_exact(width * height * 3)
        n = int.from_bytes(self._recv_exact(4), "little")
        verify = self._recv_exact(n).decode("ascii")
        return np.frombuffer(img, np.uint8).reshape(height, width, 3), verify

    def _recv_exact(self, n: int) -> bytes:
        buf = b""
        while len(buf) < n:
            chunk = self.sock.recv(n - len(buf))
            if not chunk:
                raise ConnectionError("server closed")
            buf += chunk
        return buf

    def close(self) -> None:
        self.sock.close()
