"""Live-viewer socket protocol (SIBR-viewer compatible).

Counterpart of the reference's gaussian_renderer*/network_gui.py: a
non-blocking TCP listener speaking the Inria viewer protocol — 4-byte
little-endian length + JSON request carrying a camera (view / view-proj
matrices in the viewer's flipped-axis convention), answered with raw RGB
bytes + a length-prefixed verify string. Used from training loops the same
way (eff_finetune.py:77-90): poll try_connect(), then serve frames while
connected.
"""

from __future__ import annotations

import json
import math
import socket

import numpy as np

from fovsplat.data.cameras import Camera


class NetworkGUI:
    def __init__(self, host: str = "127.0.0.1", port: int = 6009):
        self.listener = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self.listener.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self.listener.bind((host, port))
        self.listener.listen()
        self.listener.settimeout(0)
        self.conn = None

    def try_connect(self):
        if self.conn is not None:
            return True
        try:
            self.conn, _ = self.listener.accept()
            self.conn.settimeout(None)
            return True
        except (BlockingIOError, socket.timeout, OSError):
            return False

    def _read_json(self):
        raw = self.conn.recv(4)
        if not raw:
            raise ConnectionError("viewer closed")
        n = int.from_bytes(raw, "little")
        buf = b""
        while len(buf) < n:
            chunk = self.conn.recv(n - len(buf))
            if not chunk:
                raise ConnectionError("viewer closed")
            buf += chunk
        return json.loads(buf.decode("utf-8"))

    def receive(self):
        """Returns (camera | None, request dict). Camera is None when the
        viewer sends a zero-resolution keep-alive."""
        msg = self._read_json()
        w = msg["resolution_x"]
        h = msg["resolution_y"]
        if w == 0 or h == 0:
            return None, msg
        view = np.array(msg["view_matrix"], np.float32).reshape(4, 4)
        # Viewer sends torch-transposed matrices with flipped Y/Z columns
        # (network_gui.py:74-78); convert to our math convention.
        view[:, 1] *= -1
        view[:, 2] *= -1
        full = np.array(msg["view_projection_matrix"],
                        np.float32).reshape(4, 4)
        full[:, 1] *= -1
        w2c = view.T
        full_m = full.T
        cam_center = np.linalg.inv(w2c)[:3, 3]
        cam = Camera(world_view=w2c, full_proj=full_m,
                     cam_center=cam_center.astype(np.float32),
                     tan_fovx=np.float32(math.tan(msg["fov_x"] * 0.5)),
                     tan_fovy=np.float32(math.tan(msg["fov_y"] * 0.5)),
                     width=int(w), height=int(h))
        return cam, msg

    def send_image(self, image: np.ndarray | None, verify: str = ""):
        """image: (H, W, 3) float [0,1] or None (keep-alive)."""
        payload = None
        if image is not None:
            payload = (np.clip(image, 0, 1) * 255).astype(np.uint8).tobytes()
        if payload is not None:
            self.conn.sendall(payload)
        self.conn.sendall(len(verify).to_bytes(4, "little"))
        self.conn.sendall(verify.encode("ascii"))

    def disconnect(self):
        if self.conn is not None:
            try:
                self.conn.close()
            finally:
                self.conn = None

    def serve_step(self, render_fn, source_path: str = ""):
        """One poll/serve iteration for a training loop: returns the
        request dict (contains 'train'/'keep_alive') or None."""
        if not self.try_connect():
            return None
        try:
            cam, msg = self.receive()
            img = render_fn(cam) if cam is not None else None
            self.send_image(np.asarray(img) if img is not None else None,
                            source_path)
            return msg
        except Exception:
            self.disconnect()
            return None
