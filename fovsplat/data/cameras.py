"""Camera container used throughout the framework.

Equivalent surface to the reference's ``scene/cameras.py:17-58`` Camera
(world_view_transform / full_proj_transform / camera_center, znear 0.01,
zfar 100) but as an immutable JAX pytree: the matrices are dynamic leaves,
image width/height are static aux data so jitted renderers specialize on
resolution only.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any

import jax
import numpy as np

from fovsplat.utils import graphics


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Camera:
    # Dynamic (traced) fields.
    world_view: Any      # (4,4) f32  — x_cam = world_view @ x_world
    full_proj: Any       # (4,4) f32  — proj @ world_view
    cam_center: Any      # (3,) f32
    tan_fovx: Any        # () f32
    tan_fovy: Any        # () f32
    # Static fields.
    width: int = dataclasses.field(metadata=dict(static=True))
    height: int = dataclasses.field(metadata=dict(static=True))

    @property
    def focal_x(self):
        return self.width / (2.0 * self.tan_fovx)

    @property
    def focal_y(self):
        return self.height / (2.0 * self.tan_fovy)


def make_camera(R: np.ndarray, t: np.ndarray, fovx: float, fovy: float,
                width: int, height: int,
                translate: np.ndarray | None = None, scale: float = 1.0) -> Camera:
    """Build a Camera from COLMAP-style extrinsics (R: C2W rotation, t: W2C
    translation), mirroring the reference Camera constructor."""
    w2c = graphics.world_to_view(R, t, translate, scale)
    proj = graphics.projection_matrix(graphics.Z_NEAR, graphics.Z_FAR, fovx, fovy)
    full = (proj @ w2c).astype(np.float32)
    cam_center = np.linalg.inv(w2c)[:3, 3].astype(np.float32)
    return Camera(
        world_view=np.asarray(w2c, np.float32),
        full_proj=full,
        cam_center=cam_center,
        tan_fovx=np.float32(math.tan(fovx * 0.5)),
        tan_fovy=np.float32(math.tan(fovy * 0.5)),
        width=int(width),
        height=int(height),
    )


def look_at_camera(eye, target, up, fovx: float, fovy: float,
                   width: int, height: int) -> Camera:
    """Synthetic-test helper: camera at `eye` looking at `target`."""
    eye = np.asarray(eye, np.float64)
    target = np.asarray(target, np.float64)
    up = np.asarray(up, np.float64)
    fwd = target - eye
    fwd = fwd / np.linalg.norm(fwd)
    right = np.cross(fwd, up)
    right = right / np.linalg.norm(right)
    down = np.cross(fwd, right)
    # Camera axes: +x right, +y down, +z forward (COLMAP convention).
    R_c2w = np.stack([right, down, fwd], axis=1)  # columns are camera axes
    t = -R_c2w.T @ eye  # W2C translation
    return make_camera(R_c2w, t, fovx, fovy, width, height)
