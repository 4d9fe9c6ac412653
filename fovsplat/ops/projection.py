"""Per-Gaussian preprocessing: projection, EWA 2D covariance, OBB data.

TPU-native replacement for the reference ``preprocessCUDA``
(fov3dgs/submodules/diff-gaussian-rasterization_pcheck_obb_sum/
cuda_rasterizer/forward.cu:155-295). Everything here is batched elementwise
math over the N axis — XLA fuses it into a handful of VPU loops; no Pallas
needed at this stage.

Math parity notes:
  - frustum cull: view-space z > 0.2 (auxiliary.h in_frustum)
  - cov3D = R diag(s^2) R^T (computeCov3D, forward.cu:119-155)
  - cov2D = J W Sigma W^T J^T + 0.3*I (EWA, computeCov2D, forward.cu:74-113),
    with the view-space x/y clamped to 1.3*tan_fov before building J
  - radius = ceil(3*sqrt(lambda_max)), lambda = mid +- sqrt(max(0.1, mid^2-det))
  - ndc2pix(v, S) = ((v+1)*S - 1)/2
  - OBB eigen axes: 3*sqrt(lambda_i) lengths, eigenvectors of cov2D
    (forward.cu:243-266); only meaningful when the tile rect covers >1 tile.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

TILE = 16
NEAR_CULL_Z = 0.2
LOWPASS = 0.3


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Preprocessed:
    """Per-Gaussian screen-space quantities (all shape (N, ...))."""
    mean2d: Any        # (N, 2) pixel-space center
    depth: Any         # (N,) view-space z
    conic: Any         # (N, 3) inverse 2D covariance (a, b, c)
    radius: Any        # (N,) int32 screen-space radius in pixels
    valid: Any         # (N,) bool — survived frustum + det + extent culls
    eigen_len: Any     # (N, 2) 3-sigma lengths along principal axes
    eigen_vec: Any     # (N, 2, 2) unit principal axes (rows)
    rect_min: Any      # (N, 2) int32 inclusive tile rect min (x, y)
    rect_max: Any      # (N, 2) int32 exclusive tile rect max (x, y)
    tiles_touched: Any # (N,) int32 number of candidate tiles (rect area)


def quat_to_rotmat(q: jnp.ndarray) -> jnp.ndarray:
    """(..., 4) wxyz quaternion (assumed normalized) -> (..., 3, 3)."""
    r, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.stack([
        jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - r * z), 2 * (x * z + r * y)], -1),
        jnp.stack([2 * (x * y + r * z), 1 - 2 * (x * x + z * z), 2 * (y * z - r * x)], -1),
        jnp.stack([2 * (x * z - r * y), 2 * (y * z + r * x), 1 - 2 * (x * x + y * y)], -1),
    ], axis=-2)


def compute_cov3d(scales: jnp.ndarray, rotations: jnp.ndarray,
                  scale_modifier: float = 1.0) -> jnp.ndarray:
    """(N,3) activated scales + (N,4) unit quats -> (N,3,3) world covariance."""
    R = quat_to_rotmat(rotations)
    S = scales * scale_modifier
    M = R * S[..., None, :]        # R @ diag(s)
    return M @ jnp.swapaxes(M, -1, -2)


def compute_cov2d(means3d: jnp.ndarray, cov3d: jnp.ndarray,
                  world_view: jnp.ndarray, focal_x, focal_y,
                  tan_fovx, tan_fovy) -> jnp.ndarray:
    """EWA projection of the 3D covariance to 2D screen space.

    Returns (N, 3): upper-triangular (cxx, cxy, cyy) with the +0.3 low-pass.
    """
    W = world_view[:3, :3]
    t = means3d @ W.T + world_view[:3, 3]
    tz = t[..., 2]
    limx = 1.3 * tan_fovx
    limy = 1.3 * tan_fovy
    tx = jnp.clip(t[..., 0] / tz, -limx, limx) * tz
    ty = jnp.clip(t[..., 1] / tz, -limy, limy) * tz

    inv_z = 1.0 / tz
    inv_z2 = inv_z * inv_z
    zeros = jnp.zeros_like(tz)
    # J: (N, 2, 3) — only the two projective rows matter.
    J = jnp.stack([
        jnp.stack([focal_x * inv_z, zeros, -focal_x * tx * inv_z2], -1),
        jnp.stack([zeros, focal_y * inv_z, -focal_y * ty * inv_z2], -1),
    ], axis=-2)
    JW = J @ W                      # (N, 2, 3)
    cov = JW @ cov3d @ jnp.swapaxes(JW, -1, -2)   # (N, 2, 2)
    cxx = cov[..., 0, 0] + LOWPASS
    cxy = cov[..., 0, 1]
    cyy = cov[..., 1, 1] + LOWPASS
    return jnp.stack([cxx, cxy, cyy], axis=-1)


def ndc2pix(v: jnp.ndarray, size) -> jnp.ndarray:
    return ((v + 1.0) * size - 1.0) * 0.5


def preprocess(means3d: jnp.ndarray, scales: jnp.ndarray, rotations: jnp.ndarray,
               camera, scale_modifier: float = 1.0,
               cov3d_precomp: jnp.ndarray | None = None,
               live_mask: jnp.ndarray | None = None) -> Preprocessed:
    """Project N Gaussians into camera `camera` (a fovsplat Camera).

    live_mask: optional (N,) bool — rows marked False are culled. Training
    keeps parameters at a fixed capacity and prunes via this mask so jitted
    steps never change shape (SURVEY.md §7 "optimizer-state surgery").
    """
    W, H = camera.width, camera.height
    grid_x = (W + TILE - 1) // TILE
    grid_y = (H + TILE - 1) // TILE

    ones = jnp.ones_like(means3d[..., :1])
    hom = jnp.concatenate([means3d, ones], axis=-1)
    p_view = hom @ camera.world_view.T
    p_hom = hom @ camera.full_proj.T
    p_w = 1.0 / (p_hom[..., 3] + 1e-7)
    p_proj = p_hom[..., :3] * p_w[..., None]
    depth = p_view[..., 2]
    in_front = depth > NEAR_CULL_Z

    if cov3d_precomp is None:
        cov3d = compute_cov3d(scales, rotations, scale_modifier)
    else:
        cov3d = cov3d_precomp
    cov = compute_cov2d(means3d, cov3d, camera.world_view,
                        camera.focal_x, camera.focal_y,
                        camera.tan_fovx, camera.tan_fovy)
    cxx, cxy, cyy = cov[..., 0], cov[..., 1], cov[..., 2]
    det = cxx * cyy - cxy * cxy
    det_ok = det != 0.0
    safe_det = jnp.where(det_ok, det, 1.0)
    det_inv = 1.0 / safe_det
    conic = jnp.stack([cyy * det_inv, -cxy * det_inv, cxx * det_inv], axis=-1)

    mid = 0.5 * (cxx + cyy)
    disc = jnp.sqrt(jnp.maximum(0.1, mid * mid - safe_det))
    lambda1 = mid + disc
    lambda2 = mid - disc
    radius_f = jnp.ceil(3.0 * jnp.sqrt(jnp.maximum(lambda1, lambda2)))

    mean2d = jnp.stack([ndc2pix(p_proj[..., 0], W), ndc2pix(p_proj[..., 1], H)], -1)

    # Tile rect (getRect, auxiliary.h): min inclusive, max exclusive.
    rx0 = jnp.clip(((mean2d[..., 0] - radius_f) / TILE).astype(jnp.int32), 0, grid_x)
    ry0 = jnp.clip(((mean2d[..., 1] - radius_f) / TILE).astype(jnp.int32), 0, grid_y)
    rx1 = jnp.clip(((mean2d[..., 0] + radius_f + TILE - 1) / TILE).astype(jnp.int32), 0, grid_x)
    ry1 = jnp.clip(((mean2d[..., 1] + radius_f + TILE - 1) / TILE).astype(jnp.int32), 0, grid_y)
    tiles_touched = (rx1 - rx0) * (ry1 - ry0)

    valid = in_front & det_ok & (tiles_touched > 0)
    if live_mask is not None:
        valid = valid & live_mask
    tiles_touched = jnp.where(valid, tiles_touched, 0)

    # OBB principal axes (forward.cu:243-266). Guard the degenerate
    # single-tile case exactly like the reference (lens = 0, axes unused).
    multi = tiles_touched > 1
    a1 = cxx - lambda1
    a2 = cxx - lambda2
    v1 = jnp.stack([-cxy, a1], -1)
    v2 = jnp.stack([-cxy, a2], -1)

    def _norm(v):
        n = jax.lax.rsqrt(jnp.maximum(jnp.sum(v * v, -1, keepdims=True), 1e-20))
        return v * n

    v1 = _norm(v1)
    v2 = _norm(v2)
    len1 = jnp.where(multi, 3.0 * jnp.sqrt(jnp.maximum(lambda1, 0.0)), 0.0)
    len2 = jnp.where(multi, 3.0 * jnp.sqrt(jnp.maximum(lambda2, 0.0)), 0.0)

    return Preprocessed(
        mean2d=mean2d,
        depth=depth,
        conic=conic,
        radius=jnp.where(valid, radius_f, 0.0).astype(jnp.int32),
        valid=valid,
        eigen_len=jnp.stack([len1, len2], -1),
        eigen_vec=jnp.stack([v1, v2], -2),
        rect_min=jnp.stack([rx0, ry0], -1),
        rect_max=jnp.stack([rx1, ry1], -1),
        tiles_touched=tiles_touched,
    )
