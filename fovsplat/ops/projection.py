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


def _cov3d_cols(scales, rotations, scale_modifier):
    """Unrolled Sigma = R diag(s^2) R^T as six (N,) columns
    (sxx, sxy, sxz, syy, syz, szz). Avoids batched 3x3 matmuls, which lower
    terribly on TPU (tiny contraction dims)."""
    r, x, y, z = (rotations[:, 0], rotations[:, 1], rotations[:, 2],
                  rotations[:, 3])
    # Standard rotation-matrix entries (build_rotation convention).
    r00 = 1 - 2 * (y * y + z * z)
    r01 = 2 * (x * y - r * z)
    r02 = 2 * (x * z + r * y)
    r10 = 2 * (x * y + r * z)
    r11 = 1 - 2 * (x * x + z * z)
    r12 = 2 * (y * z - r * x)
    r20 = 2 * (x * z - r * y)
    r21 = 2 * (y * z + r * x)
    r22 = 1 - 2 * (x * x + y * y)
    s0 = (scales[:, 0] * scale_modifier) ** 2
    s1 = (scales[:, 1] * scale_modifier) ** 2
    s2 = (scales[:, 2] * scale_modifier) ** 2
    sxx = r00 * r00 * s0 + r01 * r01 * s1 + r02 * r02 * s2
    sxy = r00 * r10 * s0 + r01 * r11 * s1 + r02 * r12 * s2
    sxz = r00 * r20 * s0 + r01 * r21 * s1 + r02 * r22 * s2
    syy = r10 * r10 * s0 + r11 * r11 * s1 + r12 * r12 * s2
    syz = r10 * r20 * s0 + r11 * r21 * s1 + r12 * r22 * s2
    szz = r20 * r20 * s0 + r21 * r21 * s1 + r22 * r22 * s2
    return sxx, sxy, sxz, syy, syz, szz


def compute_cov2d(means3d: jnp.ndarray, cov3d: jnp.ndarray,
                  world_view: jnp.ndarray, focal_x, focal_y,
                  tan_fovx, tan_fovy) -> jnp.ndarray:
    """EWA projection of a precomputed (N,3,3) covariance (slow path, kept
    for cov3d_precomp API parity)."""
    s = cov3d
    return _cov2d_from_cols(means3d, (s[:, 0, 0], s[:, 0, 1], s[:, 0, 2],
                                      s[:, 1, 1], s[:, 1, 2], s[:, 2, 2]),
                            world_view, focal_x, focal_y, tan_fovx, tan_fovy)


def _cov2d_from_cols(means3d, sig, world_view, focal_x, focal_y,
                     tan_fovx, tan_fovy) -> jnp.ndarray:
    """EWA projection, fully unrolled on (N,) columns.

    Returns (N, 3): (cxx, cxy, cyy) with the +0.3 low-pass.
    """
    sxx, sxy, sxz, syy, syz, szz = sig
    W = world_view[:3, :3]
    mx, my, mz = means3d[:, 0], means3d[:, 1], means3d[:, 2]
    tX = W[0, 0] * mx + W[0, 1] * my + W[0, 2] * mz + world_view[0, 3]
    tY = W[1, 0] * mx + W[1, 1] * my + W[1, 2] * mz + world_view[1, 3]
    tz_raw = W[2, 0] * mx + W[2, 1] * my + W[2, 2] * mz + world_view[2, 3]
    # Safe-where (see preprocess_cols p_w): rows at/behind the near plane
    # are culled, but their DERIVATIVES through 1/tz must stay finite.
    tz = jnp.where(tz_raw > NEAR_CULL_Z, tz_raw, 1.0)
    limx = 1.3 * tan_fovx
    limy = 1.3 * tan_fovy
    tx = jnp.clip(tX / tz, -limx, limx) * tz
    ty = jnp.clip(tY / tz, -limy, limy) * tz

    inv_z = 1.0 / tz
    inv_z2 = inv_z * inv_z
    # Rows of JW (2x3 per Gaussian), unrolled: JW[i] = J[i] @ W.
    j00, j02 = focal_x * inv_z, -focal_x * tx * inv_z2
    j11, j12 = focal_y * inv_z, -focal_y * ty * inv_z2
    a0 = j00 * W[0, 0] + j02 * W[2, 0]
    a1 = j00 * W[0, 1] + j02 * W[2, 1]
    a2 = j00 * W[0, 2] + j02 * W[2, 2]
    b0 = j11 * W[1, 0] + j12 * W[2, 0]
    b1 = j11 * W[1, 1] + j12 * W[2, 1]
    b2 = j11 * W[1, 2] + j12 * W[2, 2]
    # cov2d = A Sigma A^T for rows a, b.
    sa0 = sxx * a0 + sxy * a1 + sxz * a2
    sa1 = sxy * a0 + syy * a1 + syz * a2
    sa2 = sxz * a0 + syz * a1 + szz * a2
    sb0 = sxx * b0 + sxy * b1 + sxz * b2
    sb1 = sxy * b0 + syy * b1 + syz * b2
    sb2 = sxz * b0 + syz * b1 + szz * b2
    cxx = a0 * sa0 + a1 * sa1 + a2 * sa2 + LOWPASS
    cxy = b0 * sa0 + b1 * sa1 + b2 * sa2
    cyy = b0 * sb0 + b1 * sb1 + b2 * sb2
    return jnp.stack([cxx, cxy, cyy], axis=-1)


def ndc2pix(v: jnp.ndarray, size) -> jnp.ndarray:
    return ((v + 1.0) * size - 1.0) * 0.5


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PreprocessedCols:
    """preprocess() as flat (N,) columns — full-lane layout end to end.

    The stacked ``Preprocessed`` arrays ((N,2)/(N,3)/(N,2,2)) put 2-4
    elements in a 128-lane vector register; pipelines that consume columns
    (the fused foveated path builds a (32, N) SoA table anyway) skip the
    stack/unstack entirely."""
    depth: Any
    valid: Any
    mx: Any; my: Any                      # pixel-space center
    ca: Any; cb: Any; cc: Any             # conic
    v1x: Any; v1y: Any; v2x: Any; v2y: Any
    len1: Any; len2: Any
    rx0: Any; ry0: Any; rx1: Any; ry1: Any   # int32 tile rect
    tnum: Any                             # int32
    radius: Any                           # f32 (pre-valid-mask)


def preprocess(means3d: jnp.ndarray, scales: jnp.ndarray, rotations: jnp.ndarray,
               camera, scale_modifier: float = 1.0,
               cov3d_precomp: jnp.ndarray | None = None,
               live_mask: jnp.ndarray | None = None) -> Preprocessed:
    """Project N Gaussians into camera `camera` (a fovsplat Camera).

    live_mask: optional (N,) bool — rows marked False are culled. Training
    keeps parameters at a fixed capacity and prunes via this mask so jitted
    steps never change shape (SURVEY.md §7 "optimizer-state surgery").
    """
    c = preprocess_cols(means3d, scales, rotations, camera,
                        scale_modifier=scale_modifier,
                        cov3d_precomp=cov3d_precomp, live_mask=live_mask)
    return Preprocessed(
        mean2d=jnp.stack([c.mx, c.my], -1),
        depth=c.depth,
        conic=jnp.stack([c.ca, c.cb, c.cc], -1),
        radius=jnp.where(c.valid, c.radius, 0.0).astype(jnp.int32),
        valid=c.valid,
        eigen_len=jnp.stack([c.len1, c.len2], -1),
        eigen_vec=jnp.stack([jnp.stack([c.v1x, c.v1y], -1),
                             jnp.stack([c.v2x, c.v2y], -1)], -2),
        rect_min=jnp.stack([c.rx0, c.ry0], -1),
        rect_max=jnp.stack([c.rx1, c.ry1], -1),
        tiles_touched=c.tnum,
    )


def preprocess_cols(means3d: jnp.ndarray, scales: jnp.ndarray,
                    rotations: jnp.ndarray, camera,
                    scale_modifier: float = 1.0,
                    cov3d_precomp: jnp.ndarray | None = None,
                    live_mask: jnp.ndarray | None = None) -> PreprocessedCols:
    W, H = camera.width, camera.height
    grid_x = (W + TILE - 1) // TILE
    grid_y = (H + TILE - 1) // TILE

    mx, my, mz = means3d[:, 0], means3d[:, 1], means3d[:, 2]
    WV = camera.world_view
    FP = camera.full_proj
    depth = WV[2, 0] * mx + WV[2, 1] * my + WV[2, 2] * mz + WV[2, 3]
    hx = FP[0, 0] * mx + FP[0, 1] * my + FP[0, 2] * mz + FP[0, 3]
    hy = FP[1, 0] * mx + FP[1, 1] * my + FP[1, 2] * mz + FP[1, 3]
    hw = FP[3, 0] * mx + FP[3, 1] * my + FP[3, 2] * mz + FP[3, 3]
    in_front = depth > NEAR_CULL_Z
    # Safe-where: rows at/behind the camera plane (always culled) must not
    # produce inf forward values OR inf/NaN DERIVATIVES — a culled row's
    # zero cotangent times an inf d(px)/d(hw) is NaN, which _mask_dead_grads
    # then has to absorb on a LIVE row (the r3 pipeline run's non-finite
    # gradient seed; tests/test_pallas_blend.py camera-plane regression).
    hw_safe = jnp.where(in_front, hw + 1e-7, 1.0)
    p_w = 1.0 / hw_safe
    p_proj = jnp.stack([hx * p_w, hy * p_w], axis=-1)

    if cov3d_precomp is None:
        sig = _cov3d_cols(scales, rotations, scale_modifier)
        cov = _cov2d_from_cols(means3d, sig, camera.world_view,
                               camera.focal_x, camera.focal_y,
                               camera.tan_fovx, camera.tan_fovy)
    else:
        cov = compute_cov2d(means3d, cov3d_precomp, camera.world_view,
                            camera.focal_x, camera.focal_y,
                            camera.tan_fovx, camera.tan_fovy)
    cxx, cxy, cyy = cov[..., 0], cov[..., 1], cov[..., 2]
    det = cxx * cyy - cxy * cxy
    det_ok = det != 0.0
    safe_det = jnp.where(det_ok, det, 1.0)
    det_inv = 1.0 / safe_det

    mid = 0.5 * (cxx + cyy)
    disc = jnp.sqrt(jnp.maximum(0.1, mid * mid - safe_det))
    lambda1 = mid + disc
    lambda2 = mid - disc
    radius_f = jnp.ceil(3.0 * jnp.sqrt(jnp.maximum(lambda1, lambda2)))

    px = ndc2pix(p_proj[..., 0], W)
    py = ndc2pix(p_proj[..., 1], H)

    # Tile rect (getRect, auxiliary.h): min inclusive, max exclusive.
    rx0 = jnp.clip(((px - radius_f) / TILE).astype(jnp.int32), 0, grid_x)
    ry0 = jnp.clip(((py - radius_f) / TILE).astype(jnp.int32), 0, grid_y)
    rx1 = jnp.clip(((px + radius_f + TILE - 1) / TILE).astype(jnp.int32), 0, grid_x)
    ry1 = jnp.clip(((py + radius_f + TILE - 1) / TILE).astype(jnp.int32), 0, grid_y)
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
    n1 = jax.lax.rsqrt(jnp.maximum(cxy * cxy + a1 * a1, 1e-20))
    n2 = jax.lax.rsqrt(jnp.maximum(cxy * cxy + a2 * a2, 1e-20))
    len1 = jnp.where(multi, 3.0 * jnp.sqrt(jnp.maximum(lambda1, 0.0)), 0.0)
    len2 = jnp.where(multi, 3.0 * jnp.sqrt(jnp.maximum(lambda2, 0.0)), 0.0)

    return PreprocessedCols(
        depth=depth, valid=valid, mx=px, my=py,
        ca=cyy * det_inv, cb=-cxy * det_inv, cc=cxx * det_inv,
        v1x=-cxy * n1, v1y=a1 * n1, v2x=-cxy * n2, v2y=a2 * n2,
        len1=len1, len2=len2,
        rx0=rx0, ry0=ry0, rx1=rx1, ry1=ry1,
        tnum=tiles_touched, radius=radius_f)
