"""Real spherical harmonics evaluation (degree 0..3).

Parity: constants and basis ordering follow the reference CUDA tables
(fov3dgs/submodules/*/cuda_rasterizer/auxiliary.h:22-39) and
``computeColorFromSH`` (forward.cu:20-73): color = clamp(eval + 0.5, min=0),
with the clamp mask tracked implicitly by JAX autodiff (the clamp's VJP zeroes
gradients exactly like the reference's saved ``clamped`` flags).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

SH_C0 = 0.28209479177387814
SH_C1 = 0.4886025119029199
SH_C2 = (1.0925484305920792, -1.0925484305920792, 0.31539156525252005,
         -1.0925484305920792, 0.5462742152960396)
SH_C3 = (-0.5900435899266435, 2.890611442640554, -0.4570457994644658,
         0.3731763325901154, -0.4570457994644658, 1.445305721320277,
         -0.5900435899266435)

MAX_SH_DEGREE = 3


def num_sh_coeffs(degree: int) -> int:
    return (degree + 1) ** 2


def eval_sh(degree: int, sh: jnp.ndarray, dirs: jnp.ndarray) -> jnp.ndarray:
    """Evaluate SH basis.

    Args:
      degree: active SH degree (0..3), static.
      sh: (..., K, 3) coefficients, K >= (degree+1)^2.
      dirs: (..., 3) unit view directions.
    Returns: (..., 3) raw radiance (before +0.5 shift / clamping).
    """
    result = SH_C0 * sh[..., 0, :]
    if degree > 0:
        x = dirs[..., 0:1]
        y = dirs[..., 1:2]
        z = dirs[..., 2:3]
        result = (result
                  - SH_C1 * y * sh[..., 1, :]
                  + SH_C1 * z * sh[..., 2, :]
                  - SH_C1 * x * sh[..., 3, :])
        if degree > 1:
            xx, yy, zz = x * x, y * y, z * z
            xy, yz, xz = x * y, y * z, x * z
            result = (result
                      + SH_C2[0] * xy * sh[..., 4, :]
                      + SH_C2[1] * yz * sh[..., 5, :]
                      + SH_C2[2] * (2.0 * zz - xx - yy) * sh[..., 6, :]
                      + SH_C2[3] * xz * sh[..., 7, :]
                      + SH_C2[4] * (xx - yy) * sh[..., 8, :])
            if degree > 2:
                result = (result
                          + SH_C3[0] * y * (3.0 * xx - yy) * sh[..., 9, :]
                          + SH_C3[1] * xy * z * sh[..., 10, :]
                          + SH_C3[2] * y * (4.0 * zz - xx - yy) * sh[..., 11, :]
                          + SH_C3[3] * z * (2.0 * zz - 3.0 * xx - 3.0 * yy) * sh[..., 12, :]
                          + SH_C3[4] * x * (4.0 * zz - xx - yy) * sh[..., 13, :]
                          + SH_C3[5] * z * (xx - yy) * sh[..., 14, :]
                          + SH_C3[6] * x * (xx - 3.0 * yy) * sh[..., 15, :])
    return result


def sh_to_rgb(degree: int, sh: jnp.ndarray, means: jnp.ndarray,
              cam_center: jnp.ndarray) -> jnp.ndarray:
    """SH -> clamped RGB as in the reference preprocess (N-last layout)."""
    x, y, z = _unit_dirs(means, cam_center)
    sh_t = sh.transpose(2, 1, 0)           # (3, K, N)
    out = _eval_sh_nlast(degree, sh_t, x, y, z) + 0.5
    return jnp.maximum(out, 0.0).T         # (N, 3)


def eval_sh_rest(degree: int, sh_rest: jnp.ndarray, means: jnp.ndarray,
                 cam_center: jnp.ndarray) -> jnp.ndarray:
    """Degree>=1 contribution + 0.5 shift, DC excluded — the foveated
    renderer's shared color term (``computeRestColorFromSH``,
    ..._fov_pcheck_obb/cuda_rasterizer/rasterizer_impl.cu:34-84).

    sh_rest: (N, K-1, 3), coefficients 1..K-1 (no DC).
    """
    n = sh_rest.shape[0]
    x, y, z = _unit_dirs(means, cam_center)
    zeros_dc = jnp.zeros((3, 1, n), sh_rest.dtype)
    sh_t = jnp.concatenate([zeros_dc, sh_rest.transpose(2, 1, 0)], axis=1)
    return (_eval_sh_nlast(degree, sh_t, x, y, z) + 0.5).T


def rgb_to_sh_dc(rgb: jnp.ndarray) -> jnp.ndarray:
    """Inverse of the DC term: (rgb - 0.5) / C0 (utils/sh_utils.py RGB2SH)."""
    return (rgb - 0.5) / SH_C0


def sh_dc_to_rgb(dc: jnp.ndarray) -> jnp.ndarray:
    return dc * SH_C0 + 0.5


def _eval_sh_nlast(degree: int, sh_t: jnp.ndarray, x, y, z) -> jnp.ndarray:
    """TPU-friendly SH eval with N LAST: sh_t (C, K, N), x/y/z (N,).

    Identical math to eval_sh; (C, N) intermediates keep the vector lanes
    full (the (..., K, 3) layout puts only 3 elements per 128-lane vreg).
    Accepts bf16 coefficient storage (FovModelSoA): each slice upcasts to
    f32 at the point of use — XLA fuses the convert into the consuming
    multiply, so the HBM read stays at bf16 width.
    """
    if sh_t.dtype != jnp.float32:
        _orig = sh_t

        class _Up:
            def __getitem__(self, idx):
                return _orig[idx].astype(jnp.float32)
        sh_t = _Up()
    result = SH_C0 * sh_t[:, 0]
    if degree > 0:
        result = (result - SH_C1 * y * sh_t[:, 1] + SH_C1 * z * sh_t[:, 2]
                  - SH_C1 * x * sh_t[:, 3])
        if degree > 1:
            xx, yy, zz = x * x, y * y, z * z
            xy, yz, xz = x * y, y * z, x * z
            result = (result
                      + SH_C2[0] * xy * sh_t[:, 4]
                      + SH_C2[1] * yz * sh_t[:, 5]
                      + SH_C2[2] * (2.0 * zz - xx - yy) * sh_t[:, 6]
                      + SH_C2[3] * xz * sh_t[:, 7]
                      + SH_C2[4] * (xx - yy) * sh_t[:, 8])
            if degree > 2:
                result = (result
                          + SH_C3[0] * y * (3.0 * xx - yy) * sh_t[:, 9]
                          + SH_C3[1] * xy * z * sh_t[:, 10]
                          + SH_C3[2] * y * (4.0 * zz - xx - yy) * sh_t[:, 11]
                          + SH_C3[3] * z * (2.0 * zz - 3 * xx - 3 * yy) * sh_t[:, 12]
                          + SH_C3[4] * x * (4.0 * zz - xx - yy) * sh_t[:, 13]
                          + SH_C3[5] * z * (xx - yy) * sh_t[:, 14]
                          + SH_C3[6] * x * (xx - 3.0 * yy) * sh_t[:, 15])
    return result                      # (C, N)


def _unit_dirs(means, cam_center):
    dx = means[:, 0] - cam_center[0]
    dy = means[:, 1] - cam_center[1]
    dz = means[:, 2] - cam_center[2]
    inv = jax.lax.rsqrt(dx * dx + dy * dy + dz * dz)
    return dx * inv, dy * inv, dz * inv
