"""Real spherical harmonics evaluation (degree 0..3).

Parity: constants and basis ordering follow the reference CUDA tables
(fov3dgs/submodules/*/cuda_rasterizer/auxiliary.h:22-39) and
``computeColorFromSH`` (forward.cu:20-73): color = clamp(eval + 0.5, min=0),
with the clamp mask tracked implicitly by JAX autodiff (the clamp's VJP zeroes
gradients exactly like the reference's saved ``clamped`` flags).
"""

from __future__ import annotations

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
    """SH -> clamped RGB as in the reference preprocess."""
    dirs = means - cam_center
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    return jnp.maximum(eval_sh(degree, sh, dirs) + 0.5, 0.0)


def eval_sh_rest(degree: int, sh_rest: jnp.ndarray, means: jnp.ndarray,
                 cam_center: jnp.ndarray) -> jnp.ndarray:
    """Degree>=1 contribution + 0.5 shift, DC excluded — the foveated
    renderer's shared color term (``computeRestColorFromSH``,
    ..._fov_pcheck_obb/cuda_rasterizer/rasterizer_impl.cu:34-84).

    sh_rest: (..., K-1, 3), coefficients 1..K-1 (no DC).
    """
    dirs = means - cam_center
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    zeros_dc = jnp.zeros(sh_rest.shape[:-2] + (1, 3), sh_rest.dtype)
    full = jnp.concatenate([zeros_dc, sh_rest], axis=-2)
    return eval_sh(degree, full, dirs) + 0.5


def rgb_to_sh_dc(rgb: jnp.ndarray) -> jnp.ndarray:
    """Inverse of the DC term: (rgb - 0.5) / C0 (utils/sh_utils.py RGB2SH)."""
    return (rgb - 0.5) / SH_C0


def sh_dc_to_rgb(dc: jnp.ndarray) -> jnp.ndarray:
    return dc * SH_C0 + 0.5
