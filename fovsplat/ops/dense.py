"""Dense reference renderer — the correctness oracle.

Renders by evaluating *every* Gaussian at *every* pixel (no tile binning, no
OBB culling), with the exact blend semantics of the reference renderCUDA
(..._pcheck_obb_sum/cuda_rasterizer/forward.cu:298-426):

  power = -0.5*(a*dx^2 + c*dy^2) - b*dx*dy
  skip if power > 0 or power < power_cutoff      (cutoff -4.5 in OBB variants,
                                                  -inf in the original)
  alpha = min(0.99, opacity * exp(power)); skip if alpha < 1/255
  sequential front-to-back: T *= (1-alpha); a Gaussian whose test_T < 1e-4
  terminates the pixel *without* contributing.

The sequential early-exit loop is vectorized exactly: with masked alphas
a_j over the depth-sorted list, T_j = prod_{k<j}(1-a_k) is the running
transmittance *until the first trigger*; the first j with a_j>0 and
T_j*(1-a_j) < 1e-4 freezes the pixel, so contributions are the prefix
before it. O(N * H * W) — use only for tests / tiny scenes.
"""

from __future__ import annotations

import jax.numpy as jnp

from fovsplat.ops import binning, projection

ALPHA_MIN = 1.0 / 255.0
ALPHA_MAX = 0.99
T_EPS = 1e-4


def blend_prefix(alpha: jnp.ndarray, axis: int = -1):
    """Shared closed-form for sequential front-to-back blending.

    Args:
      alpha: masked alphas (0 where statically skipped), sorted front-to-back
        along `axis`.
    Returns (weight, final_T, contribute_mask):
      weight[j] = alpha_j * T_j for contributing entries else 0,
      final_T  = transmittance at termination,
      contribute = bool mask of entries that actually blended.
    """
    one_minus = 1.0 - alpha          # always >= 0.01 (alpha capped at 0.99)
    incl = jnp.cumprod(one_minus, axis=axis)
    excl = incl / one_minus          # exclusive cumprod = T before entry j
    trigger = (alpha > 0) & (incl < T_EPS)
    # done_before[j] = any trigger at k < j  (exclusive cummax)
    done_incl = jnp.cumsum(trigger.astype(jnp.int32), axis=axis) > 0
    done_before = done_incl & ~trigger  # exclusive: true only after first trigger
    contribute = (alpha > 0) & ~trigger & ~done_before
    weight = jnp.where(contribute, alpha * excl, 0.0)
    final_T = jnp.where(jnp.any(trigger, axis=axis),
                        # T frozen at first trigger = excl cumprod at trigger idx
                        jnp.max(jnp.where(trigger, excl, 0.0), axis=axis),
                        jnp.take(incl, jnp.array(incl.shape[axis] - 1),
                                 axis=axis))
    return weight, final_T, contribute


def render_dense(means3d, scales, rotations, opacities, colors, camera,
                 bg_color=None, power_cutoff: float = -4.5,
                 scale_modifier: float = 1.0):
    """Oracle render. colors: (N,3) precomputed RGB. Returns dict with
    'render' (H,W,3), 'final_T' (H,W), 'radii' (N,)."""
    W, H = camera.width, camera.height
    prep = projection.preprocess(means3d, scales, rotations, camera,
                                 scale_modifier=scale_modifier)

    order = jnp.argsort(jnp.where(prep.valid, prep.depth, jnp.inf))
    mean2d = prep.mean2d[order]
    conic = prep.conic[order]
    valid = prep.valid[order]
    op = opacities[order] * valid
    col = colors[order]

    ys = jnp.arange(H, dtype=jnp.float32)
    xs = jnp.arange(W, dtype=jnp.float32)
    px, py = jnp.meshgrid(xs, ys)                       # (H, W)

    dx = mean2d[:, 0][:, None, None] - px[None]          # (N, H, W)
    dy = mean2d[:, 1][:, None, None] - py[None]
    # Faithful tile-rect cull: the reference's getRect computes the exclusive
    # max tile as (int)((center + radius + 15)/16), which for fractional
    # centers can *exclude* a tile the 3-sigma ellipse touches. Pixels outside
    # the rect never see the Gaussian in the reference, so the oracle must
    # match (auxiliary.h getRect).
    rect_min = prep.rect_min[order]
    rect_max = prep.rect_max[order]
    tx = (px / projection.TILE).astype(jnp.int32)[None]
    ty = (py / projection.TILE).astype(jnp.int32)[None]
    in_rect = ((tx >= rect_min[:, 0, None, None]) & (tx < rect_max[:, 0, None, None])
               & (ty >= rect_min[:, 1, None, None]) & (ty < rect_max[:, 1, None, None]))
    # Faithful OBB cull (multi-tile rects only, like the reference filter):
    # the clamped sqrt(max(0.1, mid^2 - det)) eigenvalue estimate can shrink
    # the minor axis below the true 3-sigma extent, so the SAT test is not a
    # pure superset of the power cutoff — replicate it exactly.
    ob = binning.obb_pass(tx, ty,
                          prep.mean2d[order][:, None, None, :],
                          prep.eigen_vec[order][:, None, None, :, :],
                          prep.eigen_len[order][:, None, None, :])
    multi = (prep.tiles_touched[order] > 1)[:, None, None]
    in_rect = in_rect & (ob | ~multi)
    a = conic[:, 0][:, None, None]
    b = conic[:, 1][:, None, None]
    c = conic[:, 2][:, None, None]
    power = -0.5 * (a * dx * dx + c * dy * dy) - b * dx * dy
    alpha = jnp.minimum(ALPHA_MAX, op[:, None, None] * jnp.exp(power))
    skip = (power > 0.0) | (power < power_cutoff) | (alpha < ALPHA_MIN) | ~in_rect
    alpha = jnp.where(skip, 0.0, alpha)

    weight, final_T, _ = blend_prefix(alpha, axis=0)
    image = jnp.einsum('nhw,nc->hwc', weight, col)
    if bg_color is not None:
        image = image + final_T[..., None] * jnp.asarray(bg_color)
    radii = jnp.where(prep.valid, prep.radius, 0)
    return {"render": image, "final_T": final_T, "radii": radii}
