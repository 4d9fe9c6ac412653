"""Gaze-contingent (foveated) metameric loss — pure JAX port.

Counterparts: metamer/odak_perception/metameric_loss.py (MetamericLoss in
the HVSLoss configuration — hvs_loss_calc.py:34-49: quadratic mode, no
radial weighting / foveal-L2 / fullres-L0), radially_varying_blur.py
(mipmap LOD blur) and foveation.py (pooling-size maps — the CPU reference
for the CUDA compute_tile_levels kernel).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from fovsplat.perception import color, metameric, pyramid


def make_pooling_size_map_pixels(gaze, height: int, width: int, alpha,
                                 real_image_width: float,
                                 real_viewing_distance: float,
                                 mode: str = "quadratic"):
    """(H, W) pooling sizes in pixels (foveation.py:94-146)."""
    real_h = real_image_width / width * height
    xs = jnp.linspace(-0.5, 0.5, width) * real_image_width
    ys = jnp.linspace(-0.5, 0.5, height) * real_h
    X, Y = jnp.meshgrid(xs, ys)
    Z = jnp.full_like(X, real_viewing_distance)
    dist = jnp.sqrt(X * X + Y * Y + Z * Z)
    dirx, diry, dirz = X / dist, Y / dist, Z / dist

    def ecc_from(gx, gy):
        g3 = jnp.stack([(gx * 2 - 1) * real_image_width * 0.5,
                        (gy * 2 - 1) * real_h * 0.5,
                        jnp.asarray(real_viewing_distance, jnp.float32)])
        g3 = g3 / jnp.linalg.norm(g3)
        dot = dirx * g3[0] + diry * g3[1] + dirz * g3[2]
        return jnp.arccos(jnp.clip(dot, -1.0, 1.0))

    ecc = ecc_from(jnp.asarray(gaze[0], jnp.float32),
                   jnp.asarray(gaze[1], jnp.float32))
    ecc_centre = ecc_from(jnp.float32(0.5), jnp.float32(0.5))
    pooling_rad = alpha * ecc
    if mode == "quadratic":
        pooling_rad = pooling_rad * ecc
    angle_min = ecc_centre - pooling_rad * 0.5
    angle_max = ecc_centre + pooling_rad * 0.5
    major = (jnp.tan(angle_max) - jnp.tan(angle_min)) * real_viewing_distance
    minor = 2 * dist * jnp.tan(pooling_rad * 0.5)
    area = jnp.abs(math.pi * major * minor * 0.25)
    pooling_real = jnp.sqrt(area)
    return pooling_real / real_image_width * width


def make_lod_map(gaze, height, width, alpha, real_image_width,
                 real_viewing_distance, mode="quadratic"):
    ps = make_pooling_size_map_pixels(gaze, height, width, alpha,
                                      real_image_width,
                                      real_viewing_distance, mode)
    return jnp.maximum(jnp.log2(1e-6 + ps), 0.0)


def radially_varying_blur(image, lod_map):
    """Mipmap LOD blur (radially_varying_blur.py:100-140). image (B,H,W,C),
    lod_map (H,W)."""
    b, h, w, c = image.shape
    mips = [image]
    while mips[-1].shape[1] > 1 and mips[-1].shape[2] > 1:
        mh, mw = mips[-1].shape[1], mips[-1].shape[2]
        mips.append(metameric.adaptive_area_downsample(
            mips[-1], max(mh // 2, 1), max(mw // 2, 1)))
    if mips[-1].shape[2] == 2:
        mips.append(jnp.mean(mips[-1], axis=2, keepdims=True))
    if mips[-1].shape[1] == 2:
        mips.append(jnp.mean(mips[-2], axis=1, keepdims=True))

    full = [mips[0]]
    for m in mips[1:-1]:
        full.append(metameric.bilinear_upsample(m, h, w))
    full.append(jnp.broadcast_to(
        jnp.mean(mips[-1], axis=(1, 2), keepdims=True)
        if mips[-1].shape[1] * mips[-1].shape[2] > 1 else mips[-1],
        image.shape))

    n = len(full)
    lod = lod_map[None, :, :, None]
    frac = jnp.mod(lod, 1.0)
    out = jnp.zeros_like(image)
    for l in range(n):
        if l == 0:
            mask = lod < (l + 1)
        elif l == n - 1:
            mask = lod >= l
        else:
            mask = (lod >= l) & (lod < (l + 1))
        if l == n - 1:
            blended = full[l]
        else:
            blended = (1 - frac) * full[l] + frac * full[l + 1]
        out = jnp.where(mask, blended, out)
    return out


def statsmaps_fov(image, gaze, alpha: float = 0.05,
                  real_image_width: float = 1.0,
                  real_viewing_distance: float = 0.5,
                  n_levels: int = 5, n_orientations: int = 6,
                  colorspace: str = "RGB", mode: str = "quadratic"):
    """Foveated statsmaps (metameric_loss.py calc_statsmaps, HVSLoss
    config). Each pyramid level gets its own LOD map at that level's size."""
    if image.ndim == 3:
        image = image[None]
    if image.shape[-1] == 3 and colorspace == "RGB":
        image = color.rgb_to_ycrcb(image)
    pyr = pyramid.construct_pyramid(image, n_levels, n_orientations,
                                    filter_type="cropped",
                                    use_bilinear_downup=True)

    lod_cache = {}

    def blur(x):
        hh, ww = x.shape[1], x.shape[2]
        if (hh, ww) not in lod_cache:
            lod_cache[(hh, ww)] = make_lod_map(
                gaze, hh, ww, alpha, real_image_width,
                real_viewing_distance, mode)
        return radially_varying_blur(x, lod_cache[(hh, ww)])

    def find_stats(band):
        means = blur(band)
        meansq = blur(band * band)
        variances = jnp.maximum(meansq - means * means, 1e-7)
        return means, jnp.sqrt(variances)

    out = []
    m, s = find_stats(pyr[0]["h"])
    out += [m, s]
    for level in pyr[:-1]:
        for band in level["b"]:
            m, s = find_stats(band)
            out += [m, s]
    out.append(pyr[-1]["l"])
    return out


def metameric_loss_fov(image, target, gaze=(0.5, 0.5), alpha: float = 0.05,
                       real_image_width: float = 1.0,
                       real_viewing_distance: float = 0.5,
                       n_levels: int = 5, n_orientations: int = 6,
                       loss_type: str = "MSE", target_stats=None):
    """HVSLoss.calc_fov_loss equivalent (hvs_loss_calc.py:72-75)."""
    a = statsmaps_fov(image, gaze, alpha, real_image_width,
                      real_viewing_distance, n_levels, n_orientations)
    if target_stats is None:
        target_stats = statsmaps_fov(target, gaze, alpha, real_image_width,
                                     real_viewing_distance, n_levels,
                                     n_orientations)
    return metameric.loss_from_stats(a, target_stats, loss_type)
