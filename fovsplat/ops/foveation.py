"""Eccentricity-driven per-tile quality levels (MetaSapiens foveation).

TPU-native port of ``compute_tile_levels_cuda`` and
``compute_tile_level_infos_cuda``
(..._fov_pcheck_obb/cuda_rasterizer/rasterizer_impl.cu:120-259) — a dozen
lines of per-tile jnp math, no kernel needed. The CUDA build bakes the
foveation constants into headers (auxiliary.h:26-32, recompile to change
fov_num); here they are runtime parameters.
"""

from __future__ import annotations

import dataclasses
import math

import jax.numpy as jnp

from fovsplat.ops.projection import TILE


@dataclasses.dataclass(frozen=True)
class FoveationConfig:
    fov_num: int = 4
    real_image_width: float = 2.0
    real_viewing_distance: float = 1.0
    sqrt_max_ps: float = math.sqrt(12.0)     # 3.4641016151377544
    start_blend: float = 0.5
    blend_width: float = 0.5


def _ncd2dir(ncd_x, ncd_y, real_w, real_h, dist):
    x = (ncd_x - 0.5) * real_w
    y = (ncd_y - 0.5) * real_h
    z = jnp.full_like(x + y, dist)
    n = jnp.sqrt(x * x + y * y + z * z)
    return x / n, y / n, z / n


def ps2level(ps, cfg: FoveationConfig):
    step = (cfg.sqrt_max_ps - 1.0) / (cfg.fov_num - 1)
    return jnp.where(ps <= 1.0, 0.0, (jnp.sqrt(jnp.maximum(ps, 1.0)) - 1.0) / step)


def tile_levels_at(tx, ty, gaze, width: int, height: int, alpha,
                   cfg: FoveationConfig = FoveationConfig()) -> jnp.ndarray:
    """Fractional foveation level at tile coords (tx, ty) — pure elementwise
    math, usable per-tile OR per-(Gaussian, tile) pair (recomputing per pair
    is ~10x cheaper than a CAP-sized gather from the per-tile table)."""
    px = tx.astype(jnp.float32) * TILE + TILE / 2
    py = ty.astype(jnp.float32) * TILE + TILE / 2
    real_w = cfg.real_image_width
    real_h = height / width * real_w
    dist = cfg.real_viewing_distance

    ncx = px / width
    ncy = py / height
    dx, dy, dz = _ncd2dir(ncx, ncy, real_w, real_h, dist)
    gdx, gdy, gdz = _ncd2dir(gaze[0], gaze[1], real_w, real_h, dist)
    cdx, cdy, cdz = _ncd2dir(jnp.float32(0.5), jnp.float32(0.5), real_w, real_h, dist)

    ecc = jnp.arccos(jnp.clip(dx * gdx + dy * gdy + dz * gdz, -1.0, 1.0))
    ecc_center = jnp.arccos(jnp.clip(dx * cdx + dy * cdy + dz * cdz, -1.0, 1.0))

    pooling_rad = alpha * ecc * ecc
    angle_min = ecc_center - pooling_rad * 0.5
    angle_max = ecc_center + pooling_rad * 0.5
    d2pix = jnp.sqrt(((ncx - 0.5) * real_w) ** 2 + ((ncy - 0.5) * real_h) ** 2
                     + dist * dist)
    major = (jnp.tan(angle_max) - jnp.tan(angle_min)) * dist
    minor = 2.0 * d2pix * jnp.tan(pooling_rad * 0.5)
    area = jnp.pi * major * minor * 0.25
    ps = jnp.sqrt(jnp.maximum(area, 0.0)) * (width / real_w)
    level = ps2level(ps, cfg)
    return jnp.minimum(level, cfg.fov_num - 0.1)


def compute_tile_levels(gaze, width: int, height: int, alpha,
                        cfg: FoveationConfig = FoveationConfig()) -> jnp.ndarray:
    """gaze: (2,) NDC in [0,1]. Returns (grid_y*grid_x,) fractional levels."""
    gx = (width + TILE - 1) // TILE
    gy = (height + TILE - 1) // TILE
    t = jnp.arange(gx * gy)
    return tile_levels_at(t % gx, t // gx, gaze, width, height, alpha, cfg)


def compute_tile_level_infos(levels: jnp.ndarray, width: int, height: int,
                             cfg: FoveationConfig = FoveationConfig()):
    """Central-difference level gradients + per-tile blending decision
    (compute_tile_level_infos_cuda). Returns (grad_x, grad_y, level_min,
    blending) each (T,)."""
    gx = (width + TILE - 1) // TILE
    gy = (height + TILE - 1) // TILE
    lv = levels.reshape(gy, gx)

    def _grad(l, axis):
        fwd = jnp.roll(l, -1, axis) - l          # neighbor(+1) - self
        bwd = l - jnp.roll(l, 1, axis)           # self - neighbor(-1)
        ctr = 0.5 * (jnp.roll(l, -1, axis) - jnp.roll(l, 1, axis))
        n = l.shape[axis]
        idx = jnp.arange(n)
        has_lo = (idx > 0)
        has_hi = (idx < n - 1)
        shape = [1, 1]
        shape[axis] = n
        has_lo = has_lo.reshape(shape)
        has_hi = has_hi.reshape(shape)
        g = jnp.where(has_lo & has_hi, ctr,
                      jnp.where(has_hi, fwd, jnp.where(has_lo, bwd, 0.0)))
        return g

    grad_x = _grad(lv, 1)
    grad_y = _grad(lv, 0)
    max_delta = 0.5 * (jnp.abs(grad_x) + jnp.abs(grad_y))
    tile_min = lv - max_delta
    tile_min_i = jnp.trunc(tile_min)   # CUDA float(int(x)) truncates to 0
    blending = ((tile_min - tile_min_i) > cfg.start_blend) & (tile_min_i < cfg.fov_num - 1)
    return (grad_x.reshape(-1), grad_y.reshape(-1), tile_min.reshape(-1),
            blending.reshape(-1))
