"""Approximate mean squared distance to 3 nearest neighbors.

TPU-native replacement for the reference's `simple-knn` CUDA submodule
(fov3dgs/submodules/simple-knn/simple_knn.cu, distCUDA2), used once at model
init for scale initialization. Like the original (Morton-sort + box culling,
also approximate), we sort by Morton code and search a fixed window of
sorted neighbors — fully static shapes, jit-friendly.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _expand_bits(v: jnp.ndarray) -> jnp.ndarray:
    """Spread 10 bits over 30 (classic Morton trick)."""
    v = (v * 0x00010001) & 0xFF0000FF
    v = (v * 0x00000101) & 0x0F00F00F
    v = (v * 0x00000011) & 0xC30C30C3
    v = (v * 0x00000005) & 0x49249249
    return v


def morton_codes(points: jnp.ndarray) -> jnp.ndarray:
    """(N,3) -> (N,) uint32 Morton codes over the bounding box."""
    lo = jnp.min(points, axis=0)
    hi = jnp.max(points, axis=0)
    scaled = (points - lo) / jnp.maximum(hi - lo, 1e-12)
    q = jnp.clip((scaled * 1023.0), 0, 1023).astype(jnp.uint32)
    return (_expand_bits(q[:, 0]) << 2) | (_expand_bits(q[:, 1]) << 1) | _expand_bits(q[:, 2])


@functools.partial(jax.jit, static_argnames=("k", "window"))
def mean_knn_sqdist(points: jnp.ndarray, k: int = 3, window: int = 32) -> jnp.ndarray:
    """Mean squared distance from each point to its k nearest neighbors,
    searching +-window positions in Morton order. Matches the role of
    simple-knn's distCUDA2 (scene/gaussian_model.py:256)."""
    n = points.shape[0]
    order = jnp.argsort(morton_codes(points))
    sorted_pts = points[order]

    offs = jnp.concatenate([jnp.arange(-window, 0), jnp.arange(1, window + 1)])
    idx = jnp.arange(n)[:, None] + offs[None, :]
    idx = jnp.clip(idx, 0, n - 1)
    neigh = sorted_pts[idx]                           # (N, 2w, 3)
    d2 = jnp.sum((neigh - sorted_pts[:, None, :]) ** 2, axis=-1)
    # Self-matches from clipping get +inf.
    d2 = jnp.where(idx == jnp.arange(n)[:, None], jnp.inf, d2)
    top = -jax.lax.top_k(-d2, k)[0]                   # k smallest
    mean = jnp.mean(top, axis=-1)
    inv = jnp.zeros(n, points.dtype).at[order].set(mean)
    return inv
