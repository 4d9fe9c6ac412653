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
    u = jnp.uint32
    v = (v * u(0x00010001)) & u(0xFF0000FF)
    v = (v * u(0x00000101)) & u(0x0F00F00F)
    v = (v * u(0x00000011)) & u(0xC30C30C3)
    v = (v * u(0x00000005)) & u(0x49249249)
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
    searching +-window positions along three axis-permuted Morton orders
    (candidate union -> exact top-k over candidates). Matches the role of
    simple-knn's distCUDA2 (scene/gaussian_model.py:256), which is likewise
    an approximate spatial-sort search."""
    n = points.shape[0]
    offs = jnp.concatenate([jnp.arange(-window, 0), jnp.arange(1, window + 1)])
    base = jnp.arange(n)

    def order_cands(perm):
        order = jnp.argsort(morton_codes(points[:, perm]))
        sorted_pts = points[order]
        idx = jnp.clip(base[:, None] + offs[None, :], 0, n - 1)
        d2 = jnp.sum((sorted_pts[idx] - sorted_pts[:, None, :]) ** 2, -1)
        d2 = jnp.where(idx == base[:, None], jnp.inf, d2)
        nb = order[idx]                               # original-space ids
        # Back to original point order.
        w2 = d2.shape[1]
        d2o = jnp.zeros((n, w2), points.dtype).at[order].set(d2)
        nbo = jnp.zeros((n, w2), jnp.int32).at[order].set(nb.astype(jnp.int32))
        return d2o, nbo

    parts = [order_cands(p) for p in ((0, 1, 2), (1, 2, 0), (2, 0, 1))]
    d2 = jnp.concatenate([p[0] for p in parts], axis=1)
    nb = jnp.concatenate([p[1] for p in parts], axis=1)
    # De-duplicate neighbors found by multiple orders: row-sort by id and
    # kill repeats, so top-k sees each neighbor once.
    nb_s, d2_s = jax.lax.sort((nb, d2), num_keys=1, dimension=1,
                              is_stable=True)
    dup = jnp.concatenate([jnp.zeros((n, 1), bool), nb_s[:, 1:] == nb_s[:, :-1]],
                          axis=1)
    d2_s = jnp.where(dup, jnp.inf, d2_s)
    top = -jax.lax.top_k(-d2_s, k)[0]                 # k smallest, unique
    return jnp.mean(top, axis=-1)
