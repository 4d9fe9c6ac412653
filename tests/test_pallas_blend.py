"""Pallas blend kernel (interpret mode) vs the XLA reference blend."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fovsplat.ops import binning, blend, projection, rasterize
from fovsplat.ops.pallas import blend_fwd
from tests.utils import make_test_camera, synthetic_cloud


def test_pallas_blend_matches_xla():
    means, scales, quats, ops_, colors = synthetic_cloud(n=300, seed=21)
    cam = make_test_camera(width=96, height=64)
    gx = (cam.width + 15) // 16
    gy = (cam.height + 15) // 16
    cap = 1 << 13
    chunk = 128

    prep = jax.jit(lambda m, s, q: projection.preprocess(m, s, q, cam))(
        means, scales, quats)
    bn = jax.jit(lambda p: binning.bin_gaussians(p, gx, gy, cap))(prep)
    gid = jnp.minimum(bn.pair_gauss, means.shape[0] - 1)
    m2d = prep.mean2d[gid]
    con = prep.conic[gid]
    op = jnp.asarray(ops_)[gid]
    col = jnp.asarray(colors)[gid]

    ref_color, ref_T, ref_nc = jax.jit(
        lambda *a: blend._blend_forward_impl(*a, gx, gy, 256, -4.5))(
        bn.pair_tile, m2d, con, op, col, bn.seg_start, bn.num_pairs)

    packed = blend_fwd.pack_pairs(m2d, con, op, col)
    # Invalid (sentinel) pairs sit beyond every segment, so their content is
    # never read — but ensure finite values anyway.
    pal_color, pal_T, pal_nc = blend_fwd.blend_fwd_pallas(
        packed, bn.seg_start, gx, gy, chunk=chunk, interpret=True)

    np.testing.assert_allclose(np.asarray(pal_T), np.asarray(ref_T),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(pal_color), np.asarray(ref_color),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(pal_nc), np.asarray(ref_nc))
