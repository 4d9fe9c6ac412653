"""HVS metameric loss vs the reference torch implementation (test oracle).

The reference's modified odak library is imported read-only from
/root/reference/metamer purely as a numerical oracle — skipped if absent.
"""

import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fovsplat.perception import metameric

REF = "/root/reference/metamer"
HAS_REF = os.path.isdir(REF)


@pytest.fixture(scope="module")
def images():
    rng = np.random.default_rng(3)
    a = rng.uniform(0, 1, (1, 64, 64, 3)).astype(np.float32)
    # Correlated target: smooth perturbation.
    b = np.clip(a + 0.1 * rng.normal(0, 1, a.shape).astype(np.float32), 0, 1)
    return a, b


@pytest.mark.skipif(not HAS_REF, reason="reference odak not available")
@pytest.mark.parametrize("pooling_size,loss_type",
                         [(1, "MSE"), (3, "L1"), (12, "MSE")])
def test_uniform_loss_matches_reference(images, pooling_size, loss_type):
    a, b = images
    sys.path.insert(0, REF)
    import torch
    from odak_perception import MetamericLossUniform

    ref_loss_fn = MetamericLossUniform(
        device=torch.device("cpu"), pooling_size=pooling_size,
        n_pyramid_levels=5, n_orientations=6, loss_type=loss_type,
        bilinear_downsampling=True)
    ta = torch.from_numpy(a.transpose(0, 3, 1, 2))
    tb = torch.from_numpy(b.transpose(0, 3, 1, 2))
    ref = float(ref_loss_fn(ta, tb))

    ours = float(jax.jit(
        lambda x, y: metameric.metameric_loss_uniform(
            x, y, pooling_size, n_levels=5, n_orientations=6,
            loss_type=loss_type))(jnp.asarray(a), jnp.asarray(b)))
    assert abs(ours - ref) / max(abs(ref), 1e-12) < 1e-3, (ours, ref)


def test_uniform_loss_zero_for_identical(images):
    a, _ = images
    val = float(jax.jit(
        lambda x: metameric.metameric_loss_uniform(x, x, 3))(jnp.asarray(a)))
    assert val < 1e-7


def test_resize_for_pyramid():
    img = jnp.ones((1, 50, 70, 3))
    out = metameric.resize_for_pyramid(img, 5)
    assert out.shape == (1, 64, 96, 3)


@pytest.mark.skipif(not HAS_REF, reason="reference odak not available")
def test_foveated_loss_matches_reference(images):
    a, b = images
    sys.path.insert(0, REF)
    import torch
    from odak_perception import MetamericLoss

    ref_fn = MetamericLoss(
        device=torch.device("cpu"), alpha=0.05, real_image_width=1.0,
        real_viewing_distance=0.5, n_pyramid_levels=5, mode="quadratic",
        n_orientations=6, use_l2_foveal_loss=False, fovea_weight=False,
        use_radial_weight=False, use_fullres_l0=False, equi=False,
        loss_type="MSE", use_bilinear_downup=True)
    ta = torch.from_numpy(a.transpose(0, 3, 1, 2))
    tb = torch.from_numpy(b.transpose(0, 3, 1, 2))
    ref = float(ref_fn(ta, tb, gaze=[0.5, 0.5]))

    from fovsplat.perception import foveated_loss
    import jax.numpy as jnp
    ours = float(jax.jit(lambda x, y: foveated_loss.metameric_loss_fov(
        x, y, gaze=(0.5, 0.5), alpha=0.05))(jnp.asarray(a), jnp.asarray(b)))
    assert abs(ours - ref) / max(abs(ref), 1e-12) < 2e-3, (ours, ref)
