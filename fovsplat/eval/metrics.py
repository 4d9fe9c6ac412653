"""Quality metrics: PSNR / SSIM / HVS (uniform + foveated) / LPIPS.

Counterpart of fov3dgs/quality_metrics.py + hvs_metrics.py + lpipsPyTorch.
LPIPS requires pretrained VGG features; in this zero-egress environment the
weights may be absent — `lpips()` returns None then, and the JSON writers
record null (documented deviation until weights are provisioned).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from fovsplat.perception import metameric
from fovsplat.train import losses

LPIPS_WEIGHTS = os.environ.get(
    "FOVSPLAT_LPIPS_WEIGHTS",
    os.path.join(os.path.dirname(__file__), "data", "lpips_vgg.npz"))


def psnr(a, b) -> float:
    return float(losses.psnr(jnp.asarray(a), jnp.asarray(b)))


def ssim(a, b) -> float:
    return float(losses.ssim(jnp.asarray(a), jnp.asarray(b)))


def hvs_uniform(a, b, pooling_size: float = 1.0, loss_type: str = "MSE") -> float:
    """Uniform-HVS metric (HVSLoss.calc_uniform_loss, hvs_loss_calc.py:66-70)."""
    a = metameric.resize_for_pyramid(jnp.asarray(a))
    b = metameric.resize_for_pyramid(jnp.asarray(b))
    return float(metameric.metameric_loss_uniform(a, b, pooling_size,
                                                  loss_type=loss_type))


def hvs_fov(a, b, gaze=(0.5, 0.5), alpha: float = 0.05) -> float:
    """Foveated HVS metric (HVSLoss.calc_fov_loss, hvs_loss_calc.py:72-75:
    alpha 0.05, width 1.0, distance 0.5, MSE)."""
    from fovsplat.perception import foveated_loss
    a = metameric.resize_for_pyramid(jnp.asarray(a))
    b = metameric.resize_for_pyramid(jnp.asarray(b))
    return float(foveated_loss.metameric_loss_fov(a, b, gaze=gaze,
                                                  alpha=alpha))


_lpips_net = None


def lpips(a, b) -> float | None:
    """LPIPS-vgg if weights are available, else None."""
    global _lpips_net
    if _lpips_net is None:
        if not os.path.exists(LPIPS_WEIGHTS):
            return None
        from fovsplat.eval import lpips_jax
        _lpips_net = lpips_jax.LPIPS(LPIPS_WEIGHTS)
    return float(_lpips_net(jnp.asarray(a), jnp.asarray(b)))


def image_metrics(render, gt, hvs: bool = True) -> dict:
    """Per-view metric dict in the reference's quality_metrics.py layout."""
    render = jnp.clip(jnp.asarray(render), 0, 1)
    gt = jnp.asarray(gt)
    out = {"ssim": ssim(render, gt), "psnr": psnr(render, gt),
           "lpips": lpips(render, gt)}
    if hvs:
        out["hvs"] = hvs_uniform(render, gt, 1.0)
    return out
