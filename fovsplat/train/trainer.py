"""Functional training steps over the rasterizer.

The reference's training loops (eff_finetune.py, prune.py,
metric_mask_learn.py) share one inner step: render -> photometric (or HVS)
loss -> backward -> per-group Adam. Here that step is a pure jitted function
of (params, opt_state, camera, gt, step); the outer loops live in
fovsplat.train.finetune / prune / mask.
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp

from fovsplat.models.gaussians import GaussianParams
from fovsplat.ops import rasterize as rast
from fovsplat.train import losses, optim


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    raster: rast.RasterizeConfig = rast.RasterizeConfig()
    optim: optim.OptimConfig = optim.OptimConfig()
    lambda_dssim: float = 0.2
    sh_degree: int = 3
    spatial_lr_scale: float = 1.0
    masking: bool = False   # train only DC-SH + opacity (metric_mask_learn)


def render_params(params: GaussianParams, camera, cfg: TrainConfig,
                  bg_color=None):
    return rast.rasterize(
        params.xyz, params.get_scaling(), params.get_rotation(),
        params.get_opacity(), camera, shs=params.get_features(),
        sh_degree=cfg.sh_degree, bg_color=bg_color, config=cfg.raster)


def _freeze_mask(cfg: TrainConfig):
    if not cfg.masking:
        return None
    # masking mode: only f_dc + opacity trainable
    # (gaussian_renderer/__init__.py:71-82 detaches the rest).
    return GaussianParams(xyz=jnp.float32(0), features_dc=jnp.float32(1),
                          features_rest=jnp.float32(0),
                          scaling=jnp.float32(0), rotation=jnp.float32(0),
                          opacity=jnp.float32(1))


def make_train_step(cfg: TrainConfig,
                    loss_fn: Callable | None = None,
                    axis_name: str | None = None):
    """Build the jittable step. `loss_fn(render, gt) -> scalar` defaults to
    0.8*L1 + 0.2*(1-SSIM). If `axis_name` is set the step is meant to run
    inside shard_map/pmap over that axis: gradients are pmean'd before the
    update (replicated-parameter data parallelism over views)."""
    if loss_fn is None:
        def loss_fn(render, gt):
            return losses.photometric_loss(render, gt, cfg.lambda_dssim)

    def step(params: GaussianParams, opt_state: optim.AdamState,
             camera, gt, step_idx, bg_color=None):
        def objective(p):
            out = render_params(p, camera, cfg, bg_color=bg_color)
            return loss_fn(out["render"], gt), out

        (loss, out), grads = jax.value_and_grad(objective, has_aux=True)(params)
        if axis_name is not None:
            grads = jax.lax.pmean(grads, axis_name)
            loss = jax.lax.pmean(loss, axis_name)
        lrs = optim.learning_rates(params, step_idx, cfg.optim,
                                   cfg.spatial_lr_scale)
        new_params, new_state = optim.apply_updates(
            params, grads, opt_state, lrs, cfg.optim,
            freeze_mask=_freeze_mask(cfg))
        aux = {"loss": loss, "radii": out["radii"],
               "overflow": out["binned"].overflow,
               "num_pairs": out["binned"].num_pairs}
        return new_params, new_state, aux

    return step
