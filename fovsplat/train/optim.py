"""Per-group Adam with pruning/densification state surgery.

Counterpart of the reference's torch.optim.Adam param groups
(scene/gaussian_model.py:273-301: per-tensor lrs, eps=1e-15, xyz on an
exponential schedule) and its Adam-state-consistent row surgery
(_prune_optimizer :624-640, cat_tensors_to_optimizer :666-687).

Implemented by hand instead of optax so the first/second-moment pytrees are
plain GaussianParams-shaped leaves we can gather/concat in lockstep with the
parameters when pruning or densifying.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from fovsplat.models.gaussians import GaussianParams
from fovsplat.utils.general import expon_lr


@dataclasses.dataclass(frozen=True)
class OptimConfig:
    """Defaults = reference OptimizationParams (arguments/__init__.py:71-91)."""
    position_lr_init: float = 1.6e-4
    position_lr_final: float = 1.6e-6
    position_lr_delay_mult: float = 0.01
    position_lr_max_steps: int = 30_000
    feature_lr: float = 2.5e-3
    opacity_lr: float = 0.05
    scaling_lr: float = 5e-3
    rotation_lr: float = 1e-3
    eps: float = 1e-15
    beta1: float = 0.9
    beta2: float = 0.999


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class AdamState:
    mu: Any      # GaussianParams-shaped first moments
    nu: Any      # GaussianParams-shaped second moments
    count: Any   # () int32


def init_state(params: GaussianParams) -> AdamState:
    zeros = jax.tree.map(jnp.zeros_like, params)
    return AdamState(mu=zeros, nu=zeros, count=jnp.zeros((), jnp.int32))


def learning_rates(params: GaussianParams, step, cfg: OptimConfig,
                   spatial_lr_scale: float = 1.0) -> GaussianParams:
    """Per-field lr pytree; xyz follows the exponential schedule
    (update_learning_rate, gaussian_model.py:297-303)."""
    xyz_lr = expon_lr(step, cfg.position_lr_init * spatial_lr_scale,
                      cfg.position_lr_final * spatial_lr_scale,
                      lr_delay_mult=cfg.position_lr_delay_mult,
                      max_steps=cfg.position_lr_max_steps)
    return GaussianParams(
        xyz=xyz_lr,
        features_dc=jnp.float32(cfg.feature_lr),
        features_rest=jnp.float32(cfg.feature_lr / 20.0),
        scaling=jnp.float32(cfg.scaling_lr),
        rotation=jnp.float32(cfg.rotation_lr),
        opacity=jnp.float32(cfg.opacity_lr),
    )


def apply_updates(params: GaussianParams, grads: GaussianParams,
                  state: AdamState, lrs: GaussianParams,
                  cfg: OptimConfig = OptimConfig(),
                  freeze_mask: GaussianParams | None = None):
    """One Adam step. `freeze_mask` (optional pytree of 0/1 per field) zeroes
    updates for frozen fields — used by masking mode, which trains only
    DC-SH + opacity (gaussian_renderer/__init__.py:71-82)."""
    count = state.count + 1
    b1, b2 = cfg.beta1, cfg.beta2
    mu = jax.tree.map(lambda m, g: b1 * m + (1 - b1) * g, state.mu, grads)
    nu = jax.tree.map(lambda v, g: b2 * v + (1 - b2) * g * g, state.nu, grads)
    c = count.astype(jnp.float32)
    mu_hat_scale = 1.0 / (1 - b1 ** c)
    nu_hat_scale = 1.0 / (1 - b2 ** c)

    def upd(p, m, v, lr):
        step = lr * (m * mu_hat_scale) / (jnp.sqrt(v * nu_hat_scale) + cfg.eps)
        return p - step

    new_params = jax.tree.map(upd, params, mu, nu, lrs)
    if freeze_mask is not None:
        new_params = jax.tree.map(
            lambda new, old, keep: jnp.where(keep, new, old),
            new_params, params, freeze_mask)
        mu = jax.tree.map(lambda m, keep: m * keep, mu, freeze_mask)
        nu = jax.tree.map(lambda v, keep: v * keep, nu, freeze_mask)
    return new_params, AdamState(mu=mu, nu=nu, count=count)


def select_rows(state: AdamState, idx) -> AdamState:
    """Row surgery to mirror pruning (reference _prune_optimizer keeps
    exp_avg/exp_avg_sq rows of survivors)."""
    return AdamState(mu=jax.tree.map(lambda x: x[idx], state.mu),
                     nu=jax.tree.map(lambda x: x[idx], state.nu),
                     count=state.count)


def concat_rows(state: AdamState, n_new: int) -> AdamState:
    """Append zero-state rows for densified Gaussians
    (cat_tensors_to_optimizer)."""
    def cat(x):
        pad = jnp.zeros((n_new,) + x.shape[1:], x.dtype)
        return jnp.concatenate([x, pad], axis=0)
    return AdamState(mu=jax.tree.map(cat, state.mu),
                     nu=jax.tree.map(cat, state.nu), count=state.count)


def replace_field(state: AdamState, field: str) -> AdamState:
    """Zero the moments of one field (replace_tensor_to_optimizer — used by
    reset_opacity_max)."""
    mu = dataclasses.replace(state.mu, **{
        field: jnp.zeros_like(getattr(state.mu, field))})
    nu = dataclasses.replace(state.nu, **{
        field: jnp.zeros_like(getattr(state.nu, field))})
    return AdamState(mu=mu, nu=nu, count=state.count)
