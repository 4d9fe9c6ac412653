"""Small math/schedule helpers (reference: fov3dgs/utils/general_utils.py)."""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np


def inverse_sigmoid(x):
    return jnp.log(x / (1.0 - x))


def expon_lr(step, lr_init: float, lr_final: float, lr_delay_steps: int = 0,
             lr_delay_mult: float = 1.0, max_steps: int = 1_000_000):
    """Log-linear lr interpolation with optional delayed warmup
    (general_utils.py get_expon_lr_func). Works on traced or python steps."""
    if lr_init == lr_final == 0.0:
        return jnp.zeros_like(jnp.asarray(step, jnp.float32))
    step = jnp.asarray(step, jnp.float32)
    if lr_delay_steps > 0:
        delay_rate = lr_delay_mult + (1 - lr_delay_mult) * jnp.sin(
            0.5 * math.pi * jnp.clip(step / lr_delay_steps, 0, 1))
    else:
        delay_rate = 1.0
    t = jnp.clip(step / max_steps, 0, 1)
    log_lerp = jnp.exp(jnp.log(lr_init) * (1 - t) + jnp.log(lr_final) * t)
    return delay_rate * log_lerp


def strip_symmetric(cov):
    """(N,3,3) -> (N,6) upper triangle (xx, xy, xz, yy, yz, zz)."""
    return jnp.stack([cov[..., 0, 0], cov[..., 0, 1], cov[..., 0, 2],
                      cov[..., 1, 1], cov[..., 1, 2], cov[..., 2, 2]], -1)


def pad_to(x: np.ndarray, n: int, fill=0):
    """Pad axis 0 of x to length n with `fill`."""
    if x.shape[0] >= n:
        return x[:n]
    pad = np.full((n - x.shape[0],) + x.shape[1:], fill, dtype=x.dtype)
    return np.concatenate([x, pad], axis=0)
