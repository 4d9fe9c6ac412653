"""Color conversions.

Parity: metamer/odak_perception/color_conversion.py:382-430 (the ITU-R-style
YCrCb used by every metameric loss). Images are NHWC floats in [0, 1].
"""

from __future__ import annotations

import jax.numpy as jnp


def rgb_to_ycrcb(image: jnp.ndarray) -> jnp.ndarray:
    """(..., H, W, 3) RGB -> YCrCb."""
    r = image[..., 0]
    g = image[..., 1]
    b = image[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cr = 0.5 + 0.713 * (r - y)
    cb = 0.5 + 0.564 * (b - y)
    return jnp.stack([y, cr, cb], axis=-1)


def ycrcb_to_rgb(image: jnp.ndarray) -> jnp.ndarray:
    y = image[..., 0]
    cr = image[..., 1]
    cb = image[..., 2]
    r = y + 1.403 * (cr - 0.5)
    g = y - 0.714 * (cr - 0.5) - 0.344 * (cb - 0.5)
    b = y + 1.773 * (cb - 0.5)
    return jnp.stack([r, g, b], axis=-1)
