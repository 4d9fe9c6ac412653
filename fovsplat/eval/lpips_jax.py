"""LPIPS (VGG16 backbone) in JAX.

Counterpart of the reference's local lpipsPyTorch package. Needs pretrained
weights: a .npz with VGG16-feature conv kernels ('convN_M_w', 'convN_M_b',
NHWC/HWIO layout) and LPIPS linear head weights ('linN_w', shape (1,1,C,1)).
This environment has no network egress and no torchvision cache, so the
metric is weight-gated: fovsplat.eval.metrics.lpips returns None when the
file is absent (recorded as null in result JSONs). Drop a weights file at
FOVSPLAT_LPIPS_WEIGHTS to enable.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# VGG16 conv layout: (name, out_channels); pools after blocks.
_VGG_LAYERS = [
    ("conv1_1", 64), ("conv1_2", 64), "pool",
    ("conv2_1", 128), ("conv2_2", 128), "pool",
    ("conv3_1", 256), ("conv3_2", 256), ("conv3_3", 256), "pool",
    ("conv4_1", 512), ("conv4_2", 512), ("conv4_3", 512), "pool",
    ("conv5_1", 512), ("conv5_2", 512), ("conv5_3", 512),
]
# Feature taps (after ReLU of these layers), matching lpips vgg16 slices.
_TAPS = ("conv1_2", "conv2_2", "conv3_3", "conv4_3", "conv5_3")
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


class LPIPS:
    def __init__(self, weights_path: str):
        z = np.load(weights_path)
        self.w = {k: jnp.asarray(z[k]) for k in z.files}
        self._fn = jax.jit(self._forward)

    def _features(self, x):
        # x (B,H,W,3) in [0,1], z-scored like the reference's
        # BaseNet.z_score (lpipsPyTorch/modules/networks.py:50-51): the
        # reference feeds [0,1] tensors straight into (x - mean) / std —
        # richzhang's canonical scaling layer maps [-1,1] first, but the
        # vendored lpipsPyTorch does NOT, and reproducing its published
        # numbers (BASELINE.md LPIPS 0.17881) requires matching the quirk.
        x = (x - _SHIFT) / _SCALE
        feats = []
        h = x
        for layer in _VGG_LAYERS:
            if layer == "pool":
                h = jax.lax.reduce_window(h, -jnp.inf, jax.lax.max,
                                          (1, 2, 2, 1), (1, 2, 2, 1),
                                          "VALID")
                continue
            name, _ = layer
            w = self.w[name + "_w"]
            b = self.w[name + "_b"]
            h = jax.lax.conv_general_dilated(
                h, w, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC")) + b
            h = jax.nn.relu(h)
            if name in _TAPS:
                feats.append(h)
        return feats

    def _forward(self, a, b):
        if a.ndim == 3:
            a = a[None]
            b = b[None]
        fa = self._features(a)
        fb = self._features(b)
        total = 0.0
        for i, (x, y) in enumerate(zip(fa, fb)):
            xn = x / (jnp.linalg.norm(x, axis=-1, keepdims=True) + 1e-10)
            yn = y / (jnp.linalg.norm(y, axis=-1, keepdims=True) + 1e-10)
            d = (xn - yn) ** 2
            lin = self.w[f"lin{i}_w"].reshape(1, 1, -1, 1)
            d = jnp.einsum('bhwc,xyco->bhwo', d, lin)
            total = total + jnp.mean(d)
        return total

    def __call__(self, a, b):
        return self._fn(jnp.asarray(a), jnp.asarray(b))
