"""Real-valued spatial steerable pyramid (JAX/NHWC).

TPU-native port of the reference's modified-odak pyramid
(metamer/odak_perception/spatial_steerable_pyramid.py): depthwise 2D convs
with reflection padding for h0/l0/band filters; down/upsampling either
bilinear ("area" 2x pooling, the HVSLoss configuration,
fov3dgs/hvs_loss_calc.py:23 bilinear_downsampling=True) or via the large
lowpass filter + stride-2 sampling.

Filter constants are the public NYU pyrtools steerable-pyramid filters
(LabForComputationalVision/pyrtools), including odak's "cropped" 5x5
variants (crop + renormalize, steerable_pyramid_filters.py:4-43), stored as
data in perception/data/sp_filters_nyu.npz.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

_DATA = os.path.join(os.path.dirname(__file__), "data", "sp_filters_nyu.npz")


@functools.lru_cache(maxsize=None)
def load_filters(n_orientations: int = 6, filter_type: str = "cropped"):
    """Returns dict with 'h0' (k,k), 'l0' (k,k), 'l' (m,m), 'b' (O,k,k)."""
    z = np.load(_DATA)
    pre = f"o{n_orientations}_{filter_type}_"
    # numpy (not jnp) so the lru_cache never captures traced constants.
    return {k: np.asarray(z[pre + k], np.float32)
            for k in ("h0", "l0", "l", "b")}


def _reflect_pad(x, pad):
    return jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="reflect")


def depthwise_conv(x, kernel):
    """x (B,H,W,C), kernel (k,k) applied per channel, reflection 'same'."""
    c = x.shape[-1]
    k = kernel.shape[-1]
    pad = (k - 1) // 2
    x = _reflect_pad(x, pad)
    w = jnp.broadcast_to(kernel[:, :, None, None], (k, k, 1, c))
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c)


def area_downsample_2x(x):
    """torch interpolate(scale_factor=0.5, mode='area') == 2x2 avg pool."""
    b, h, w, c = x.shape
    return x.reshape(b, h // 2, 2, w // 2, 2, c).mean(axis=(2, 4))


def construct_pyramid(image, n_levels: int = 5, n_orientations: int = 6,
                      filter_type: str = "cropped",
                      use_bilinear_downup: bool = True,
                      multiple_highpass: bool = False):
    """image (B,H,W,C), H and W divisible by 2^n_levels (the reference raises
    otherwise; callers resize first — HVSLoss.resize_img).

    Returns list of dicts: [{'h','l','b'(list)}, ..., {'l'}], largest first.
    """
    f = load_filters(n_orientations, filter_type)
    pyramid = []
    level0 = {"h": depthwise_conv(image, f["h0"])}
    lowpass = depthwise_conv(image, f["l0"])
    level0["l"] = lowpass
    level0["b"] = [depthwise_conv(lowpass, f["b"][o])
                   for o in range(f["b"].shape[0])]
    pyramid.append(level0)

    for _ in range(n_levels - 2):
        if use_bilinear_downup:
            lowpass = area_downsample_2x(lowpass)
        else:
            lowpass = depthwise_conv(lowpass, f["l"])[:, ::2, ::2, :]
        level = {"l": lowpass,
                 "b": [depthwise_conv(lowpass, f["b"][o])
                       for o in range(f["b"].shape[0])]}
        if multiple_highpass:
            level["h"] = depthwise_conv(lowpass, f["h0"])
        pyramid.append(level)

    if use_bilinear_downup:
        lowpass = area_downsample_2x(lowpass)
    else:
        lowpass = depthwise_conv(lowpass, f["l"])[:, ::2, ::2, :]
    pyramid.append({"l": lowpass})
    return pyramid


def reconstruct_from_pyramid(pyr, n_orientations: int = 6,
                             filter_type: str = "cropped",
                             use_bilinear_downup: bool = True):
    """Inverse transform (spatial_steerable_pyramid.py:182-223): upsample the
    lowpass, subtract re-filtered bands per level, final l0/h0 combination."""
    import jax.numpy as jnp
    f = load_filters(n_orientations, filter_type)

    def upsample(img, hw):
        if use_bilinear_downup:
            from fovsplat.perception.metameric import bilinear_upsample
            return bilinear_upsample(img, hw[0], hw[1])
        b, h, w, c = img.shape
        zeros = jnp.zeros((b, h * 2, w * 2, c), img.dtype)
        zeros = zeros.at[:, ::2, ::2, :].set(img)
        return depthwise_conv(zeros, f["l"])

    image = pyr[-1]["l"]
    for level in reversed(pyr[:-1]):
        hw = level["b"][0].shape[1:3]
        image = upsample(image, hw)
        for b in range(len(level["b"])):
            image = image + depthwise_conv(level["b"][b], -f["b"][b])
    image = depthwise_conv(image, f["l0"])
    image = image + depthwise_conv(pyr[0]["h"], f["h0"])
    return image
