"""Uniform metameric (HVS) loss — pure JAX port.

Parity target: metamer/odak_perception/metameric_loss_uniform.py as used by
the reference training/eval scripts (always bilinear_downsampling=True,
n_levels=5, n_orientations=6; loss L1 for mask training, MSE for eval —
metric_mask_learn.py:122-149, hvs_loss_calc.py:21-33).

Statsmaps: for the highpass band and each oriented band at each level,
mean and std over `pooling_size` windows computed as
area-downsample(1/ps) -> bilinear-upsample (uniform_blur,
metameric_loss_uniform.py:8-12); pooling size halves per level; the final
lowpass residual enters raw. Loss = mean over maps of L1/MSE.

The reference caches target stats on tensor identity; here the API is
functional — use `statsmaps()` once on the target and reuse.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp

from fovsplat.perception import color, pyramid


def adaptive_area_downsample(x, out_h: int, out_w: int):
    """torch F.interpolate(mode='area') == adaptive average pooling with
    bins [floor(i*H/out), ceil((i+1)*H/out)). Exact via integral images."""
    b, h, w, c = x.shape
    if h % out_h == 0 and w % out_w == 0:
        fh, fw = h // out_h, w // out_w
        return x.reshape(b, out_h, fh, out_w, fw, c).mean(axis=(2, 4))

    def pool_axis(arr, size, out, axis):
        cs = jnp.cumsum(arr, axis=axis)
        cs = jnp.concatenate([jnp.zeros_like(jnp.take(cs, jnp.array([0]),
                                                      axis=axis)), cs],
                             axis=axis)
        i = jnp.arange(out)
        starts = jnp.floor(i * size / out).astype(jnp.int32)
        ends = jnp.ceil((i + 1) * size / out).astype(jnp.int32)
        hi = jnp.take(cs, ends, axis=axis)
        lo = jnp.take(cs, starts, axis=axis)
        return (hi - lo) / (ends - starts).reshape(
            [-1 if a == axis else 1 for a in range(arr.ndim)])

    x = pool_axis(x, h, out_h, 1)
    x = pool_axis(x, w, out_w, 2)
    return x


def bilinear_upsample(x, out_h: int, out_w: int):
    """torch F.interpolate(mode='bilinear', align_corners=False)."""
    b, h, w, c = x.shape
    # antialias=False: torch's bilinear interpolate does not prefilter.
    return jax.image.resize(x, (b, out_h, out_w, c), method="linear",
                            antialias=False)


def uniform_blur(x, pooling_size):
    """uniform_blur (metameric_loss_uniform.py:8-12). Note the reference
    applies this even for pooling sizes < 1 (levels halve the pooling size):
    an area-*resample* to floor(size/ps) — larger than the input — followed
    by bilinear back. Not an identity; replicate exactly."""
    if pooling_size == 1:
        return x
    b, h, w, c = x.shape
    oh = max(int(h / pooling_size), 1)
    ow = max(int(w / pooling_size), 1)
    down = adaptive_area_downsample(x, oh, ow)
    return bilinear_upsample(down, h, w)


def _find_stats(band, pooling_size, eps=1e-7):
    means = uniform_blur(band, pooling_size)
    meansq = uniform_blur(band * band, pooling_size)
    variances = jnp.maximum(meansq - means * means, eps)
    return means, jnp.sqrt(variances)


def statsmaps(image, pooling_size, n_levels: int = 5,
              n_orientations: int = 6, colorspace: str = "RGB"):
    """image (B,H,W,C) or (H,W,C); returns list of stats arrays."""
    if image.ndim == 3:
        image = image[None]
    if image.shape[-1] == 3 and colorspace == "RGB":
        image = color.rgb_to_ycrcb(image)
    pyr = pyramid.construct_pyramid(image, n_levels, n_orientations,
                                    filter_type="cropped",
                                    use_bilinear_downup=True)
    out = []
    ps = pooling_size
    m, s = _find_stats(pyr[0]["h"], ps)
    out += [m, s]
    for level in pyr[:-1]:
        for band in level["b"]:
            m, s = _find_stats(band, ps)
            out += [m, s]
        ps = ps / 2
    out.append(pyr[-1]["l"])
    return out


def loss_from_stats(stats_a, stats_b, loss_type: str = "L1"):
    total = 0.0
    for a, b in zip(stats_a, stats_b):
        if loss_type == "MSE":
            total = total + jnp.mean((a - b) ** 2)
        else:
            total = total + jnp.mean(jnp.abs(a - b))
    return total / len(stats_a)


def metameric_loss_uniform(image, target, pooling_size, n_levels: int = 5,
                           n_orientations: int = 6, loss_type: str = "L1",
                           target_stats=None):
    """MetamericLossUniform.__call__ equivalent. Pass precomputed
    `target_stats` to skip recomputing the target pyramid."""
    a = statsmaps(image, pooling_size, n_levels, n_orientations)
    if target_stats is None:
        target_stats = statsmaps(target, pooling_size, n_levels,
                                 n_orientations)
    return loss_from_stats(a, target_stats, loss_type)


def resize_for_pyramid(image, n_levels: int = 5):
    """HVSLoss.resize_img (hvs_loss_calc.py:52-65): bilinear-resize up to the
    next multiple of 2^n_levels when needed."""
    if image.ndim == 3:
        image = image[None]
    d = 2 ** n_levels
    b, h, w, c = image.shape
    rh = math.ceil(h / d) * d
    rw = math.ceil(w / d) * d
    if rh == h and rw == w:
        return image
    return bilinear_upsample(image, rh, rw)


def gen_metamer(image, pooling_size, n_levels: int = 5,
                n_orientations: int = 6, key=None):
    """Generate a metamer: noise pyramid with per-band statistics matched to
    the target's statsmaps (metameric_loss_uniform.py:160-216, after
    Freeman & Simoncelli / Walton et al.)."""
    import jax

    from fovsplat.perception import color as color_mod
    from fovsplat.perception import pyramid as pyr_mod
    if image.ndim == 3:
        image = image[None]
    ycrcb = color_mod.rgb_to_ycrcb(image)
    stats = statsmaps(ycrcb, pooling_size, n_levels, n_orientations,
                      colorspace="YCrCb")
    means = stats[::2]
    stds = stats[1::2]
    if key is None:
        key = jax.random.PRNGKey(0)
    noise = jax.random.uniform(key, ycrcb.shape)
    npyr = pyr_mod.construct_pyramid(noise, n_levels, n_orientations,
                                     "cropped", True)
    ipyr = pyr_mod.construct_pyramid(ycrcb, n_levels, n_orientations,
                                     "cropped", True)

    def match(level, mean_map, std_map):
        level = level - jnp.mean(level)
        input_std = jnp.maximum(jnp.sqrt(jnp.mean(level * level)), 1e-6)
        return level / input_std * std_map + mean_map

    nbands = len(npyr[0]["b"])
    npyr[0]["h"] = match(npyr[0]["h"], means[0], stds[0])
    for l in range(len(npyr) - 1):
        for b in range(nbands):
            idx = 1 + l * nbands + b
            npyr[l]["b"][b] = match(npyr[l]["b"][b], means[idx], stds[idx])
    npyr[-1]["l"] = ipyr[-1]["l"]
    metamer = pyr_mod.reconstruct_from_pyramid(npyr, n_orientations,
                                               "cropped", True)
    return color_mod.ycrcb_to_rgb(metamer)


def metamer_mse_loss(image, target, pooling_size, n_levels: int = 5,
                     n_orientations: int = 6, key=None):
    """MetamerMSELoss equivalent: MSE against a generated metamer of the
    target (metamer_mse_loss.py)."""
    m = jax.lax.stop_gradient(gen_metamer(target, pooling_size, n_levels,
                                          n_orientations, key))
    return jnp.mean((image - m) ** 2)


def blur_loss(image, target, gaze=(0.5, 0.5), alpha: float = 0.2,
              real_image_width: float = 0.2,
              real_viewing_distance: float = 0.7, blur_source: bool = False):
    """BlurLoss equivalent (blur_loss.py): MSE against a radially-varying
    blurred target (optionally blurring the source too)."""
    from fovsplat.perception import foveated_loss as fl
    if image.ndim == 3:
        image = image[None]
    if target.ndim == 3:
        target = target[None]
    h, w = target.shape[1:3]
    lod = fl.make_lod_map(gaze, h, w, alpha, real_image_width,
                          real_viewing_distance)
    bt = fl.radially_varying_blur(target, lod)
    src = fl.radially_varying_blur(image, lod) if blur_source else image
    return jnp.mean((src - bt) ** 2)
