"""Shared test fixtures: synthetic Gaussian clouds + cameras."""

import numpy as np

from fovsplat.data.cameras import look_at_camera


def synthetic_cloud(n=512, seed=0, spread=1.0, scale_lo=0.01, scale_hi=0.12):
    rng = np.random.default_rng(seed)
    means = rng.normal(0, spread, (n, 3)).astype(np.float32)
    scales = rng.uniform(scale_lo, scale_hi, (n, 3)).astype(np.float32)
    quats = rng.normal(0, 1, (n, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=1, keepdims=True)
    opacities = rng.uniform(0.2, 0.95, (n,)).astype(np.float32)
    colors = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    return means, scales, quats, opacities, colors


def make_test_camera(width=128, height=96, dist=4.0, fov=0.9):
    fovx = fov
    fovy = 2 * np.arctan(np.tan(fov / 2) * height / width)
    return look_at_camera(eye=[0.3, -0.2, -dist], target=[0, 0, 0],
                          up=[0, -1, 0], fovx=fovx, fovy=fovy,
                          width=width, height=height)
