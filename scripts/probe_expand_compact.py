"""Standalone TPU compile probe for the compacting expand_fov kernel.
Mosaic errors inside a big jit surface as bare HTTP 500s through the axon
tunnel; compiling the kernel alone prints the real diagnostic. Tiny
shapes; also checks the compacted output against a numpy reference."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from fovsplat.data.cameras import look_at_camera
from fovsplat.ops import foveated as fov
from fovsplat.ops.rasterize import RasterizeConfig, _grid
from tests.utils import synthetic_cloud

rng = np.random.default_rng(7)
n = 2048
means, scales, quats, ops_, colors = synthetic_cloud(n=n, seed=7)
means[:100, 2] = -50.0          # some invalid rows (dummy pairs)
hl = rng.integers(0, 4, (n,)).astype(np.float32)
shs_dcs = rng.normal(0, 0.6, (n, 4, 3)).astype(np.float32)
opac4 = np.clip(ops_[:, None] + rng.normal(0, 0.1, (n, 4)),
                0.05, 0.95).astype(np.float32)
rest = rng.normal(0, 0.03, (n, 15, 3)).astype(np.float32)
cam = look_at_camera([0.3, -0.2, -4.0], [0, 0, 0], [0, -1, 0],
                     fovx=0.9, fovy=0.7, width=256, height=192)

model = jax.jit(fov.pack_fov_model)(means, scales, quats, opac4, shs_dcs,
                                    rest, hl)
gaze = jnp.array([0.5, 0.5], jnp.float32)

cfg = RasterizeConfig(pair_capacity=1 << 15, chunk=256, backend="pallas",
                      pallas_chunk=256, pallas_fwd_only=True)
out = jax.jit(lambda m, g: fov.rasterize_fov_soa(
    m, cam, gaze=g, alpha=0.1, blending=True, config=cfg))(model, gaze)
img = np.asarray(out["render"])
print("kept:", int(out["num_pairs"]), "overflow:", int(out["overflow"]),
      "img finite:", bool(np.isfinite(img).all()),
      "img mean:", float(img.mean()), flush=True)

cfg2 = RasterizeConfig(pair_capacity=1 << 15, chunk=256, backend="pallas",
                       pallas_chunk=256, pallas_fwd_only=True,
                       compact_capacity=int(out["num_pairs"]) + 512 + 256)
out2 = jax.jit(lambda m, g: fov.rasterize_fov_soa(
    m, cam, gaze=g, alpha=0.1, blending=True, config=cfg2))(model, gaze)
img2 = np.asarray(out2["render"])
print("tight-cap overflow:", int(out2["overflow"]),
      "max |diff|:", float(np.abs(img2 - img).max()), flush=True)
