"""Calibrate the bicycle proxy scene (fovsplat/data/proxy.py).

Targets (reference values for Mip360 bicycle at 1237x822):
  * kept pairs at the center gaze ~= 1.5M (OBB + level cull)
  * ragged per-tile histogram: report percentiles + max segment
Run on CPU: PYTHONPATH= JAX_PLATFORMS=cpu python scripts/calibrate_proxy.py
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from fovsplat.data import proxy
from fovsplat.ops import binning, foveation, projection
from fovsplat.ops import foveated as fov
from fovsplat.ops.rasterize import _grid

ap = argparse.ArgumentParser()
ap.add_argument("--n", type=int, default=proxy.BICYCLE_PNUM[0])
ap.add_argument("--scale-mult", type=float, default=0.45)
ap.add_argument("--gaze", type=float, nargs=2, default=[0.5, 0.5])
ap.add_argument("--cap", type=int, default=1 << 23)
args = ap.parse_args()

sc = proxy.bicycle_proxy(n=args.n, scale_mult=args.scale_mult)
cam = proxy.proxy_camera()
gx, gy = _grid(cam)
num_tiles = gx * gy
gaze = jnp.asarray(args.gaze, jnp.float32)
fc = foveation.FoveationConfig()

levels = foveation.compute_tile_levels(gaze, cam.width, cam.height, 0.05, fc)
hl = jnp.asarray(sc["highest_levels"])
prep = projection.preprocess(jnp.asarray(sc["means"]),
                             jnp.asarray(sc["scales"]),
                             jnp.asarray(sc["rotations"]), cam)
print("valid:", int(jnp.sum(prep.valid)), "/", args.n,
      "AABB pairs:", int(jnp.sum(prep.tiles_touched)))
prep2 = fov._clip_rects_to_levels(prep, levels, hl, gx, gy, 4)
print("after level clip:", int(jnp.sum(prep2.tiles_touched)))


def level_mask(orig, tile):
    t = jnp.minimum(tile, num_tiles - 1)
    return levels[t] < hl[orig] + 1.0


bn = binning.bin_gaussians(prep2, gx, gy, args.cap, tile_mask_fn=level_mask,
                           use_obb=True)
kept = int(bn.num_pairs)
seg = np.asarray(bn.seg_start)
lens = np.diff(seg)
print(f"kept pairs: {kept} (target ~1.5M) overflow={int(bn.overflow)}")
print("per-tile segment percentiles:",
      {p: int(np.percentile(lens, p)) for p in (50, 90, 99, 99.9)},
      "max:", int(lens.max()), "empty tiles:", int((lens == 0).sum()),
      "/", num_tiles)
