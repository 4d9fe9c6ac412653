"""Per-stage TPU timing of the foveated render path (mirrors
ops/foveated.rasterize_fov's current stage composition: level-rect clip,
carried geometry payloads, 3M pair capacity)."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from fovsplat.data.cameras import look_at_camera
from fovsplat.ops import binning, foveation, projection
from fovsplat.ops import foveated as fov
from fovsplat.ops.pallas import blend_fov as pkf
from fovsplat.ops.rasterize import RasterizeConfig, _grid

rng = np.random.default_rng(0)
n = 1_161_358
L = 4
means = jnp.asarray(rng.normal(0, 1.2, (n, 3)), jnp.float32)
scales = jnp.asarray(rng.uniform(0.002, 0.012, (n, 3)), jnp.float32)
quats = rng.normal(0, 1, (n, 4)); quats /= np.linalg.norm(quats, axis=1, keepdims=True)
quats = jnp.asarray(quats, jnp.float32)
hl = jnp.asarray(rng.integers(0, 4, (n,)), jnp.float32)
shs_dcs = jnp.asarray(rng.normal(0, 0.8, (n, 4, 3)), jnp.float32)
opac4 = jnp.asarray(rng.uniform(0.2, 0.95, (n, 4)), jnp.float32)
rest = jnp.asarray(rng.normal(0, 0.05, (n, 15, 3)), jnp.float32)
gaze = jnp.array([0.5, 0.5], jnp.float32)
cam = look_at_camera([0.4, -0.3, -4.0], [0, 0, 0], [0, -1, 0],
                     fovx=1.1, fovy=0.7, width=1920, height=1080)
gx, gy = _grid(cam)
num_tiles = gx * gy
cap = 3 << 20
chunk = 256


def force(x):
    return float(jax.tree.leaves(x)[0].ravel()[0])


def timeit(f, *a, reps=10, label=""):
    out = f(*a)
    force(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        force(f(*a))
    print(f"{label}: {(time.perf_counter()-t0)/reps*1e3:.2f} ms", flush=True)
    return out


prep = timeit(jax.jit(lambda m, s, q: projection.preprocess(m, s, q, cam)),
              means, scales, quats, reps=5, label="preprocess")

levels = foveation.compute_tile_levels(gaze, cam.width, cam.height, 0.05)
gradx, grady, _, tb = foveation.compute_tile_level_infos(levels, cam.width,
                                                         cam.height)


def bin_fov(prep, hl):
    def level_mask(orig, tile):
        t = jnp.minimum(tile, num_tiles - 1)
        return levels[t] < hl[orig] + 1.0
    prep = fov._clip_rects_to_levels(prep, levels, hl, gx, gy, L)
    return binning.bin_gaussians(prep, gx, gy, cap, tile_mask_fn=level_mask,
                                 carry_geometry=True)


bn = timeit(jax.jit(bin_fov), prep, hl, reps=5, label="clip+bin+cull+sort")
print("pairs", int(bn.num_pairs), "overflow", int(bn.overflow), flush=True)

colors_f = timeit(jax.jit(lambda m, r, d: fov.compute_fov_colors(
    m, r, d, cam.cam_center)), means, rest, shs_dcs, reps=5,
    label="fov colors")


def gather_pack(bn, colors_f, opac4, hl):
    gid = jnp.minimum(bn.pair_gauss, n - 1)
    kt_safe = jnp.minimum(bn.pair_tile, num_tiles - 1)
    l1 = levels.astype(jnp.int32)
    l2 = jnp.minimum(l1 + 1, L - 1)
    pl1 = l1[kt_safe]
    pl2 = l2[kt_safe]
    tab = jnp.concatenate([colors_f.reshape(n * L, 3),
                           opac4.reshape(n * L, 1),
                           jnp.broadcast_to(hl[:, None, None],
                                            (n, L, 1)).reshape(n * L, 1)], 1)
    r1 = tab[gid * L + pl1]
    r2 = tab[gid * L + pl2]
    cull = (r1[:, 4] + 1.0) < (levels[kt_safe] + 1.0)
    geo = bn.pair_attrs
    return pkf.pack_fov_pairs(geo[0:2].T, geo[2:5].T,
                              r1[:, 3], r1[:, 0:3], r2[:, 3], r2[:, 0:3],
                              cull)


packed = timeit(jax.jit(gather_pack), bn, colors_f, opac4, hl, reps=5,
                label="lvl-gather+pack")

act = jnp.zeros((num_tiles, 256, 4), jnp.float32).at[:, :, 0].set(1.0)
kern = jax.jit(lambda p, s, e, a: pkf.blend_fov_pallas(
    p, s, e, a, gx, gy, chunk, -4.5, False))
timeit(kern, packed, bn.seg_start[:-1], bn.seg_start[1:], act, reps=10,
       label="fov kernel")

# End-to-end for cross-checking against the stage sum.
cfg = RasterizeConfig(pair_capacity=cap, chunk=4096, backend="pallas",
                      pallas_chunk=chunk, pallas_fwd_only=True)
e2e = jax.jit(lambda m, s, q, o4, sd, re, h: fov.rasterize_fov(
    m, s, q, o4, sd, re, h, cam, gaze=gaze, alpha=0.05, blending=True,
    config=cfg)["render"])
timeit(e2e, means, scales, quats, opac4, shs_dcs, rest, hl, reps=10,
       label="end-to-end")
