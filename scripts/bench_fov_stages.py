"""Per-stage TPU timing of the foveated render path (mirrors
ops/foveated.rasterize_fov's current stage composition: level-rect clip,
pre-sort attribute derivation riding the tile sort, 3M pair capacity)."""
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

colors_f = timeit(jax.jit(lambda m, r, d: fov.compute_fov_colors(
    m, r, d, cam.cam_center)), means, rest, shs_dcs, reps=5,
    label="fov colors")


def bin_fov(prep, hl, colors_f, opac4):
    prep = fov._clip_rects_to_levels(prep, levels, hl, gx, gy, L)
    attr_table = jnp.concatenate(
        [opac4, colors_f[:, :, 0], colors_f[:, :, 1], colors_f[:, :, 2],
         hl[:, None]], axis=1)

    def pair_fn(orig, tx, ty, tile, rows2):
        lv = foveation.tile_levels_at(tx, ty, gaze, cam.width, cam.height,
                                      0.05)
        hl_row = rows2[:, 4 * L]
        keep = lv < hl_row + 1.0
        p1 = lv.astype(jnp.int32)
        p2 = jnp.minimum(p1 + 1, L - 1)

        def sel(pk):
            out = []
            for c in range(4):
                v = rows2[:, c * L]
                for k in range(1, L):
                    v = jnp.where(pk == k, rows2[:, c * L + k], v)
                out.append(v)
            return out

        o1, r1, g1, b1 = sel(p1)
        o2, r2, g2, b2 = sel(p2)
        cull = ((hl_row + 1.0) < (lv + 1.0)).astype(jnp.float32)
        return keep, [o1, r1, g1, b1, o2, r2, g2, b2, cull]

    return binning.bin_gaussians(prep, gx, gy, cap, carry_geometry=True,
                                 attr_table=attr_table, pair_fn=pair_fn)


FUSED = "--fused" in sys.argv

if FUSED:
    def bin_fused(prep, hl, colors_f, opac4):
        prep = fov._clip_rects_to_levels(prep, levels, hl, gx, gy, L)
        return fov._bin_fov_fused(prep, opac4, colors_f, hl, gaze, 0.05,
                                  gx, gy, cap, cam, fov.FoveationConfig(),
                                  False)

    fus = timeit(jax.jit(bin_fused), prep, hl, colors_f, opac4, reps=5,
                 label="clip+fused-expand+sort")
    packed, seg_start, num_pairs, overflow, cap2 = fus
    print("pairs", int(num_pairs), "overflow", int(overflow), "cap2", cap2,
          flush=True)
    bn_seg = (seg_start[:-1], seg_start[1:])
else:
    bn = timeit(jax.jit(bin_fov), prep, hl, colors_f, opac4, reps=5,
                label="clip+bin+derive+sort")
    print("pairs", int(bn.num_pairs), "overflow", int(bn.overflow),
          flush=True)

    def pack(bn):
        return jnp.concatenate(
            [bn.pair_attrs, jnp.zeros((2, cap), jnp.float32)], axis=0)

    packed = timeit(jax.jit(pack), bn, reps=5, label="pack")
    bn_seg = (bn.seg_start[:-1], bn.seg_start[1:])

act = jnp.zeros((num_tiles, 256, 4), jnp.float32).at[:, :, 0].set(1.0)
kern = jax.jit(lambda p, s, e, a: pkf.blend_fov_pallas(
    p, s, e, a, gx, gy, chunk, -4.5, False))
timeit(kern, packed, bn_seg[0], bn_seg[1], act, reps=10,
       label="fov kernel")

# End-to-end for cross-checking against the stage sum.
cfg = RasterizeConfig(pair_capacity=cap, chunk=4096, backend="pallas",
                      pallas_chunk=chunk, pallas_fwd_only=True)
e2e = jax.jit(lambda m, s, q, o4, sd, re, h: fov.rasterize_fov(
    m, s, q, o4, sd, re, h, cam, gaze=gaze, alpha=0.05, blending=True,
    config=cfg)["render"])
timeit(e2e, means, scales, quats, opac4, shs_dcs, rest, hl, reps=10,
      label="end-to-end")

model = jax.jit(fov.pack_fov_model)(means, scales, quats, opac4, shs_dcs,
                                    rest, hl)
e2e_soa = jax.jit(lambda mdl: fov.rasterize_fov_soa(
    mdl, cam, gaze=gaze, alpha=0.05, blending=True, config=cfg)["render"])
timeit(e2e_soa, model, reps=10, label="end-to-end (SoA model)")
