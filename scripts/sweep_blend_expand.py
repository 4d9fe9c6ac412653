"""On-chip parameter sweep for the fov expand + blend kernels.

Builds the proxy-scene pipeline inputs ONCE (table kernel -> expand ->
sort), then times:
  * blend_fov_pallas over (batch, chunk, window) variants
  * expand_fov_pallas over (chunk, batch) variants
Run on the real TPU; each variant costs one kernel compile (~30-60 s).
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from fovsplat.data import proxy
from fovsplat.ops import foveation
from fovsplat.ops import foveated as fov
from fovsplat.ops.pallas import blend_fov as pkf
from fovsplat.ops.pallas import build_table as ptab
from fovsplat.ops.pallas import expand_fov as pex
from fovsplat.ops.rasterize import RasterizeConfig, _grid

ap = argparse.ArgumentParser()
ap.add_argument("--blend", default="8:256:32768,16:256:32768,32:256:32768,"
                                   "16:256:65536,16:128:32768,16:512:32768")
ap.add_argument("--expand", default="512:16,1024:8,1024:16,2048:8")
ap.add_argument("--reps", type=int, default=10)
args = ap.parse_args()

n = 1_161_358
L = 4
sc = proxy.bicycle_proxy(n=n)
cam = proxy.proxy_camera()
gx, gy = _grid(cam)
num_tiles = gx * gy
gaze = jnp.array([0.5, 0.5], jnp.float32)
alpha = 0.05
fov_cfg = foveation.FoveationConfig()
cap = 2_490_368
dummy_slack = 524_288
cap_out = 1_769_472

model = jax.jit(fov.pack_fov_model)(
    jnp.asarray(sc["means"]), jnp.asarray(sc["scales"]),
    jnp.asarray(sc["rotations"]), jnp.asarray(sc["opacities4"]),
    jnp.asarray(sc["shs_dcs"]), jnp.asarray(sc["shs_rest"]),
    jnp.asarray(sc["highest_levels"]))

levels = foveation.compute_tile_levels(gaze, cam.width, cam.height, alpha,
                                       fov_cfg)
lv2d = levels.reshape(gy, gx)
txs = jax.lax.broadcasted_iota(jnp.int32, (gy, gx), 1)
tys = jax.lax.broadcasted_iota(jnp.int32, (gy, gx), 0)
bbs = []
for h in range(L):
    ok = lv2d < (h + 1.0)
    bbs.append((jnp.min(jnp.where(ok, txs, 1 << 20)),
                jnp.min(jnp.where(ok, tys, 1 << 20)),
                jnp.max(jnp.where(ok, txs + 1, 0)),
                jnp.max(jnp.where(ok, tys + 1, 0))))
consts = ptab.make_table_consts(
    cam, jnp.stack([b[0] for b in bbs]), jnp.stack([b[1] for b in bbs]),
    jnp.stack([b[2] for b in bbs]), jnp.stack([b[3] for b in bbs]))
dtable, cum, total_f, _tnum = jax.jit(lambda g, c, k: ptab.build_fov_table_pallas(
    g, c, k, n=n, grid_x=gx, grid_y=gy, width=cam.width, height=cam.height,
    fov_num=L))(model.geo_t, model.col_t, consts)

gaze_dir = jnp.stack(foveation._ncd2dir(
    gaze[0], gaze[1], fov_cfg.real_image_width,
    cam.height / cam.width * fov_cfg.real_image_width,
    fov_cfg.real_viewing_distance))


def force(x):
    return float(np.asarray(jax.device_get(jax.tree.leaves(x)[0].ravel()[0]
                                           .astype(jnp.float32))))


def timeit(f, *a, reps=args.reps, label=""):
    out = f(*a)
    force(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*a)
    force(out)
    print(f"{label}: {(time.perf_counter()-t0)/reps*1e3:.2f} ms", flush=True)
    return out


def expand_inputs(chunk, batch):
    cap_d = cap + dummy_slack
    cap2 = ((cap_d + chunk * batch - 1) // (chunk * batch)) * (chunk * batch)
    cum_pad = jnp.concatenate(
        [cum, jnp.full((1, 128), jnp.float32(1 << 30))], axis=1)
    total = jnp.minimum(total_f, cap2).astype(jnp.int32)
    chunk_firsts = jnp.arange(0, cap2, chunk, dtype=jnp.float32)
    gstarts = jnp.clip(jnp.searchsorted(cum[0, :n], chunk_firsts,
                                        side='right').astype(jnp.int32) - 1,
                       0, n - 1)
    return cap2, cum_pad, total, gstarts


# --------------------------- expand sweep ---------------------------------
kept_out = {}
for spec in [x for x in args.expand.split(",") if x]:
    chunk, batch = map(int, spec.split(":"))
    cap2, cum_pad, total, gstarts = expand_inputs(chunk, batch)
    wsize = chunk + pex.WPAD
    if dtable.shape[1] < wsize + 1:
        print(f"expand {spec}: skipped (table too small)")
        continue
    fn = jax.jit(lambda d, c, g, t, ch=chunk, ba=batch, c2=cap2:
                 pex.expand_fov_pallas(
                     d, c, g, t, gaze_dir, jnp.float32(alpha), cap=c2,
                     cap_out=cap_out, chunk=ch, batch=ba, grid_x=gx,
                     grid_y=gy, width=cam.width, height=cam.height,
                     real_w=fov_cfg.real_image_width,
                     real_h=cam.height / cam.width * fov_cfg.real_image_width,
                     dist=fov_cfg.real_viewing_distance, fov_num=L,
                     sqrt_max_ps=fov_cfg.sqrt_max_ps))
    out = timeit(fn, dtable, cum_pad, gstarts, total,
                 label=f"expand chunk={chunk} batch={batch}")
    kept_out[spec] = int(jax.device_get(out[3]))
    print(f"  kept={kept_out[spec]}", flush=True)

# --------------------------- blend sweep ----------------------------------
chunk0, batch0 = 512, 16
cap2, cum_pad, total, gstarts = expand_inputs(chunk0, batch0)
key, dbits, attrs, kept, _missed = jax.jit(lambda d, c, g, t: pex.expand_fov_pallas(
    d, c, g, t, gaze_dir, jnp.float32(alpha), cap=cap2, cap_out=cap_out,
    chunk=chunk0, batch=batch0, grid_x=gx, grid_y=gy, width=cam.width,
    height=cam.height, real_w=fov_cfg.real_image_width,
    real_h=cam.height / cam.width * fov_cfg.real_image_width,
    dist=fov_cfg.real_viewing_distance, fov_num=L,
    sqrt_max_ps=fov_cfg.sqrt_max_ps))(dtable, cum_pad, gstarts, total)


def tile_sort(key, attrs):
    res = jax.lax.sort((key, *attrs), num_keys=1)
    packed = jnp.concatenate(
        [jnp.stack(res[1:], axis=0),
         jnp.zeros((2, key.shape[0]), jnp.float32)], axis=0)
    seg_start = jnp.searchsorted(
        res[0], pex.seg_bounds32(num_tiles), side='left').astype(jnp.int32)
    return packed, seg_start


packed, seg_start = timeit(jax.jit(tile_sort), key, attrs,
                           label="tile sort i32 (reference point)")

grad_x, grad_y, _, tile_blend = foveation.compute_tile_level_infos(
    levels, cam.width, cam.height, fov_cfg)
l1_i = levels.astype(jnp.int32)
lx = jnp.arange(256, dtype=jnp.float32) % 16
ly = jnp.floor(jnp.arange(256, dtype=jnp.float32) / 16)
est = (levels[:, None] + (lx[None, :] * grad_x[:, None]
                          + ly[None, :] * grad_y[:, None]) / 16)
l1_active = jnp.where(tile_blend[:, None],
                      est <= (l1_i + 1)[:, None].astype(jnp.float32),
                      jnp.ones((num_tiles, 256), bool))
l2_active = jnp.broadcast_to(tile_blend[:, None], (num_tiles, 256))
tile_act = jnp.stack([
    l1_active.astype(jnp.float32), l2_active.astype(jnp.float32),
    jnp.zeros_like(l1_active, jnp.float32),
    jnp.zeros_like(l1_active, jnp.float32)], axis=-1)

for spec in [x for x in args.blend.split(",") if x]:
    parts = spec.split(":")
    batch, chunk, window = map(int, parts[:3])
    pmode = parts[3] if len(parts) > 3 else "logmm"
    fn = jax.jit(lambda p, s, e, a, b=batch, c=chunk, w=window, pm=pmode:
                 pkf.blend_fov_pallas(p, s, e, a, gx, gy, c, -4.5, False,
                                      batch=b, window=w, prefix_mode=pm))
    timeit(fn, packed, seg_start[:-1], seg_start[1:], tile_act,
           label=f"blend batch={batch} chunk={chunk} window={window} {pmode}")

# Ablations at the default config: pure per-tile overhead (empty segments)
# and single-chain-everywhere (dual-chain cost share).
fn0 = jax.jit(lambda p, s, e, a: pkf.blend_fov_pallas(
    p, s, e, a, gx, gy, 256, -4.5, False, batch=8, window=32768))
timeit(fn0, packed, seg_start[:-1], seg_start[:-1], tile_act,
       label="blend EMPTY segments (per-tile overhead)")
tile_act0 = tile_act.at[:, :, 1].set(0.0)
timeit(fn0, packed, seg_start[:-1], seg_start[1:], tile_act0,
       label="blend FORCE-SINGLE chain")

# prefix-mode A/B in the transposed orientation
fn_scan = jax.jit(lambda p, s, e, a: pkf.blend_fov_pallas(
    p, s, e, a, gx, gy, 256, -4.5, False, batch=8, window=32768,
    prefix_mode="scan"))
timeit(fn_scan, packed, seg_start[:-1], seg_start[1:], tile_act,
       label="blend prefix=scan (exact f32)")
