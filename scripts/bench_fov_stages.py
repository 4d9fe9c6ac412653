"""Per-stage TPU timing of the foveated SoA render path
(ops/foveated.rasterize_fov_soa — the 9-gaze headline configuration:
1237x822, 1.16M Gaussians, 2M pair capacity).

Current flow has NO depth presort: invalid rows become dummy culled pairs,
the expand kernel emits depth, and the tile sort is a 2-key (tile, depth)
sort. (History: argsort+gather presort = 72 ms; a 33-operand payload sort
wedges the XLA compiler for >20 min.)"""
import argparse
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

_ap = argparse.ArgumentParser()
_ap.add_argument("--blend-chunk", type=int, default=256)
_ap.add_argument("--blend-batch", type=int, default=8)
_ap.add_argument("--prefix-mode", default="logmm",
                 choices=["logmm", "scan"])
# Kept pairs measured 1.27M at the center gaze; 1.75M leaves headroom for
# the corner gazes until they are measured (overflow is reported).
_ap.add_argument("--compact-capacity", type=int, default=1_769_472)
_ap.add_argument("--expand-chunk", type=int, default=512)
_ap.add_argument("--expand-batch", type=int, default=16)
_ap.add_argument("--interpret", action="store_true",
                 help="pallas interpret mode + tiny shapes (CPU smoke)")
_ap.add_argument("--force-single", action="store_true",
                 help="zero l2_active: every tile takes the single-chain "
                      "path (isolates the dual-chain cost)")
_args = _ap.parse_args()

from fovsplat.data.cameras import look_at_camera
from fovsplat.ops import foveation, projection, sh
from fovsplat.ops import foveated as fov
from fovsplat.ops.pallas import blend_fov as pkf
from fovsplat.ops.pallas import expand_fov as pex
from fovsplat.ops.rasterize import RasterizeConfig, _grid

from fovsplat.data import proxy

n = 3000 if _args.interpret else 1_161_358
L = 4
sc = proxy.bicycle_proxy(n=n)
means = jnp.asarray(sc["means"])
scales = jnp.asarray(sc["scales"])
quats = jnp.asarray(sc["rotations"])
hl = jnp.asarray(sc["highest_levels"])
shs_dcs = jnp.asarray(sc["shs_dcs"])
opac4 = jnp.asarray(sc["opacities4"])
rest = jnp.asarray(sc["shs_rest"])
gaze = jnp.array([0.5, 0.5], jnp.float32)
alpha = 0.05
cam = proxy.proxy_camera(width=160 if _args.interpret else 1237,
                         height=128 if _args.interpret else 822)
gx, gy = _grid(cam)
num_tiles = gx * gy
# Proxy scene at the center gaze: candidates after level clip 2.24M,
# invalid rows (dummy pairs) 489k, kept pairs 1.53M (calibrate_proxy.py).
cap = 65_536 if _args.interpret else 2_490_368
dummy_slack = 8_192 if _args.interpret else 524_288
if _args.interpret:
    _args.compact_capacity = 32_768
chunk = _args.blend_chunk
fov_cfg = fov.FoveationConfig()
cfg = RasterizeConfig(pair_capacity=cap, chunk=4096, backend="pallas",
                      pallas_chunk=chunk, pallas_fwd_only=True,
                      pallas_interpret=_args.interpret,
                      dummy_slack=dummy_slack,
                      compact_capacity=_args.compact_capacity)


def force(x):
    return float(np.asarray(jax.device_get(jax.tree.leaves(x)[0].ravel()[0])))


def timeit(f, *a, reps=20, label=""):
    """Chained-dispatch timing: the device executes dispatches in order, so
    ONE host read after `reps` async dispatches serializes them all and the
    ~30 ms tunnel RTT is amortized to RTT/reps (a per-rep force would fold a
    full RTT into every measurement — the dominant term otherwise)."""
    out = f(*a)
    force(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*a)
    force(out)
    print(f"{label}: {(time.perf_counter()-t0)/reps*1e3:.2f} ms", flush=True)
    return out


model = jax.jit(fov.pack_fov_model)(means, scales, quats, opac4, shs_dcs,
                                    rest, hl)

levels = foveation.compute_tile_levels(gaze, cam.width, cam.height, alpha,
                                       fov_cfg)


def build_cols(model):
    """Per-Gaussian column math: preprocess + level clip + SH + tables."""
    pc = projection.preprocess_cols(model.xyz, model.scales, model.rotations,
                                    cam)
    lv2d = levels.reshape(gy, gx)
    txs = jax.lax.broadcasted_iota(jnp.int32, (gy, gx), 1)
    tys = jax.lax.broadcasted_iota(jnp.int32, (gy, gx), 0)
    big = jnp.int32(1 << 20)
    hli = jnp.clip(model.hl.astype(jnp.int32), 0, L - 1)
    for h in range(L):
        ok = lv2d < (h + 1.0)
        x0 = jnp.min(jnp.where(ok, txs, big)); y0 = jnp.min(jnp.where(ok, tys, big))
        x1 = jnp.max(jnp.where(ok, txs + 1, 0)); y1 = jnp.max(jnp.where(ok, tys + 1, 0))
        if h == 0:
            bx0, by0, bx1, by1 = (jnp.full_like(hli, x0), jnp.full_like(hli, y0),
                                  jnp.full_like(hli, x1), jnp.full_like(hli, y1))
        else:
            m = hli == h
            bx0 = jnp.where(m, x0, bx0); by0 = jnp.where(m, y0, by0)
            bx1 = jnp.where(m, x1, bx1); by1 = jnp.where(m, y1, by1)
    rx0 = jnp.maximum(pc.rx0, bx0); ry0 = jnp.maximum(pc.ry0, by0)
    rx1 = jnp.minimum(pc.rx1, bx1); ry1 = jnp.minimum(pc.ry1, by1)
    tnum = (jnp.maximum(rx1 - rx0, 0) * jnp.maximum(ry1 - ry0, 0))
    valid = pc.valid & (tnum > 0) & (model.hl >= 0.0)
    tnum = jnp.where(valid, tnum, 0)
    rx1 = jnp.maximum(rx1, rx0)

    dx_ = model.xyz[:, 0] - cam.cam_center[0]
    dy_ = model.xyz[:, 1] - cam.cam_center[1]
    dz_ = model.xyz[:, 2] - cam.cam_center[2]
    inv = jax.lax.rsqrt(dx_ * dx_ + dy_ * dy_ + dz_ * dz_)
    rest_c = sh._eval_sh_nlast(3, model.rest_t, dx_ * inv, dy_ * inv,
                               dz_ * inv) + 0.5

    t1cols = [rx0.astype(jnp.float32), ry0.astype(jnp.float32),
              jnp.maximum(rx1 - rx0, 1).astype(jnp.float32),
              tnum.astype(jnp.float32),
              pc.mx, pc.my, pc.v1x, pc.v1y, pc.v2x, pc.v2y, pc.len1, pc.len2,
              pc.ca, pc.cb, pc.cc, model.hl]
    t2cols = ([model.opac_t[l] for l in range(L)]
              + [jnp.maximum(sh.SH_C0 * model.dc_t[c, l] + rest_c[c], 0.0)
                 for c in range(3) for l in range(L)])
    return t1cols, t2cols, valid, pc.depth


cols_out = timeit(jax.jit(build_cols), model, reps=10,
                  label="per-gaussian cols")
t1cols, t2cols, valid, depth = cols_out

kchunk, kbatch = _args.expand_chunk, _args.expand_batch
cap_d = cap + dummy_slack
cap2 = ((cap_d + kchunk * kbatch - 1) // (kchunk * kbatch)) * (kchunk * kbatch)
wsize = kchunk + pex.WPAD
n_pad = max(((n + 127) // 128) * 128, wsize + 1)


def build_table(t1cols, t2cols, valid, depth):
    """Split-row bf16 table build (fov.build_fov_dtable)."""
    return fov.build_fov_dtable(t1cols, t2cols, valid, depth, cap2, kchunk)


dtable, cum_pad, gstarts, total, total_f = timeit(
    jax.jit(build_table), t1cols, t2cols, valid, depth, reps=10,
    label="table build (no presort)")
print("pairs incl dummies:", int(jax.device_get(total_f)), "cap:", cap2,
      flush=True)

# Fused per-Gaussian table kernel (production default for the SoA path):
# replaces cols + table build above in one pass.
from fovsplat.ops.pallas import build_table as ptab
lv2d_k = levels.reshape(gy, gx)
txs_k = jax.lax.broadcasted_iota(jnp.int32, (gy, gx), 1)
tys_k = jax.lax.broadcasted_iota(jnp.int32, (gy, gx), 0)
bbs = []
for h in range(L):
    ok = lv2d_k < (h + 1.0)
    bbs.append((jnp.min(jnp.where(ok, txs_k, 1 << 20)),
                jnp.min(jnp.where(ok, tys_k, 1 << 20)),
                jnp.max(jnp.where(ok, txs_k + 1, 0)),
                jnp.max(jnp.where(ok, tys_k + 1, 0))))
consts_k = ptab.make_table_consts(
    cam, jnp.stack([b[0] for b in bbs]), jnp.stack([b[1] for b in bbs]),
    jnp.stack([b[2] for b in bbs]), jnp.stack([b[3] for b in bbs]))
tk = jax.jit(lambda g, c, k: ptab.build_fov_table_pallas(
    g, c, k, n=n, grid_x=gx, grid_y=gy, width=cam.width, height=cam.height,
    fov_num=L, interpret=_args.interpret))
tk_out = timeit(tk, model.geo_t, model.col_t, consts_k, reps=10,
                label="table KERNEL (cols+table fused)")

from fovsplat.ops import binning as _bng
ctk = jax.jit(lambda d, t: _bng.compact_prebuilt(
    d, t, flag_row=27, flag_thresh=-1.0, interpret=_args.interpret))
ct_out = timeit(ctk, tk_out[0], tk_out[3], reps=10,
                label="table compaction (dummy drop)")
print("live rows:", int(jax.device_get(
    jnp.sum(ct_out[1][0] < ct_out[2]))), "candidates:",
    int(jax.device_get(ct_out[2])), flush=True)

gaze_dir = jnp.stack(foveation._ncd2dir(
    gaze[0], gaze[1], fov_cfg.real_image_width,
    cam.height / cam.width * fov_cfg.real_image_width,
    fov_cfg.real_viewing_distance))

cap_out = _args.compact_capacity
expand = jax.jit(lambda d, c, g, t: pex.expand_fov_pallas(
    d, c[None, :], g, t, gaze_dir, jnp.float32(alpha), cap=cap2,
    cap_out=cap_out, chunk=kchunk, batch=kbatch, grid_x=gx, grid_y=gy,
    width=cam.width, height=cam.height,
    real_w=fov_cfg.real_image_width,
    real_h=cam.height / cam.width * fov_cfg.real_image_width,
    dist=fov_cfg.real_viewing_distance, fov_num=L,
    sqrt_max_ps=fov_cfg.sqrt_max_ps, interpret=_args.interpret))
key, dbits, attrs, kept, _missed = timeit(expand, dtable, cum_pad, gstarts, total,
                                 reps=10, label="expand kernel (compacting)")
print("kept pairs (post OBB/level cull):", int(jax.device_get(kept)),
      "cap_out:", key.shape[0], flush=True)


def tile_sort(key, attrs):
    # i32 fused key + 6 plain f32 payload rows + 2 zero pad rows (matches
    # foveated._bin_fov_fused, lossy default).
    res = jax.lax.sort((key, *attrs), num_keys=1)
    packed = jnp.concatenate(
        [jnp.stack(res[1:], axis=0),
         jnp.zeros((2, key.shape[0]), jnp.float32)], axis=0)
    seg_start = jnp.searchsorted(
        res[0], pex.seg_bounds32(num_tiles),
        side='left').astype(jnp.int32)
    return packed, seg_start


packed, seg_start = timeit(jax.jit(tile_sort), key, attrs, reps=10,
                           label="tile sort (i32 key, f32 rows)+seg")

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
if _args.force_single:
    l2_active = jnp.zeros_like(l2_active)
print("blend tiles:", int(jax.device_get(jnp.sum(tile_blend))), "/",
      num_tiles, flush=True)
tile_act = jnp.stack([
    l1_active.astype(jnp.float32), l2_active.astype(jnp.float32),
    jnp.zeros_like(l1_active, jnp.float32),
    jnp.zeros_like(l1_active, jnp.float32)], axis=-1)

kern = jax.jit(lambda p, s, e, a: pkf.blend_fov_pallas(
    p, s, e, a, gx, gy, chunk, -4.5, _args.interpret,
    batch=_args.blend_batch, prefix_mode=_args.prefix_mode))
timeit(kern, packed, seg_start[:-1], seg_start[1:], tile_act, reps=10,
       label="blend kernel")

e2e_soa = jax.jit(lambda mdl, gz: fov.rasterize_fov_soa(
    mdl, cam, gaze=gz, alpha=alpha, blending=True, config=cfg)["render"])
timeit(e2e_soa, model, gaze, reps=10, label="end-to-end (SoA)")
