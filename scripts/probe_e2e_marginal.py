"""Marginal cost of each stage INSIDE the fused e2e jit.

Separately-jitted stage benches over-count (per-call dispatch, missing
overlap): this probe times progressive prefixes of the production
foveated SoA pipeline (table kernel -> expand -> sort -> blend -> image)
each as ONE jit, and reports first differences = marginal stage cost in
context. Run under the TPU env.
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import argparse
_ap = argparse.ArgumentParser()
_ap.add_argument("--gaze", type=float, nargs=2, default=[0.5, 0.5])
_ap.add_argument("--cap", type=int, default=2_490_368)
_ap.add_argument("--compact", type=int, default=1_769_472)
_ap.add_argument("--dummy-slack", type=int, default=524_288)
_args = _ap.parse_args()

from fovsplat.data import proxy
from fovsplat.ops import foveation, blend
from fovsplat.ops import foveated as fov
from fovsplat.ops.pallas import build_table as ptab
from fovsplat.ops.pallas import expand_fov as pex
from fovsplat.ops.pallas import blend_fov as pkf
from fovsplat.ops.rasterize import RasterizeConfig, _grid

n = 1_161_358
L = 4
sc = proxy.bicycle_proxy(n=n)
cam = proxy.proxy_camera(width=1237, height=822)
gx, gy = _grid(cam)
num_tiles = gx * gy
gaze = jnp.array(_args.gaze, jnp.float32)
alpha = 0.05
fov_cfg = fov.FoveationConfig()
cap = _args.cap
dummy_slack = _args.dummy_slack
compact_capacity = _args.compact
kchunk, kbatch = 512, 16
cfg = RasterizeConfig(pair_capacity=cap, chunk=4096, backend="pallas",
                      pallas_chunk=256, pallas_fwd_only=True,
                      dummy_slack=dummy_slack,
                      compact_capacity=compact_capacity)

model = jax.jit(fov.pack_fov_model)(
    jnp.asarray(sc["means"]), jnp.asarray(sc["scales"]),
    jnp.asarray(sc["rotations"]), jnp.asarray(sc["opacities4"]),
    jnp.asarray(sc["shs_dcs"]), jnp.asarray(sc["shs_rest"]),
    jnp.asarray(sc["highest_levels"]))


def common_pre(mdl, gz):
    levels = foveation.compute_tile_levels(gz, cam.width, cam.height,
                                           alpha, fov_cfg)
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
    dtable, cum, total_f, tnum = ptab.build_fov_table_pallas(
        mdl.geo_t, mdl.col_t, consts, n=n, grid_x=gx, grid_y=gy,
        width=cam.width, height=cam.height, fov_num=L)
    return levels, dtable, cum, total_f


def upto_table(mdl, gz):
    levels, dtable, cum, total_f = common_pre(mdl, gz)
    return dtable[0, ::1024] + cum[0, ::1024]


def expand_part(mdl, gz):
    levels, dtable, cum, total_f = common_pre(mdl, gz)
    cap_d = cap + dummy_slack
    cap2 = ((cap_d + kchunk * kbatch - 1) // (kchunk * kbatch)) * (
        kchunk * kbatch)
    cum_pad = jnp.concatenate(
        [cum, jnp.full((1, 128), jnp.float32(1 << 30))], axis=1)
    total = jnp.minimum(total_f, cap2).astype(jnp.int32)
    chunk_firsts = jnp.arange(0, cap2, kchunk, dtype=jnp.float32)
    gstarts = jnp.clip(
        jnp.searchsorted(cum[0, :n], chunk_firsts,
                         side='right').astype(jnp.int32) - 1, 0, n - 1)
    gaze_dir = jnp.stack(foveation._ncd2dir(
        gz[0], gz[1], fov_cfg.real_image_width,
        cam.height / cam.width * fov_cfg.real_image_width,
        fov_cfg.real_viewing_distance))
    key, dbits, attrs, kept, _missed = pex.expand_fov_pallas(
        dtable, cum_pad, gstarts, total, gaze_dir, jnp.float32(alpha),
        cap=cap2, cap_out=compact_capacity, chunk=kchunk, batch=kbatch,
        grid_x=gx, grid_y=gy, width=cam.width, height=cam.height,
        real_w=fov_cfg.real_image_width,
        real_h=cam.height / cam.width * fov_cfg.real_image_width,
        dist=fov_cfg.real_viewing_distance, fov_num=L,
        sqrt_max_ps=fov_cfg.sqrt_max_ps)
    return levels, key, dbits, attrs, kept


def upto_expand(mdl, gz):
    levels, key, dbits, attrs, kept = expand_part(mdl, gz)
    return key[::1024] + kept


def sort_part(mdl, gz):
    levels, key, dbits, attrs, kept = expand_part(mdl, gz)
    res = jax.lax.sort((key, *attrs), num_keys=1)
    packed = jnp.concatenate(
        [jnp.stack(res[1:], axis=0),
         jnp.zeros((2, key.shape[0]), jnp.float32)], axis=0)
    seg_start = jnp.searchsorted(
        res[0], pex.seg_bounds32(num_tiles),
        side='left').astype(jnp.int32)
    return levels, packed, seg_start


def upto_sort(mdl, gz):
    levels, packed, seg_start = sort_part(mdl, gz)
    return jnp.sum(packed[0, ::1024]) + jnp.sum(seg_start[::64])


def upto_blend(mdl, gz):
    levels, packed, seg_start = sort_part(mdl, gz)
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
    out = pkf.blend_fov_pallas(packed, seg_start[:-1], seg_start[1:],
                               tile_act, gx, gy, 256, -4.5, False, batch=8,
                               prefix_mode="scan")
    return out[0][:, 0, ::64]


def e2e(mdl, gz):
    return fov.rasterize_fov_soa(mdl, cam, gaze=gz, alpha=alpha,
                                 blending=True, config=cfg)["render"]


def force(x):
    return float(np.asarray(jax.device_get(
        jax.tree.leaves(x)[0].ravel()[0].astype(jnp.float32))))


def timeit(f, *a, reps=20, label=""):
    out = f(*a)
    force(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*a)
    force(out)
    dt = (time.perf_counter() - t0) / reps * 1e3
    print(f"{label}: {dt:.2f} ms", flush=True)
    return dt


t1 = timeit(jax.jit(upto_table), model, gaze, label="prefix: table")
t2 = timeit(jax.jit(upto_expand), model, gaze, label="prefix: +expand")
t3 = timeit(jax.jit(upto_sort), model, gaze, label="prefix: +sort")
t4 = timeit(jax.jit(upto_blend), model, gaze, label="prefix: +blend")
t5 = timeit(jax.jit(e2e), model, gaze, label="e2e production")
print(f"marginal: table={t1:.2f} expand={t2-t1:.2f} sort={t3-t2:.2f} "
      f"blend={t4-t3:.2f} image+rest={t5-t4:.2f}", flush=True)
