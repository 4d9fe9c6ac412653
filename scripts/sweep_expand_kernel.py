"""A/B the fused fov expand kernel's chunk/batch at high rep count.

All variants share one input build; each variant is its own pallas_call
compile. Chained-dispatch timing (one host read after all reps) amortizes
the tunnel RTT; high reps shrink the +-2 ms noise band the 10-rep stage
timings show. Variant outputs are cross-checked (same kept count).
"""
import argparse
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

_ap = argparse.ArgumentParser()
_ap.add_argument("--reps", type=int, default=50)
_ap.add_argument("--variants", default="512x8,512x16,256x16,256x32,1024x8")
_args = _ap.parse_args()

from fovsplat.data.cameras import look_at_camera
from fovsplat.ops import foveation, projection, sh
from fovsplat.ops import foveated as fov
from fovsplat.ops.pallas import expand_fov as pex
from fovsplat.ops.rasterize import _grid

rng = np.random.default_rng(0)
n = 1_161_358
L = 4
means = jnp.asarray(rng.normal(0, 1.2, (n, 3)), jnp.float32)
scales = jnp.asarray(rng.uniform(0.002, 0.012, (n, 3)), jnp.float32)
quats = rng.normal(0, 1, (n, 4)); quats /= np.linalg.norm(quats, axis=1, keepdims=True)
quats = jnp.asarray(quats, jnp.float32)
hl = jnp.asarray(rng.choice(4, size=(n,), p=[0.5992, 0.1832, 0.0434, 0.1742]),
                 jnp.float32)
shs_dcs = jnp.asarray(rng.normal(0, 0.8, (n, 4, 3)), jnp.float32)
opac4 = jnp.asarray(rng.uniform(0.2, 0.95, (n, 4)), jnp.float32)
rest = jnp.asarray(rng.normal(0, 0.05, (n, 15, 3)), jnp.float32)
gaze = jnp.array([0.5, 0.5], jnp.float32)
alpha = 0.05
cam = look_at_camera([0.4, -0.3, -4.0], [0, 0, 0], [0, -1, 0],
                     fovx=1.1, fovy=0.76, width=1237, height=822)
gx, gy = _grid(cam)
cap = 1_835_008
dummy_slack = 851_968
cap_out = 1_835_008
fov_cfg = fov.FoveationConfig()

model = jax.jit(fov.pack_fov_model)(means, scales, quats, opac4, shs_dcs,
                                    rest, hl)
levels = foveation.compute_tile_levels(gaze, cam.width, cam.height, alpha,
                                       fov_cfg)


def build_cols(model):
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


t1cols, t2cols, valid, depth = jax.jit(build_cols)(model)
gaze_dir = jnp.stack(foveation._ncd2dir(
    gaze[0], gaze[1], fov_cfg.real_image_width,
    cam.height / cam.width * fov_cfg.real_image_width,
    fov_cfg.real_viewing_distance))


def force(x):
    return float(np.asarray(jax.device_get(jax.tree.leaves(x)[0].ravel()[0])))


for spec in _args.variants.split(","):
    kchunk, kbatch = (int(v) for v in spec.split("x"))
    cap_d = cap + dummy_slack
    cap2 = ((cap_d + kchunk * kbatch - 1) // (kchunk * kbatch)) \
        * (kchunk * kbatch)
    wsize = kchunk + pex.WPAD
    n_pad = max(((n + 127) // 128) * 128, wsize + 1)

    def build_table(t1cols, t2cols, valid, depth):
        return fov.build_fov_dtable(t1cols, t2cols, valid, depth, cap2,
                                    kchunk)[:4]

    dtable, cum_pad, gstarts, total = jax.jit(build_table)(
        t1cols, t2cols, valid, depth)

    expand = jax.jit(lambda d, c, g, t, *, kchunk=kchunk, kbatch=kbatch,
                     cap2=cap2: pex.expand_fov_pallas(
        d, c[None, :], g, t, gaze_dir, jnp.float32(alpha), cap=cap2,
        cap_out=cap_out, chunk=kchunk, batch=kbatch, grid_x=gx, grid_y=gy,
        width=cam.width, height=cam.height,
        real_w=fov_cfg.real_image_width,
        real_h=cam.height / cam.width * fov_cfg.real_image_width,
        dist=fov_cfg.real_viewing_distance, fov_num=L,
        sqrt_max_ps=fov_cfg.sqrt_max_ps))
    try:
        key, dbits, attrs, kept, _missed = expand(dtable, cum_pad, gstarts, total)
        force(key)
    except Exception as e:
        print(f"{spec}: FAILED {type(e).__name__}: {str(e)[:300]}",
              flush=True)
        continue
    t0 = time.perf_counter()
    for _ in range(_args.reps):
        key, dbits, attrs, kept, _missed = expand(dtable, cum_pad, gstarts, total)
    force(key)
    dt = (time.perf_counter() - t0) / _args.reps * 1e3
    print(f"{spec}: {dt:.2f} ms  kept={int(jax.device_get(kept))}",
          flush=True)
