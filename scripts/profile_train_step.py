"""Decompose the train step cost on the real TPU at bench.py's train-leg
shape (1237x822, 1.16M Gaussians): fused train binning, blend fwd, full
forward loss, value_and_grad, and the whole step (+Adam)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from fovsplat.data import proxy
from fovsplat.models import state as S
from fovsplat.models.gaussians import GaussianParams
from fovsplat.ops import rasterize as rast
from fovsplat.ops.rasterize import RasterizeConfig
from fovsplat.train import loops, losses

n = int(os.environ.get("PROF_N", "1161358"))
sc = proxy.bicycle_proxy(n=n)
rng = np.random.default_rng(1)
params = GaussianParams(
    xyz=jnp.asarray(sc["means"]),
    features_dc=jnp.asarray(sc["shs_dcs"][:, 0:1, :]),
    features_rest=jnp.asarray(sc["shs_rest"]),
    scaling=jnp.asarray(np.log(np.maximum(sc["scales"], 1e-9))),
    rotation=jnp.asarray(sc["rotations"]),
    opacity=jnp.asarray(np.log(sc["opacity"] / (1 - sc["opacity"])))[:, None])
state = S.from_params(params)
cam = proxy.proxy_camera()
gt = jnp.asarray(rng.uniform(0, 1, (cam.height, cam.width, 3)), jnp.float32)
cfg = loops.LoopConfig(raster=RasterizeConfig(
    pair_capacity=1 << 22, chunk=4096, backend="pallas",
    compact_capacity=int(os.environ.get("PROF_COMPACT", 3_407_872)) or None,
    pallas_chunk=256))


def force(x):
    return float(np.asarray(jax.device_get(
        jax.tree.leaves(x)[0].ravel()[0].astype(jnp.float32))))


def timeit(f, *a, reps=8, label=""):
    out = f(*a)
    force(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*a)
    force(out)
    print(f"{label}: {(time.perf_counter()-t0)/reps*1e3:.1f} ms", flush=True)
    return out


def render_fwd(state):
    return loops.render_state(state, cam, cfg)["render"]


def loss_fwd(state):
    out = loops.render_state(state, cam, cfg)
    return losses.photometric_loss(out["render"], gt, cfg.lambda_dssim)


def loss_grad(state):
    def obj(p):
        st = type(state)(**{**state.__dict__, "params": p}) \
            if False else None
    import dataclasses

    def objective(p):
        st = dataclasses.replace(state, params=p)
        out = loops.render_state(st, cam, cfg)
        return losses.photometric_loss(out["render"], gt, cfg.lambda_dssim)

    return jax.value_and_grad(objective)(state.params)


step = loops.make_photometric_step(cfg)

if os.environ.get("PROF_FULL", "1") == "1":
    timeit(jax.jit(render_fwd), state, label="render fwd (train pipeline)")
    timeit(jax.jit(loss_fwd), state, label="fwd + photometric loss")
    timeit(jax.jit(loss_grad), state, label="value_and_grad (fwd+bwd)")
    timeit(lambda s: step(s, cam, gt, jnp.int32(0),
                          jnp.float32(0.0))[1]["loss"],
           state, label="full step (fwd+bwd+Adam)")


# ---- backward decomposition ----------------------------------------------
import dataclasses
from fovsplat.ops import binning, projection
from fovsplat.ops.pallas import blend_fwd as pk

gx = (cam.width + 15) // 16
gy = (cam.height + 15) // 16
cap = cfg.raster.padded_capacity()

p = state.params
pc = projection.preprocess_cols(p.xyz, p.get_scaling(), p.get_rotation(),
                                cam)
opac = p.get_opacity() * state.live
from fovsplat.ops import sh as shmod
dirs = p.xyz - jnp.asarray(cam.cam_center)[None, :]
dirs = dirs / jnp.linalg.norm(dirs, axis=1, keepdims=True)
cols3 = jnp.maximum(shmod.eval_sh(3, p.get_features(), dirs) + 0.5, 0.0)
t1cols = [pc.rx0.astype(jnp.float32), pc.ry0.astype(jnp.float32),
          jnp.maximum(pc.rx1 - pc.rx0, 1).astype(jnp.float32),
          pc.tnum.astype(jnp.float32),
          pc.mx, pc.my, pc.v1x, pc.v1y, pc.v2x, pc.v2y,
          pc.len1, pc.len2, pc.ca, pc.cb, pc.cc,
          opac, cols3[:, 0], cols3[:, 1], cols3[:, 2]]

bin_train = jax.jit(lambda t1, v, d: binning.bin_fused_ps1(
    t1, v, d, gx, gy, cap, False, cfg.raster.dummy_slack,
    cfg.raster.compact_capacity, cfg.raster.expand_chunk,
    cfg.raster.expand_batch, train=True))
out = timeit(bin_train, t1cols, pc.valid, pc.depth,
             label="train binning (expand+sort)")
packed, seg_start, num_pairs, overflow, cap3, _cand = out
print("  train cap3:", cap3, "num_pairs:", int(jax.device_get(num_pairs)),
      flush=True)

fwd_only = jax.jit(lambda pk_, s, e: pk.blend_pallas(
    pk_, s, e, gx, gy, 256, -4.5, False))
timeit(fwd_only, packed, seg_start[:-1], seg_start[1:],
       label="blend fwd kernel (custom-vjp fwd)")


def blend_grad(pk_, s, e):
    def obj(x):
        c, T, nc = pk.blend_pallas(x, s, e, gx, gy, 256, -4.5, False)
        return jnp.sum(c * c) + jnp.sum(T)
    return jax.grad(obj)(pk_)


timeit(jax.jit(blend_grad), packed, seg_start[:-1], seg_start[1:],
       label="blend fwd+bwd kernels (grad wrt pair rows)")

# gid segment-sum alone (the sort/expand backward's scatter)
gid_row = packed[9]
lane = jnp.arange(cap3, dtype=jnp.int32)


def segsum(d_packed, gid_row):
    gid = jnp.where(lane < num_pairs, gid_row.astype(jnp.int32), n)
    return [jax.ops.segment_sum(
        jnp.where(lane < num_pairs, d_packed[r], 0.0), gid,
        num_segments=n + 1)[:n] for r in range(9)]


timeit(jax.jit(segsum), packed, gid_row,
       label="9x gid segment_sum (sort/expand bwd scatter)")

# SSIM loss grad alone
img0 = jnp.asarray(rng.uniform(0, 1, (cam.height, cam.width, 3)),
                   jnp.float32)
timeit(jax.jit(jax.grad(lambda im: losses.photometric_loss(
    im, gt, cfg.lambda_dssim))), img0, label="photometric loss grad (SSIM)")
