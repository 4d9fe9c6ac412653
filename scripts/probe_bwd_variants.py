"""Attribute the train step's time + sweep blend-backward variants.

Builds the REAL train-path pair stream (proxy scene, eval resolution,
fused train builder) once, then times: full train step, blend forward,
blend backward at several (chunk, batch), and the gradient scatter — so
backward changes are judged in isolation instead of via the noisy
end-to-end step number. TPU env."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import jax
import jax.numpy as jnp
import numpy as np

ap = argparse.ArgumentParser()
ap.add_argument("--n", type=int, default=1_161_358)
ap.add_argument("--skip-step", action="store_true")
args = ap.parse_args()

from fovsplat.data import proxy
from fovsplat.models import state as S
from fovsplat.models.gaussians import GaussianParams
from fovsplat.ops.rasterize import RasterizeConfig, _grid
from fovsplat.ops import rasterize as rast
from fovsplat.ops.pallas import blend_fwd as pk
from fovsplat.train import loops

n = args.n
sc = proxy.bicycle_proxy(n=n)
rng = np.random.default_rng(1)
params = GaussianParams(
    xyz=jnp.asarray(sc["means"]),
    features_dc=jnp.asarray(sc["shs_dcs"][:, 0:1, :]),
    features_rest=jnp.asarray(sc["shs_rest"]),
    scaling=jnp.asarray(np.log(np.maximum(sc["scales"], 1e-9))),
    rotation=jnp.asarray(sc["rotations"]),
    opacity=jnp.asarray(np.log(sc["opacity"] / (1 - sc["opacity"]))[:, None]))
state = S.from_params(params)
cam = proxy.proxy_camera()
gt = jnp.asarray(rng.uniform(0, 1, (cam.height, cam.width, 3)), jnp.float32)
cfg = loops.LoopConfig(raster=RasterizeConfig(
    pair_capacity=1 << 22, chunk=4096, backend="pallas",
    compact_capacity=3_407_872, pallas_chunk=256))
gx, gy = _grid(cam)


def force(x):
    return float(np.asarray(jax.device_get(
        jax.tree.leaves(x)[0].ravel()[0].astype(jnp.float32))))


def timeit(f, *a, reps=10, label=""):
    out = f(*a)
    force(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*a)
    force(out)
    dt = (time.perf_counter() - t0) / reps * 1e3
    print(f"{label}: {dt:.2f} ms", flush=True)
    return out


if not args.skip_step:
    step = loops.make_photometric_step(cfg)
    st, aux = step(state, cam, gt, jnp.int32(0), jnp.float32(0.0))
    print("kept pairs:", int(aux["num_pairs"]), flush=True)
    timeit(lambda: step(state, cam, gt, jnp.int32(1), jnp.float32(0.0)),
           reps=5, label="full train step")

from fovsplat.ops import binning
from fovsplat.ops.projection import preprocess_cols
p = state.params


def build_packed(p, live):
    pc = preprocess_cols(p.xyz, p.get_scaling(), p.get_rotation(), cam)
    from fovsplat.ops import sh as shm
    dirs = p.xyz - jnp.asarray(cam.cam_center)[None, :]
    dirs = dirs / jnp.linalg.norm(dirs, axis=1, keepdims=True)
    col = jnp.maximum(shm.eval_sh(3, p.get_features(), dirs) + 0.5, 0.0)
    valid = pc.valid & (live > 0)
    tnum = jnp.where(valid, pc.tnum, 0)
    t1cols = [pc.rx0.astype(jnp.float32), pc.ry0.astype(jnp.float32),
              jnp.maximum(pc.rx1 - pc.rx0, 1).astype(jnp.float32),
              tnum.astype(jnp.float32),
              pc.mx, pc.my, pc.v1x, pc.v1y, pc.v2x, pc.v2y,
              pc.len1, pc.len2, pc.ca, pc.cb, pc.cc,
              p.get_opacity(), col[:, 0], col[:, 1], col[:, 2]]
    return binning.bin_fused_ps1(
        t1cols, valid, pc.depth, gx, gy, 1 << 22, False, None,
        3_407_872, 512, 16, train=True)


packed, seg_start, num_pairs, overflow, _c, _cand = jax.jit(build_packed)(
    p, state.live)
packed = jax.block_until_ready(packed)
print("stream kept:", int(jax.device_get(num_pairs)), flush=True)

ss, se = seg_start[:-1], seg_start[1:]
g_color = jnp.full((gx * gy, 256, 3), 0.01, jnp.float32)
g_T = jnp.full((gx * gy, 256), 0.001, jnp.float32)

fwd = jax.jit(lambda pd: pk._forward(pd, ss, se, gx, gy, 256, -4.5, False))
o = timeit(fwd, packed, label="blend fwd (chunk=256)")
out_f, nc = o
final_T = out_f[:, :, 3]
nc0 = nc[:, :, 0]

for chunk, batch, sfx in [(128, 8, 3), (128, 8, 2), (256, 8, 3),
                          (256, 8, 2), (128, 16, 3), (256, 16, 2),
                          (512, 8, 2)]:
    fin = jnp.zeros((gx * gy, 256, 8), jnp.float32)
    fin = fin.at[:, :, 0:3].set(g_color)
    fin = fin.at[:, :, 3].set(g_T)
    fin = fin.at[:, :, 4].set(final_T)
    fin = fin.at[:, :, 5].set(nc0.astype(jnp.float32))
    nc_max = jnp.max(nc0, axis=1)
    f = jax.jit(lambda pd, fi, nm, c=chunk, b=batch, s=sfx: pk._backward(
        pd, ss, se, fi, nm, gx, gy, c, -4.5, False, batch=b,
        sfx_parts=s))
    try:
        timeit(f, packed, fin, nc_max,
               label=f"blend bwd chunk={chunk} batch={batch} sfx={sfx}")
    except Exception as e:
        print(f"blend bwd chunk={chunk} batch={batch} sfx={sfx}: FAIL "
              f"{str(e)[:120]}", flush=True)

# How many pair rows can the backward ever write? (rows past each tile's
# deepest contributing pair are zero — candidates for pre-gid-sort
# compaction; VERDICT r4 lever 1).
nc_max_t = jnp.max(nc0, axis=1)
base_t = (ss // 128) * 128
deep_t = jnp.minimum(se, ss + nc_max_t)
cover = jnp.sum(jnp.minimum(se, base_t + ((jnp.maximum(deep_t - base_t, 0)
                                           + 127) // 128) * 128) - ss)
print(f"bwd-covered rows: {int(jax.device_get(cover))} of "
      f"{int(jax.device_get(num_pairs))} "
      f"({float(jax.device_get(cover)) / float(jax.device_get(num_pairs)):.1%})",
      flush=True)

# Gradient scatter cost (gid sort + windowed reduce) on the real gid row.
from fovsplat.ops.pallas import segment_reduce as psr
cap_s = packed.shape[1]
gid_row = packed[9]
d_rows = jnp.asarray(np.random.default_rng(3).normal(
    0, 1e-3, (9, cap_s)), jnp.float32)


def scatter(gid_row, d_rows):
    lane = jnp.arange(cap_s, dtype=jnp.int32)
    gid = jnp.where(lane < num_pairs, gid_row.astype(jnp.int32), n)
    srt = jax.lax.sort(
        (gid, *(jnp.where(lane < num_pairs, d_rows[r], 0.0)
                for r in range(9))), num_keys=1)
    quant = 512 * 16
    pad = (-cap_s) % quant
    rows = jnp.concatenate(
        [srt[0][None, :].astype(jnp.float32), jnp.stack(srt[1:], axis=0),
         jnp.zeros((6, cap_s), jnp.float32)], axis=0)
    if pad:
        tail = jnp.zeros((16, pad), jnp.float32)
        tail = tail.at[0, :].set(jnp.float32(n))
        rows = jnp.concatenate([rows, tail], axis=1)
    n_pad2 = ((n + 1 + psr.FLUSH - 1) // psr.FLUSH) * psr.FLUSH
    return psr.reduce_by_sorted_gid(rows, n_pad=n_pad2)


timeit(jax.jit(scatter), gid_row, d_rows, label="gradient scatter (sort+reduce)")


def scatter_gather(gid_row, d_rows):
    """Alternative: 2-operand (gid, lane) sort + row-gather of the
    cotangents by lane — wins iff a (CAP, 9->16) row gather beats 8
    extra sort operands (~2.7 ms each at this lane count)."""
    lane = jnp.arange(cap_s, dtype=jnp.int32)
    gid = jnp.where(lane < num_pairs, gid_row.astype(jnp.int32), n)
    g_s, lane_s = jax.lax.sort((gid, lane), num_keys=1)
    dmat = jnp.concatenate(
        [d_rows, jnp.zeros((7, cap_s), jnp.float32)], axis=0).T  # (CAP,16)
    rows = dmat[lane_s]                                          # gather
    quant = 512 * 16
    pad = (-cap_s) % quant
    rows16 = jnp.concatenate(
        [g_s[None, :].astype(jnp.float32), rows.T[:9],
         jnp.zeros((6, cap_s), jnp.float32)], axis=0)
    if pad:
        tail = jnp.zeros((16, pad), jnp.float32)
        tail = tail.at[0, :].set(jnp.float32(n))
        rows16 = jnp.concatenate([rows16, tail], axis=1)
    n_pad2 = ((n + 1 + psr.FLUSH - 1) // psr.FLUSH) * psr.FLUSH
    return psr.reduce_by_sorted_gid(rows16, n_pad=n_pad2)


try:
    timeit(jax.jit(scatter_gather), gid_row, d_rows,
           label="gradient scatter (2-op sort + lane row-gather)")
except Exception as e:
    print(f"scatter_gather FAIL {str(e)[:160]}", flush=True)


# Forward tile-sort payload alternatives at the REAL lane count: carry all
# 10 rows (today) vs keys+gid only + a post-sort row gather from the
# (N, 16) per-Gaussian table.
key_i = jnp.asarray(np.random.default_rng(5).integers(
    0, 1 << 30, cap_s), jnp.int32)
dbits_i = jnp.asarray(np.random.default_rng(6).integers(
    0, 1 << 30, cap_s), jnp.int32)
rows10 = [jnp.asarray(np.random.default_rng(10 + r).normal(
    0, 1, cap_s), jnp.float32) for r in range(10)]
timeit(jax.jit(lambda k, d, *rs: jax.lax.sort((k, d, *rs), num_keys=2)[0]),
       key_i, dbits_i, *rows10, label=f"sort 2keys+10rows @{cap_s}")
timeit(jax.jit(lambda k, d, g: jax.lax.sort((k, d, g), num_keys=2)[0]),
       key_i, dbits_i, rows10[0], label=f"sort 2keys+1row @{cap_s}")
tabN = jnp.asarray(np.random.default_rng(7).normal(0, 1, (n, 16)),
                   jnp.float32)
gid_i = jnp.minimum(gid_row.astype(jnp.int32), n - 1)
timeit(jax.jit(lambda t, i: t[i].T), tabN, gid_i,
       label=f"(N,16) row-gather by gid @{cap_s} + T")
