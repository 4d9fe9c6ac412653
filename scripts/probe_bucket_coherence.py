"""Decide the Pallas bucket tile-sort design with measurements.

The bucket-sort plan (ARCHITECTURE round-4 lever #3) is: a Pallas
scatter pass that partitions the expanded pair stream into B tile-range
buckets, then a BATCHED lax.sort over (B, cap_b) rows — measured 4.2-6.2
ms for the same total lanes vs 10.5 flat. The scatter is only cheap if
each 512-lane input chunk touches FEW buckets (runs-per-chunk ~ DMA /
staging-merge count). Stream order = gaussian order, so model layout
controls coherence: this probe measures runs-per-chunk for the proxy in
its native (random) order vs MORTON order (a one-time model reordering
we are free to apply at pack time), plus bucket-occupancy skew (sets
cap_b padding), plus the real batched-sort cost at the implied shapes.
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import jax
import jax.numpy as jnp
import numpy as np

ap = argparse.ArgumentParser()
ap.add_argument("--skip-sort", action="store_true")
args = ap.parse_args()

from fovsplat.data.cameras import look_at_camera  # noqa: E402
from fovsplat.data import proxy  # noqa: E402
from fovsplat.ops import foveation, projection, sh  # noqa: E402
from fovsplat.ops import foveated as fov  # noqa: E402
from fovsplat.ops.pallas import build_table as ptab  # noqa: E402
from fovsplat.ops.pallas import expand_fov as pex  # noqa: E402
from fovsplat.ops.rasterize import RasterizeConfig, _grid  # noqa: E402

n = 1_161_358
L = 4
sc = proxy.bicycle_proxy(n=n)
cam = proxy.proxy_camera(width=1237, height=822)
gx, gy = _grid(cam)
num_tiles = gx * gy
gaze = jnp.array([0.5, 0.5], jnp.float32)
alpha = 0.05
fov_cfg = fov.FoveationConfig()
cap = 2_490_368
dummy_slack = 524_288
compact_capacity = 1_769_472
kchunk, kbatch = 512, 16


def morton_perm(xyz):
    q = np.clip(((xyz - xyz.min(0)) / (np.ptp(xyz, 0) + 1e-9) * 1023), 0,
                1023).astype(np.uint64)
    code = np.zeros(len(xyz), np.uint64)
    for b in range(10):
        for d in range(3):
            code |= ((q[:, d] >> b) & 1) << np.uint64(3 * b + d)
    return np.argsort(code, kind="stable")


def stream_keys(order):
    mdl = {k: np.asarray(v)[order] if v.ndim and len(v) == n else v
           for k, v in sc.items()}
    model = jax.jit(fov.pack_fov_model)(
        jnp.asarray(mdl["means"]), jnp.asarray(mdl["scales"]),
        jnp.asarray(mdl["rotations"]), jnp.asarray(mdl["opacities4"]),
        jnp.asarray(mdl["shs_dcs"]), jnp.asarray(mdl["shs_rest"]),
        jnp.asarray(mdl["highest_levels"]))
    cfg = RasterizeConfig(pair_capacity=cap, chunk=4096, backend="pallas",
                          pallas_chunk=256, pallas_fwd_only=True,
                          dummy_slack=dummy_slack,
                          compact_capacity=compact_capacity)
    # Reach into the fused path far enough to get the sort INPUT key row.
    levels = foveation.compute_tile_levels(gaze, cam.width, cam.height,
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
        model.geo_t, model.col_t, consts, n=n, grid_x=gx, grid_y=gy,
        width=cam.width, height=cam.height, fov_num=L)
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
        gaze[0], gaze[1], fov_cfg.real_image_width,
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
    return np.asarray(jax.device_get(key)), int(jax.device_get(kept))


db = 31 - int(num_tiles).bit_length()


def analyze(name, key, kept):
    tile = (key[:kept].astype(np.int64) >> db).astype(np.int32)
    tile = np.clip(tile, 0, num_tiles)  # sentinel guard
    trow = tile // gx
    print(f"--- {name}: kept={kept}")
    for B, bname in [(16, "row-group(4)"), (64, "row(1)"),
                     (52, "row exact")]:
        bucket = np.clip(trow * B // gy, 0, B - 1)
        nchunks = kept // 512
        bk = bucket[:nchunks * 512].reshape(nchunks, 512)
        # runs per chunk = 1 + transitions (bucket-grouped runs after the
        # in-chunk permute = distinct buckets per chunk)
        distinct = np.array([len(np.unique(r)) for r in bk])
        occ = np.bincount(bucket, minlength=B)
        print(f"  B={B:3d} {bname:14s} distinct-buckets/chunk "
              f"p50={np.percentile(distinct, 50):.0f} "
              f"p90={np.percentile(distinct, 90):.0f} "
              f"max={distinct.max()} | occupancy mean={occ.mean():.0f} "
              f"max={occ.max()} skew={occ.max()/occ.mean():.2f}")


key_o, kept_o = stream_keys(np.arange(n))
analyze("original order", key_o, kept_o)
perm = morton_perm(np.asarray(sc["means"]))
key_m, kept_m = stream_keys(perm)
analyze("morton order", key_m, kept_m)

if not args.skip_sort:
    # Batched-sort cost at the candidate shapes (7 operands like the fov
    # sort: i32 key + 6 f32 payloads).
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
        print(f"{label}: {(time.perf_counter()-t0)/reps*1e3:.2f} ms",
              flush=True)

    rng = np.random.default_rng(0)
    for B, capb in [(16, 131072), (16, 163840), (64, 32768), (64, 40960),
                    (64, 49152), (128, 16384), (256, 8192)]:
        k = jnp.asarray(rng.integers(0, 1 << 30, (B, capb)), jnp.int32)
        a6 = jnp.asarray(rng.normal(0, 1, (6, B, capb)), jnp.float32)
        f = jax.jit(lambda k, a: jax.lax.sort(
            (k, *[a[i] for i in range(6)]), dimension=1, num_keys=1))
        timeit(f, k, a6, label=f"batched sort ({B},{capb}) "
               f"lanes={B*capb/1e6:.2f}M")
