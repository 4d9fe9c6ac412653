"""Per-stage TPU timing: preprocess / binning+sort / gather / blend.

Keeps the stage taxonomy of the reference's commented-out kernel timers
(SURVEY.md §5.1). Run under the default (TPU) environment.
"""

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fovsplat.data.cameras import look_at_camera
from fovsplat.ops import binning, blend, projection
from fovsplat.ops.rasterize import RasterizeConfig, _grid


def timeit(fn, *args, reps=5):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = jax.block_until_ready(fn(*args))
    return (time.perf_counter() - t0) / reps, out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_161_358)
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--cap", type=int, default=1 << 22)
    ap.add_argument("--chunk", type=int, default=4096)
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    n = args.n
    means = jnp.asarray(rng.normal(0, 1.2, (n, 3)), jnp.float32)
    scales = jnp.asarray(rng.uniform(0.002, 0.012, (n, 3)), jnp.float32)
    quats = rng.normal(0, 1, (n, 4))
    quats /= np.linalg.norm(quats, axis=1, keepdims=True)
    quats = jnp.asarray(quats, jnp.float32)
    opac = jnp.asarray(rng.uniform(0.2, 0.95, (n,)), jnp.float32)
    colors = jnp.asarray(rng.uniform(0, 1, (n, 3)), jnp.float32)

    cam = look_at_camera([0.4, -0.3, -4.0], [0, 0, 0], [0, -1, 0],
                         fovx=1.1, fovy=0.7, width=args.width,
                         height=args.height)
    gx, gy = _grid(cam)
    cfg = RasterizeConfig(pair_capacity=args.cap, chunk=args.chunk)
    cap = cfg.padded_capacity()

    prep_f = jax.jit(lambda m, s, q: projection.preprocess(m, s, q, cam))
    t_prep, prep = timeit(prep_f, means, scales, quats)
    print(f"preprocess: {t_prep*1e3:.2f} ms", flush=True)

    bin_f = jax.jit(lambda p: binning.bin_gaussians(p, gx, gy, cap))
    t_bin, bn = timeit(bin_f, prep)
    print(f"bin+sort:   {t_bin*1e3:.2f} ms  (pairs={int(bn.num_pairs)}, "
          f"overflow={int(bn.overflow)})", flush=True)

    def gather_f(prep, bn):
        gid = jnp.minimum(bn.pair_gauss, n - 1)
        return (prep.mean2d[gid], prep.conic[gid], opac[gid], colors[gid])

    t_gath, gathered = timeit(jax.jit(gather_f), prep, bn)
    print(f"gather:     {t_gath*1e3:.2f} ms", flush=True)

    m2d, con, op, col = gathered
    blend_f = jax.jit(lambda *a: blend._blend_forward_impl(
        *a, gx, gy, cfg.chunk, cfg.power_cutoff))
    t_blend, _ = timeit(blend_f, bn.pair_tile, m2d, con, op, col,
                        bn.seg_start, bn.num_pairs)
    print(f"blend:      {t_blend*1e3:.2f} ms", flush=True)
    print(f"TOTAL:      {(t_prep+t_bin+t_gath+t_blend)*1e3:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
