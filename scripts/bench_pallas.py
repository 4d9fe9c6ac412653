"""Time the Pallas blend (fwd + bwd) + gather on the real TPU at 1080p."""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
# NOTE: do NOT enable jax_compilation_cache_dir under the remote-compile TPU
# backend — persistent-cache writes deadlock against it.
import jax.numpy as jnp
import numpy as np

from fovsplat.data.cameras import look_at_camera
from fovsplat.ops import binning, blend, projection
from fovsplat.ops.pallas import blend_fwd as pk
from fovsplat.ops.rasterize import RasterizeConfig, _grid

rng = np.random.default_rng(0)
n = int(os.environ.get("BENCH_N", "1161358"))
means = jnp.asarray(rng.normal(0, 1.2, (n, 3)), jnp.float32)
scales = jnp.asarray(rng.uniform(0.002, 0.012, (n, 3)), jnp.float32)
quats = rng.normal(0, 1, (n, 4)); quats /= np.linalg.norm(quats, axis=1, keepdims=True)
quats = jnp.asarray(quats, jnp.float32)
opac = jnp.asarray(rng.uniform(0.2, 0.95, (n,)), jnp.float32)
colors = jnp.asarray(rng.uniform(0, 1, (n, 3)), jnp.float32)
cam = look_at_camera([0.4, -0.3, -4.0], [0, 0, 0], [0, -1, 0],
                     fovx=1.1, fovy=0.7, width=1920, height=1080)
gx, gy = _grid(cam)
num_tiles = gx * gy
cap = 1 << 23
chunk = int(os.environ.get("BENCH_CHUNK", "256"))
acap = ((cap + num_tiles * chunk + chunk - 1) // chunk) * chunk


def _force(x):
    # block_until_ready does not reliably serialize under the remote
    # backend; a host read of a scalar reduction does.
    leaves = jax.tree.leaves(x)
    return float(jnp.sum(leaves[0].ravel()[:1]))


def timeit(f, *a, reps=10, label=""):
    out = f(*a)
    _force(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*a)
        _force(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{label}: {dt*1e3:.2f} ms", flush=True)
    return out


prep = timeit(jax.jit(lambda m, s, q: projection.preprocess(m, s, q, cam)),
              means, scales, quats, reps=5, label="preprocess")
bn = timeit(jax.jit(lambda p: binning.bin_gaussians(p, gx, gy, cap)),
            prep, reps=5, label="bin+sort")
print("pairs", int(bn.num_pairs), "overflow", int(bn.overflow), flush=True)
bn2 = timeit(jax.jit(lambda b: binning.align_segments(b, chunk, num_tiles, acap)),
             bn, reps=5, label="align")


def gather_packed(prep, bn2):
    gid = jnp.minimum(bn2.pair_gauss, n - 1)
    table = pk.pack_pairs(prep.mean2d, prep.conic, opac, colors)  # (ROW, N)
    return table[:, gid]


packed = timeit(jax.jit(gather_packed), prep, bn2, reps=5,
                label="packed gather")

fwd = jax.jit(lambda p, s, e: pk.blend_pallas(p, s, e, gx, gy, chunk,
                                              -4.5, False))
out = timeit(fwd, packed, bn2.seg_start, bn2.seg_end, reps=10,
             label=f"pallas fwd (chunk={chunk})")
print("finite:", bool(jnp.all(jnp.isfinite(out[0]))),
      "Tmean", float(out[1].mean()), flush=True)


def loss(p):
    c, T, _ = pk.blend_pallas(p, bn2.seg_start, bn2.seg_end, gx, gy, chunk,
                              -4.5, False)
    return jnp.sum(c * c) + jnp.sum(T)


gfn = jax.jit(jax.grad(loss))
timeit(gfn, packed, reps=5, label="pallas fwd+bwd")

# Numerical check vs XLA blend.
gid = jnp.minimum(bn.pair_gauss, n - 1)
ref = jax.jit(lambda *a: blend._blend_forward_impl(*a, gx, gy, 4096, -4.5))(
    bn.pair_tile, prep.mean2d[gid], prep.conic[gid], opac[gid], colors[gid],
    bn.seg_start, bn.num_pairs)
d = float(jnp.max(jnp.abs(out[0] - ref[0])))
dT = float(jnp.max(jnp.abs(out[1] - ref[1])))
print("max |pallas - xla| color:", d, "T:", dT, flush=True)

# End-to-end single-call pipeline (inference path).
from fovsplat.ops import rasterize as rastmod
cfgP = rastmod.RasterizeConfig(pair_capacity=cap, chunk=4096,
                               backend="pallas", pallas_chunk=chunk)
e2e = jax.jit(lambda m, s, q, o, c: rastmod.rasterize(
    m, s, q, o, cam, colors=c, config=cfgP)["render"])
timeit(e2e, means, scales, quats, opac, colors, reps=10,
       label="E2E pallas rasterize")
