"""Time the Pallas blend kernel + packed gather on the real TPU at 1080p."""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
# NOTE: do NOT enable jax_compilation_cache_dir under the remote-compile TPU
# backend — persistent-cache writes deadlock against it (observed: process
# blocks on the relay socket before the first compile completes).
import jax.numpy as jnp
import numpy as np

from fovsplat.data.cameras import look_at_camera
from fovsplat.ops import binning, blend, projection
from fovsplat.ops.pallas import blend_fwd
from fovsplat.ops.rasterize import _grid

rng = np.random.default_rng(0)
n = 1_161_358
means = jnp.asarray(rng.normal(0, 1.2, (n, 3)), jnp.float32)
scales = jnp.asarray(rng.uniform(0.002, 0.012, (n, 3)), jnp.float32)
quats = rng.normal(0, 1, (n, 4)); quats /= np.linalg.norm(quats, axis=1, keepdims=True)
quats = jnp.asarray(quats, jnp.float32)
opac = jnp.asarray(rng.uniform(0.2, 0.95, (n,)), jnp.float32)
colors = jnp.asarray(rng.uniform(0, 1, (n, 3)), jnp.float32)
cam = look_at_camera([0.4, -0.3, -4.0], [0, 0, 0], [0, -1, 0],
                     fovx=1.1, fovy=0.7, width=1920, height=1080)
gx, gy = _grid(cam)
cap = 1 << 23
chunk = int(os.environ.get("BENCH_CHUNK", "256"))

prep = jax.jit(lambda m, s, q: projection.preprocess(m, s, q, cam))(means, scales, quats)
bn = jax.jit(lambda p: binning.bin_gaussians(p, gx, gy, cap))(prep)
jax.block_until_ready(bn.pair_tile)
print("pairs", int(bn.num_pairs), "overflow", int(bn.overflow), flush=True)


def gather_packed(prep, bn):
    gid = jnp.minimum(bn.pair_gauss, n - 1)
    table = blend_fwd.pack_pairs(prep.mean2d, prep.conic, opac, colors)
    return table[gid]


gf = jax.jit(gather_packed)
packed = jax.block_until_ready(gf(prep, bn))
t0 = time.perf_counter()
for _ in range(5):
    packed = jax.block_until_ready(gf(prep, bn))
print(f"packed gather: {(time.perf_counter()-t0)/5*1e3:.2f} ms", flush=True)

pf = jax.jit(lambda p, s: blend_fwd.blend_fwd_pallas(p, s, gx, gy, chunk=chunk))
out = jax.block_until_ready(pf(packed, bn.seg_start))
t0 = time.perf_counter()
for _ in range(10):
    out = jax.block_until_ready(pf(packed, bn.seg_start))
print(f"pallas blend (chunk={chunk}): {(time.perf_counter()-t0)/10*1e3:.2f} ms", flush=True)
print("finite:", bool(jnp.all(jnp.isfinite(out[0]))), "Tmean", float(out[1].mean()), flush=True)

# Numerical check vs XLA blend on the same inputs.
gid = jnp.minimum(bn.pair_gauss, n - 1)
ref = jax.jit(lambda *a: blend._blend_forward_impl(*a, gx, gy, 4096, -4.5))(
    bn.pair_tile, prep.mean2d[gid], prep.conic[gid], opac[gid], colors[gid],
    bn.seg_start, bn.num_pairs)
d = float(jnp.max(jnp.abs(out[0] - ref[0])))
dT = float(jnp.max(jnp.abs(out[1] - ref[1])))
print("max |pallas - xla| color:", d, "T:", dT, flush=True)
