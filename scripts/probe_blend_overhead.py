"""Isolate the fov blend kernel's per-tile fixed cost.

Three timings over the same (8, CAP) pair buffer and 8160-tile grid
(1237x822):
  A. all tiles EMPTY (seg length 0)      -> pure per-tile overhead
  B. every tile exactly 64 pairs (1 chunk) -> overhead + one chunk
  C. every tile 256 pairs (1 full chunk)   -> overhead + one full chunk
If A is a large fraction of the production blend time (~15.5 ms real),
the kernel is per-tile-overhead bound and tile-grouping is the fix.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from fovsplat.ops.pallas import blend_fov as pkf

gx, gy = 78, 52            # 1237x822 -> 78x52 tiles = 4056... use real grid
gx, gy = (1237 + 15) // 16, (822 + 15) // 16
num_tiles = gx * gy
cap = 1_835_008
rng = np.random.default_rng(0)

pair_rows = np.zeros((8, cap), np.float32)
pair_rows[0] = rng.uniform(0, 1237, cap)      # mx
pair_rows[1] = rng.uniform(0, 822, cap)       # my
pair_rows[2] = 0.5                            # ca
pair_rows[3] = 0.0                            # cbcc packed ~0
pair_rows[4] = 0.0                            # opacities packed ~0
pairs = jnp.asarray(pair_rows)

tile_act = jnp.zeros((num_tiles, 256, 4), jnp.float32).at[:, :, 0].set(1.0)

kern = jax.jit(lambda p, s, e, a: pkf.blend_fov_pallas(
    p, s, e, a, gx, gy, 256, -4.5, False, batch=8)[1])


def force(x):
    return float(np.asarray(jax.device_get(x.ravel()[0])))


def timeit(label, seg_start, seg_end, reps=30):
    out = kern(pairs, seg_start, seg_end, tile_act)
    force(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = kern(pairs, seg_start, seg_end, tile_act)
    force(out)
    print(f"{label}: {(time.perf_counter()-t0)/reps*1e3:.2f} ms", flush=True)


z = jnp.zeros(num_tiles, jnp.int32)
timeit("A empty tiles", z, z)

s64 = jnp.arange(num_tiles, dtype=jnp.int32) * 64
timeit("B 64 pairs/tile", s64, s64 + 64)

s256 = jnp.arange(num_tiles, dtype=jnp.int32) * 220
timeit("C 220 pairs/tile (unaligned)", s256, s256 + 220)

# D: REALISTIC data — every pair INSIDE its tile (power in the live
# range, nonzero opacity, so log1p/exp see production-like values and
# early exit can trigger) vs the zero-opacity far-away pairs of A-C.
from fovsplat.ops.pallas.blend_fov import pack2bf16_xla
per = 220
tid = (jnp.arange(cap, dtype=jnp.int32) // per) % num_tiles
tx0 = (tid % gx).astype(jnp.float32) * 16.0
ty0 = (tid // gx).astype(jnp.float32) * 16.0
u = jnp.asarray(rng.uniform(0, 16, (2, cap)), jnp.float32)
mx = tx0 + u[0]
my = ty0 + u[1]
ca = jnp.asarray(rng.uniform(0.05, 0.8, cap), jnp.float32)
cc = jnp.asarray(rng.uniform(0.05, 0.8, cap), jnp.float32)
cb = jnp.zeros(cap, jnp.float32)
op = jnp.asarray(rng.uniform(0.2, 0.95, cap), jnp.float32)
col = jnp.asarray(rng.uniform(0, 1, (6, cap)), jnp.float32)
pairs_real = jnp.stack([
    mx, my, ca, pack2bf16_xla(cb, cc), pack2bf16_xla(op, op),
    pack2bf16_xla(col[0], col[1]), pack2bf16_xla(col[2], col[3]),
    pack2bf16_xla(col[4], col[5])], axis=0)
pairs = pairs_real
kern = jax.jit(lambda p, s, e, a: pkf.blend_fov_pallas(
    p, s, e, a, gx, gy, 256, -4.5, False, batch=8)[1])
timeit("D 220 in-tile real data (single)", s256, s256 + 220)

# E: same but every tile runs the DUAL chain.
tile_act = tile_act.at[:, :, 1].set(1.0)
kern = jax.jit(lambda p, s, e, a: pkf.blend_fov_pallas(
    p, s, e, a, gx, gy, 256, -4.5, False, batch=8)[1])
timeit("E 220 in-tile real data (dual)", s256, s256 + 220)
