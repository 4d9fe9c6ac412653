"""Time one full jitted training step (fwd + bwd + Adam) on the real TPU.

Photometric finetune step at bicycle scale (1.16M capacity), 1600-capped
eval-style resolution — the shape of the reference's eff_finetune loop
(eff_finetune.py:41-151)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from fovsplat.data.cameras import look_at_camera
from fovsplat.models import state as S
from fovsplat.models.gaussians import GaussianParams
from fovsplat.ops.rasterize import RasterizeConfig
from fovsplat.train import loops, optim

backend = os.environ.get("BENCH_BACKEND", "pallas")
n = int(os.environ.get("BENCH_N", "1161358"))
interp = os.environ.get("BENCH_INTERPRET", "") == "1"
width, height = (160, 128) if interp else (1600, 1063)
if interp:
    n = min(n, 3000)

rng = np.random.default_rng(0)
params = GaussianParams(
    xyz=jnp.asarray(rng.normal(0, 1.2, (n, 3)), jnp.float32),
    features_dc=jnp.asarray(rng.normal(0, 0.8, (n, 1, 3)), jnp.float32),
    features_rest=jnp.asarray(rng.normal(0, 0.05, (n, 15, 3)), jnp.float32),
    scaling=jnp.asarray(np.log(rng.uniform(0.002, 0.012, (n, 3))),
                        jnp.float32),
    rotation=jnp.asarray(rng.normal(0, 1, (n, 4)), jnp.float32),
    opacity=jnp.asarray(rng.normal(0.5, 1.0, (n, 1)), jnp.float32))
state = S.from_params(params)
cam = look_at_camera([0.4, -0.3, -4.0], [0, 0, 0], [0, -1, 0],
                     fovx=1.1, fovy=0.76, width=width, height=height)
gt = jnp.asarray(rng.uniform(0, 1, (height, width, 3)), jnp.float32)

cfg = loops.LoopConfig(raster=RasterizeConfig(
    pair_capacity=1 << 16 if interp else 1 << 22, chunk=4096,
    backend=backend, pallas_chunk=256, pallas_interpret=interp))
step = loops.make_photometric_step(cfg)

st, aux = step(state, cam, gt, jnp.int32(0), jnp.float32(0.0))
print("loss", float(aux["loss"]), "overflow", int(aux["overflow"]),
      flush=True)
reps = int(os.environ.get("BENCH_REPS", "10"))
t0 = time.perf_counter()
cur = st
for i in range(reps):
    cur, aux = step(cur, cam, gt, jnp.int32(i), jnp.float32(0.0))
    float(aux["loss"])
dt = (time.perf_counter() - t0) / reps * 1e3
print(f"train step ({backend}, {width}x{height}, {n}): {dt:.1f} ms "
      f"({1000.0 / dt:.2f} steps/s)", flush=True)
