"""Rays/s scaling harness: tile-sharded rendering across mesh sizes.

Measures the distributed render (Gaussian-sharded binning + all-to-all +
tile-sharded blend) at 1..N devices and reports scaling efficiency — the
BASELINE.json >=80%-at-2-hosts bar. On this single-chip environment it runs
on the virtual CPU mesh (functional validation; wall-clock efficiency is
only meaningful on real multi-chip slices).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("SCALING_CPU", "1") == "1":
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=8")
    os.environ["PYTHONPATH"] = ""

import jax

if os.environ.get("SCALING_CPU", "1") == "1":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from fovsplat.data.cameras import look_at_camera
from fovsplat.parallel import data_parallel as dp
from fovsplat.parallel import tile_shard

n = int(os.environ.get("SCALING_N", "16384"))
width, height = 640, 360
rng = np.random.default_rng(0)
means = jnp.asarray(rng.normal(0, 1.2, (n, 3)), jnp.float32)
scales = jnp.asarray(rng.uniform(0.002, 0.02, (n, 3)), jnp.float32)
quats = rng.normal(0, 1, (n, 4)); quats /= np.linalg.norm(quats, axis=1, keepdims=True)
quats = jnp.asarray(quats, jnp.float32)
opac = jnp.asarray(rng.uniform(0.2, 0.95, (n,)), jnp.float32)
colors = jnp.asarray(rng.uniform(0, 1, (n, 3)), jnp.float32)
cam = look_at_camera([0.4, -0.3, -4.0], [0, 0, 0], [0, -1, 0],
                     fovx=1.1, fovy=0.7, width=width, height=height)

results = {}
ndevs = [d for d in (1, 2, 4, 8) if d <= len(jax.devices())]
for ndev in ndevs:
    mesh = dp.make_mesh(ndev)

    rfn = jax.jit(lambda m, s, q, o, c: tile_shard.render_tile_sharded(
        mesh, m, s, q, o, c, cam, pair_capacity=1 << 16, chunk=512)[0])

    def render():
        return rfn(means, scales, quats, opac, colors)

    img = render()
    float(img.ravel()[0])
    t0 = time.perf_counter()
    reps = 3
    for _ in range(reps):
        float(render().ravel()[0])
    dt = (time.perf_counter() - t0) / reps
    rays = width * height / dt
    results[ndev] = rays
    eff = rays / (results[1] * ndev) if 1 in results else 1.0
    print(f"devices={ndev}: {dt*1e3:8.1f} ms/frame  "
          f"{rays/1e6:6.2f} Mrays/s  efficiency={eff:.2%}", flush=True)


# ---- foveated sharded path (production fused pipeline) -------------------
# Same harness over parallel/fov_shard: per-shard expand/cull/compact
# kernel (interpret on CPU), all-to-all, dual-transmittance blend.
if os.environ.get("SCALING_FOV", "1") == "1":
    from fovsplat.data import proxy
    from fovsplat.ops import foveated as fovops
    from fovsplat.parallel import fov_shard

    nf = (int(os.environ.get("SCALING_FOV_N", "16384")) // 8) * 8
    scf = proxy.bicycle_proxy(n=nf)
    model = fovops.pack_fov_model(
        jnp.asarray(scf["means"]), jnp.asarray(scf["scales"]),
        jnp.asarray(scf["rotations"]), jnp.asarray(scf["opacities4"]),
        jnp.asarray(scf["shs_dcs"]), jnp.asarray(scf["shs_rest"]),
        jnp.asarray(scf["highest_levels"]))
    fcam = proxy.proxy_camera(width=256, height=192)
    gaze = jnp.asarray([0.5, 0.5], jnp.float32)
    interp = jax.devices()[0].platform == "cpu"
    print(f"\nfoveated sharded path ({nf} gaussians, "
          f"{fcam.width}x{fcam.height}):", flush=True)
    fres = {}
    for ndev in ndevs:
        mesh = dp.make_mesh(ndev)
        rfn = jax.jit(lambda g: fov_shard.render_fov_tile_sharded(
            mesh, model, fcam, g, alpha=0.05, pair_capacity=1 << 16,
            per_dest_capacity=16384 // ndev + 8192,
            expand_chunk=128, expand_batch=4, blend_chunk=128,
            interpret=interp)[0])
        img = rfn(gaze)
        float(img.ravel()[0])
        t0 = time.perf_counter()
        reps = 2
        for _ in range(reps):
            float(rfn(gaze).ravel()[0])
        dt = (time.perf_counter() - t0) / reps
        rays = fcam.width * fcam.height / dt
        fres[ndev] = rays
        eff = rays / (fres[1] * ndev) if 1 in fres else 1.0
        print(f"devices={ndev}: {dt*1e3:8.1f} ms/frame  "
              f"{rays/1e6:6.2f} Mrays/s  efficiency={eff:.2%}", flush=True)
