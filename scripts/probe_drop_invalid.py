"""On-chip validation + timing of expand_drop_invalid at bench scale.

Renders the bench-scale foveated SoA frame with the dummy scheme vs the
dummy-free (marker-guard) scheme: images must match exactly, the miss
counter must be 0, and the candidate stream should shrink by the invalid
count (~22%). Reports per-gaze e2e times for both. TPU env."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from fovsplat.data import proxy
from fovsplat.ops import foveated as fov
from fovsplat.ops.rasterize import RasterizeConfig

n = 1_161_358
sc = proxy.bicycle_proxy(n=n)
cam = proxy.proxy_camera(width=1237, height=822)
# Random row permutation: invalid rows (frustum/level culls) cluster in
# the model's natural order (proxy components; real PLYs cluster too),
# which makes a chunk's row span exceed the expand window. A one-time
# shuffle scatters them uniformly for EVERY view.
perm = np.random.default_rng(7).permutation(n)
model = jax.jit(fov.pack_fov_model)(
    jnp.asarray(sc["means"][perm]), jnp.asarray(sc["scales"][perm]),
    jnp.asarray(sc["rotations"][perm]),
    jnp.asarray(sc["opacities4"][perm]),
    jnp.asarray(sc["shs_dcs"][perm]), jnp.asarray(sc["shs_rest"][perm]),
    jnp.asarray(sc["highest_levels"][perm]))


def force(x):
    return float(np.asarray(jax.device_get(
        jax.tree.leaves(x)[0].ravel()[0].astype(jnp.float32))))


def timeit(f, *a, reps=20, label=""):
    out = f(*a)
    force(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*a)
    force(out)
    print(f"{label}: {(time.perf_counter()-t0)/reps*1e3:.2f} ms",
          flush=True)
    return out


for gz in [(0.5, 0.5), (0.8, 0.8)]:
    gaze = jnp.asarray(gz, jnp.float32)
    outs = {}
    for flag in (False, True):
        cfg = RasterizeConfig(
            pair_capacity=3_014_656 if not flag else 2_359_296,
            backend="pallas", pallas_fwd_only=True, dummy_slack=0,
            compact_capacity=1_769_472, expand_drop_invalid=flag)
        f = jax.jit(lambda m, g, c=cfg: fov.rasterize_fov_soa(
            m, cam, gaze=g, alpha=0.05, blending=True, config=c))
        out = timeit(f, model, gaze,
                     label=f"gaze={gz} drop_invalid={flag}")
        outs[flag] = {k: np.asarray(jax.device_get(v))
                      for k, v in out.items()}
    a, b = outs[False], outs[True]
    print(f"  cand {int(a['candidates'])} -> {int(b['candidates'])}, "
          f"kept {int(a['num_pairs'])} -> {int(b['num_pairs'])}, "
          f"overflow {int(a['overflow'])} -> {int(b['overflow'])}",
          flush=True)
    assert int(b["overflow"]) == 0, "window misses at bench scale!"
    assert int(b["num_pairs"]) == int(a["num_pairs"])
    err = np.abs(a["render"] - b["render"]).max()
    print(f"  max image diff: {err:.2e}", flush=True)
    assert err < 1e-5
print("drop_invalid validated on-chip", flush=True)
