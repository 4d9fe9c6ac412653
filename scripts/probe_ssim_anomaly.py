"""Root-cause probe for the r4 on-chip SSIM=1.1355 anomaly (VERDICT item 6).

The r4 pipeline run (artifacts/onchip_pipeline_r4.json) once evaluated a
post-prune gate SSIM of 1.1355 on [0,1]-clipped images — mathematically
impossible (per-pixel SSIM <= ~1 + eps) and never reproduced offline.
Hypotheses: (a) raw-formula f32 cancellation (bounded by the r4 robust
clamp, but cannot explain +0.13 in the MEAN), (b) remote-tunnel host-read
corruption (stale/garbage buffer), (c) a compile defect in the jitted
eval at that exact shape.

This probe re-runs the r4 eval shape (400k proxy state, 512x384 views,
loops.make_eval_fns jit) many times with live-mask/param perturbations and
checks, per iteration, with ONE device computation:
  * raw (reference-formula) SSIM, robust SSIM, per-pixel max of each,
  * min of s1/s2 and max of |s12| - sqrt(s1*s2) (Cauchy-Schwarz margin),
  * a second, independent host read of the same device scalars
    (transport check: both reads must agree bitwise),
  * every K iterations: download the rendered image and recompute SSIM
    on the host in f64; device robust SSIM must match to ~1e-5.

Writes artifacts/ssim_probe_r5.json: either a reproduction with raw
moments captured, or a bound demonstration over N runs.
"""

import json
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
from fovsplat.ops.rasterize import RasterizeConfig
from fovsplat.train import loops, losses

N = int(os.environ.get("PROBE_N", "400000"))
ITERS = int(os.environ.get("PROBE_ITERS", "120"))
HOST_CHECK_EVERY = 10

sc = proxy.bicycle_proxy(n=N)
rng = np.random.default_rng(0)
params = GaussianParams(
    xyz=jnp.asarray(sc["means"]),
    features_dc=jnp.asarray(sc["shs_dcs"][:, 0:1, :]),
    features_rest=jnp.asarray(sc["shs_rest"]),
    scaling=jnp.asarray(np.log(np.maximum(sc["scales"], 1e-9))),
    rotation=jnp.asarray(sc["rotations"]),
    opacity=jnp.asarray(np.log(sc["opacity"] / (1 - sc["opacity"])))[:, None])
state = S.from_params(params)
_on_tpu = jax.devices()[0].platform not in ("cpu", "gpu")
cfg = loops.LoopConfig(raster=RasterizeConfig(
    pair_capacity=1 << 21, chunk=4096,
    backend="pallas" if _on_tpu else "xla",
    compact_capacity=(1 << 21) if _on_tpu else None, pallas_chunk=256))

cams = [proxy.proxy_camera(width=512, height=384) for _ in range(2)]
if os.environ.get("PROBE_GT", "render") == "render":
    # GT = the model's own renders: the jittered evals then sit in the
    # HIGH-SSIM regime (~0.9+) where mu1 ~= mu2 and s1 ~= s2 ~= s12 —
    # the cancellation territory the r4 anomaly lived in. PROBE_GT=rand
    # uses random images (SSIM ~0.02) instead.
    _r = jax.jit(lambda camera: jnp.clip(
        loops.render_state(state, camera, cfg)["render"], 0.0, 1.0))
    gts = [jnp.asarray(np.asarray(jax.device_get(_r(c)))) for c in cams]
    print("gt renders done", flush=True)
else:
    gts = [jnp.asarray(rng.uniform(0, 1, (384, 512, 3)), jnp.float32)
           for _ in range(2)]


def ssim_probe(img, gt):
    a, b = img[None], gt[None]
    w = losses._gaussian_1d(11, 1.5)
    mu1 = losses._depthwise_conv(a, w)
    mu2 = losses._depthwise_conv(b, w)
    mu1_sq, mu2_sq, mu12 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    s1 = losses._depthwise_conv(a * a, w) - mu1_sq
    s2 = losses._depthwise_conv(b * b, w) - mu2_sq
    s12 = losses._depthwise_conv(a * b, w) - mu12
    c1, c2 = 0.01 ** 2, 0.03 ** 2
    m_raw = ((2 * mu12 + c1) * (2 * s12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (s1 + s2 + c2))
    s1r = jnp.maximum(s1, 0.0)
    s2r = jnp.maximum(s2, 0.0)
    lim = jnp.sqrt(s1r * s2r)
    s12r = jnp.clip(s12, -lim, lim)
    m_rob = ((2 * mu12 + c1) * (2 * s12r + c2)) / (
        (mu1_sq + mu2_sq + c1) * (s1r + s2r + c2))
    return jnp.stack([
        jnp.mean(m_raw), jnp.mean(m_rob),
        jnp.max(m_raw), jnp.max(m_rob),
        jnp.min(s1), jnp.min(s2),
        jnp.max(jnp.abs(s12) - jnp.sqrt(jnp.maximum(s1, 0.0)
                                        * jnp.maximum(s2, 0.0))),
    ])


@jax.jit
def eval_probe(state, camera, gt, jitter):
    # Perturb opacity logits a little each iteration: different live
    # blends each run, like the prune loop's moving state.
    import dataclasses
    p = state.params
    p = dataclasses.replace(p, opacity=p.opacity + jitter)
    st = dataclasses.replace(state, params=p)
    out = loops.render_state(st, camera, cfg)
    img = jnp.clip(out["render"], 0.0, 1.0)
    return ssim_probe(img, gt), img


def host_ssim_np(img, gt):
    a = np.asarray(img, np.float64)[None]
    b = np.asarray(gt, np.float64)[None]
    g = np.asarray(losses._gaussian_1d(11, 1.5), np.float64)

    def blur(x):
        from numpy.lib.stride_tricks import sliding_window_view
        pad = 5
        xp = np.pad(x, ((0, 0), (pad, pad), (0, 0), (0, 0)), mode="constant")
        xh = np.einsum("bkhwc,k->bhwc",
                       sliding_window_view(xp, 11, axis=1).transpose(
                           0, 4, 1, 2, 3), g)
        xp = np.pad(xh, ((0, 0), (0, 0), (pad, pad), (0, 0)),
                    mode="constant")
        return np.einsum("bkhwc,k->bhwc",
                         sliding_window_view(xp, 11, axis=2).transpose(
                             0, 4, 1, 2, 3), g)

    mu1, mu2 = blur(a), blur(b)
    s1 = np.maximum(blur(a * a) - mu1 * mu1, 0)
    s2 = np.maximum(blur(b * b) - mu2 * mu2, 0)
    s12 = blur(a * b) - mu1 * mu2
    lim = np.sqrt(s1 * s2)
    s12 = np.clip(s12, -lim, lim)
    c1, c2 = 0.01 ** 2, 0.03 ** 2
    m = ((2 * mu1 * mu2 + c1) * (2 * s12 + c2)) / (
        (mu1 * mu1 + mu2 * mu2 + c1) * (s1 + s2 + c2))
    return float(np.mean(m))


art = {"n": N, "iters": ITERS, "events": [], "max_raw_mean": -9.0,
       "max_rob_mean": -9.0, "max_cs_margin": -9.0, "min_s": 9.0,
       "host_checks": [], "double_read_mismatches": 0}
t0 = time.time()
for it in range(ITERS):
    jit_amp = np.float32(0.02 * (it % 7))
    jitter = jnp.asarray(
        rng.normal(0, jit_amp, (N, 1)).astype(np.float32))
    vi = it % len(cams)
    stats, img = eval_probe(state, cams[vi], gts[vi], jitter)
    h1 = np.asarray(jax.device_get(stats))
    h2 = np.asarray(jax.device_get(stats))        # transport double-read
    if not np.array_equal(h1, h2):
        art["double_read_mismatches"] += 1
        art["events"].append({"iter": it, "kind": "double_read",
                              "a": h1.tolist(), "b": h2.tolist()})
    raw_m, rob_m, raw_px, rob_px, min_s1, min_s2, cs = map(float, h1)
    art["max_raw_mean"] = max(art["max_raw_mean"], raw_m)
    art["max_rob_mean"] = max(art["max_rob_mean"], rob_m)
    art["max_cs_margin"] = max(art["max_cs_margin"], cs)
    art["min_s"] = min(art["min_s"], min_s1, min_s2)
    if raw_m > 1.0 + 1e-3 or rob_m > 1.0 + 1e-6:
        art["events"].append({
            "iter": it, "kind": "ssim_gt_1", "raw_mean": raw_m,
            "rob_mean": rob_m, "raw_px_max": raw_px, "rob_px_max": rob_px,
            "min_s1": min_s1, "min_s2": min_s2, "cs_margin": cs})
        print(f"iter {it}: ANOMALY raw={raw_m} rob={rob_m}", flush=True)
    if it % HOST_CHECK_EVERY == 0:
        hval = host_ssim_np(np.asarray(jax.device_get(img)),
                            np.asarray(jax.device_get(gts[vi])))
        art["host_checks"].append({"iter": it, "device_rob": rob_m,
                                   "host_f64_rob": hval,
                                   "diff": abs(rob_m - hval)})
        if abs(rob_m - hval) > 1e-4:
            print(f"iter {it}: DEVICE/HOST SSIM MISMATCH "
                  f"{rob_m} vs {hval}", flush=True)
    if it % 20 == 0:
        print(f"iter {it}: raw={raw_m:.5f} rob={rob_m:.5f} "
              f"min_s=({min_s1:.2e},{min_s2:.2e}) cs={cs:.2e} "
              f"[{time.time()-t0:.0f}s]", flush=True)

art["wall_s"] = round(time.time() - t0, 1)
out = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "artifacts", "ssim_probe_r5.json")
with open(out, "w") as f:
    json.dump(art, f, indent=1)
print(json.dumps({k: art[k] for k in
                  ("max_raw_mean", "max_rob_mean", "max_cs_margin",
                   "min_s", "double_read_mismatches", "wall_s")}))
print(f"wrote {out}")
