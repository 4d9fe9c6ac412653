"""Ladder-fidelity probe (VERDICT r4 item 7): can deep-pooling HVS gates
BIND on the proxy scene at all?

Reference mechanism (scripts/run_multi_ecc_masking.py:108-112 +
metric_mask_learn.py:255): ONE absolute target = PS1 model's uniform HVS
at pooling_size=1 (times target_loss_scale=1.0), tested against each
layer's HVS at its OWN pooling size. On bicycle this binds hard at depth:
a random subsample to the reference counts reads HVS@3 = 1.14e-4 vs the
2.0e-5 target (5.7x over; layers_eval_results/naiveFR/bicycle_3.json).

r4's proxy ladder overpruned at depth ([1,.42,.16,.08] vs [1,.40,.22,.17])
with per-pooling relative targets that never bound. This probe measures,
at the r4 on-chip shape (400k proxy, 512x384, rendered GT):

  * PS1@1 uniform HVS (the reference's absolute target),
  * HVS@ps of RANDOM subsamples at the reference ladder fractions and the
    r4 overpruned fractions, for ps in (3, 7, 12)

and reports the bind ratios (subsample HVS@ps / PS1@1). Ratios >> 1 mean
reference-style gates would bind; ratios < 1 mean NO absolute target near
PS1@1 can bind on this proxy and the deep-layer fractions are governed by
the pruning budget, not gate looseness — the causal fork VERDICT asks to
resolve. Writes artifacts/ladder_probe_r5.json.
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
from fovsplat.train import loops

N = int(os.environ.get("PROBE_N", "400000"))
NVIEW = 2

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

cams = [proxy.proxy_camera(width=512, height=384) for _ in range(NVIEW)]

# GT = the full model's own renders (the r4 pipeline's gt_render stage).
eval_view, hvs_view = loops.make_eval_fns(cfg)
render = jax.jit(lambda st, cam: jnp.clip(
    loops.render_state(st, cam, cfg)["render"], 0.0, 1.0))
gts = [np.asarray(jax.device_get(render(state, c))) for c in cams]
print("gt renders done", flush=True)


def hvs_at(st, ps):
    return float(np.mean([
        float(hvs_view(st, cams[i], jnp.asarray(gts[i]), float(ps)))
        for i in range(NVIEW)]))


t0 = time.time()
art = {"n": N, "views": NVIEW}
# "PS1" stand-in: GT comes from the FULL model, so the full state's HVS is
# exactly 0; the r4 pipeline's PS1 was the post-prune 85%-live state.
import dataclasses
keep85 = rng.random(N) < 0.85
ps1_state = dataclasses.replace(state, live=jnp.asarray(keep85))
ps1_at_1 = hvs_at(ps1_state, 1.0)
art["ps1_hvs"] = {"1": ps1_at_1}
for ps in (3.0, 7.0, 12.0):
    art["ps1_hvs"][str(int(ps))] = hvs_at(ps1_state, ps)
print(f"ps1(85% live) hvs: {art['ps1_hvs']} [{time.time()-t0:.0f}s]",
      flush=True)

# Random subsamples (the reference's naive-FR construction, gen_naive_FR.py)
art["subsample"] = {}
for frac in (0.40, 0.22, 0.17, 0.16, 0.08):
    keep = keep85 & (rng.random(N) < frac / 0.85)
    st = dataclasses.replace(state, live=jnp.asarray(keep))
    row = {}
    for ps in (3.0, 7.0, 12.0):
        v = hvs_at(st, ps)
        row[str(int(ps))] = v
        row[f"bind_ratio_{int(ps)}"] = v / ps1_at_1
    art["subsample"][f"{frac:.2f}"] = row
    print(f"frac={frac}: {row} [{time.time()-t0:.0f}s]", flush=True)

art["reference_bind_example"] = {
    "naive_hvs_ps3_over_ps1target": 1.1408e-4 / 2.0062e-5,
    "note": "bicycle: random-subsample layer at ps=3 sits 5.7x over the "
            "reference's absolute target -> gates bind hard"}
art["wall_s"] = round(time.time() - t0, 1)
out = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "artifacts", "ladder_probe_r5.json")
with open(out, "w") as f:
    json.dump(art, f, indent=1)
print(json.dumps(art))
