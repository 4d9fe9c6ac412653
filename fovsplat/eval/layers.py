"""Per-PS-layer quality evaluation.

Counterpart of fov3dgs/quality_eval_layers_{ours,naive,mmfr}.py +
quality_metrics_layer.py: evaluate each foveation layer's model at its
pooling size (uniform-HVS MSE), writing `<scene>_<ps>.json` files like the
checked-in layers_eval_results/.
"""

from __future__ import annotations

import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from fovsplat.eval import metrics
from fovsplat.ops import rasterize as rast
from fovsplat.ops.foveated import compute_fov_colors


def layer_render_ours(params, live, composed, layer: int,
                      cfg: rast.RasterizeConfig):
    """Render layer `layer` of the composed model everywhere (no foveation):
    level-l DC/opacity for Gaussians surviving to the layer
    (quality_eval_layers_ours.py:25-37)."""
    hl = jnp.asarray(composed.highest_levels)
    keep = jnp.asarray(live) & (hl >= layer)
    opac = jnp.asarray(composed.opacities[:, layer])
    dc = jnp.asarray(composed.shs_dcs[:, layer])[:, None, :]

    @jax.jit
    def render(camera):
        colors = compute_fov_colors(params.xyz, params.features_rest,
                                    dc, camera.cam_center)[:, 0, :]
        out = rast.rasterize(params.xyz, params.get_scaling(),
                             params.get_rotation(), opac, camera,
                             colors=colors, config=cfg, live_mask=keep)
        return out["render"]

    return render


def layer_render_naive(params, live, highest_levels, layer: int,
                       cfg: rast.RasterizeConfig):
    """SM-FR layer render: shared color/opacity, participation gated by
    highest_levels >= layer (render_naive.py:72-76)."""
    keep = jnp.asarray(live) & (jnp.asarray(highest_levels) >= layer)

    @jax.jit
    def render(camera):
        out = rast.rasterize(params.xyz, params.get_scaling(),
                             params.get_rotation(), params.get_opacity(),
                             camera, shs=params.get_features(),
                             config=cfg, live_mask=keep)
        return out["render"]

    return render


def eval_layers(render_for_layer, views, pooling_ladder, out_dir: str,
                scene_name: str, max_views: int | None = None) -> dict:
    """render_for_layer(layer) -> render(camera). Evaluates layer i's
    renders against GT at pooling size ladder[i] (uniform HVS, MSE) plus
    PSNR/SSIM; writes `<scene>_<ps>.json` per layer."""
    os.makedirs(out_dir, exist_ok=True)
    results = {}
    for i, ps in enumerate(pooling_ladder):
        render = render_for_layer(i)
        hvs, psnr, ssim = [], [], []
        for v in views[:max_views]:
            img = np.clip(np.asarray(render(v.camera)), 0, 1)
            hvs.append(metrics.hvs_uniform(img, v.image, float(ps)))
            psnr.append(metrics.psnr(img, v.image))
            ssim.append(metrics.ssim(img, v.image))
        res = {"hvs": float(np.mean(hvs)), "psnr": float(np.mean(psnr)),
               "ssim": float(np.mean(ssim)), "pooling_size": ps}
        results[ps] = res
        # Reference schema (layers_eval_results/naiveFR/bicycle_3.json,
        # writer at quality_metrics_layer.py:68): {"ps=<ps>": {"HVS": x}}.
        with open(os.path.join(out_dir, f"{scene_name}_{ps}.json"), "w") as f:
            json.dump({f"ps={ps}": {"HVS": res["hvs"]}}, f, indent=2)
    return results
