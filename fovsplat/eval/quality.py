"""Quality evaluation -> JSON (reference full_eval_results schema).

Counterpart of fov3dgs/quality_eval.py + quality_metrics.py (+ per-layer
variants quality_eval_layers_*.py): render the test split, compute
SSIM/PSNR/LPIPS/HVS (uniform, and per-PS-layer for masked models), write
`<scene>_quality.json` and `*_per_view.json`.
"""

from __future__ import annotations

import json
import os

import jax.numpy as jnp
import numpy as np

from fovsplat.eval import metrics
from fovsplat.ops import rasterize as rast


def eval_views(render_fn, views, hvs_pooling: float | None = 1.0) -> dict:
    """render_fn(camera) -> (H,W,3). Returns mean metrics + per-view lists."""
    per_view = {"ssim": [], "psnr": [], "lpips": [], "hvs": [], "name": []}
    for v in views:
        img = np.clip(np.asarray(render_fn(v.camera)), 0, 1)
        gt = v.image
        per_view["name"].append(v.image_name)
        per_view["ssim"].append(metrics.ssim(img, gt))
        per_view["psnr"].append(metrics.psnr(img, gt))
        per_view["lpips"].append(metrics.lpips(img, gt))
        if hvs_pooling is not None:
            per_view["hvs"].append(
                metrics.hvs_uniform(img, gt, hvs_pooling))
    agg = {}
    for k in ("ssim", "psnr", "lpips", "hvs"):
        vals = [x for x in per_view[k] if x is not None]
        agg[k] = float(np.mean(vals)) if vals else None
    return {"mean": agg, "per_view": per_view}


def quality_eval(render_fn, views, out_dir: str, name: str,
                 hvs_pooling: float | None = 1.0) -> dict:
    res = eval_views(render_fn, views, hvs_pooling)
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, f"{name}_quality.json"), "w") as f:
        json.dump(res["mean"], f, indent=2)
    with open(os.path.join(out_dir, f"{name}_per_view.json"), "w") as f:
        json.dump(res["per_view"], f, indent=2)
    return res["mean"]


def make_ps1_render(state, cfg: rast.RasterizeConfig, sh_degree: int = 3,
                    bg_color=None):
    """Plain full-quality renderer for a trainer state (quality_eval.py uses
    cuda_type=pcheck_obb)."""
    import jax

    @jax.jit
    def render(camera):
        p = state.params
        return rast.rasterize(p.xyz, p.get_scaling(), p.get_rotation(),
                              p.get_opacity(), camera, shs=p.get_features(),
                              sh_degree=sh_degree, bg_color=bg_color,
                              config=cfg, live_mask=state.live)["render"]

    return render
