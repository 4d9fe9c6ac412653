"""MM-FR baseline generation: one pruned model per foveation level.

Counterpart of LightGaussian/get_multimodel.py + scripts/run_prune_finetune.sh:
read the ours-model per-layer point counts (pnum), then for each coarser
level prune the PS1 model down to that level's count with LightGaussian's
v-importance score and fine-tune photometrically. The resulting model list
feeds eval/mmfr.render_mmfr (4 rasterizer passes per frame — the baseline's
cost profile).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from fovsplat.models import state as S
from fovsplat.train import loops, scratch


def generate_mm_models(ps1: S.TrainerState, train_views,
                       layer_counts: list[int], cfg: loops.LoopConfig,
                       finetune_iters: int = 1000, log=print,
                       v_pow: float = 0.1) -> list[S.TrainerState]:
    """Returns one TrainerState per level; level 0 is PS1 itself."""
    models = [ps1]
    total = int(ps1.live_count())
    for i, count in enumerate(layer_counts[1:], start=1):
        ratio = 1.0 - count / total
        st = scratch.lightgaussian_prune(ps1, train_views, cfg,
                                         percent=max(ratio, 0.0),
                                         prune_type="v_important_score",
                                         v_pow=v_pow)
        log(f"[mmfr] level {i}: pruned to {int(st.live_count())} "
            f"(target {count})")
        st = loops.finetune(st, train_views, finetune_iters, cfg, log=log)
        models.append(st)
    return models


def mm_render_models(models: list[S.TrainerState], camera, sh_degree=3):
    """Convert trainer states to the dict format eval/mmfr.render_mmfr
    expects (activated params + per-view colors)."""
    from fovsplat.ops import sh as sh_mod
    out = []
    for st in models:
        p = st.params
        colors = sh_mod.sh_to_rgb(sh_degree, p.get_features(), p.xyz,
                                  camera.cam_center)
        out.append({
            "xyz": p.xyz, "scaling": p.get_scaling(),
            "rotation": p.get_rotation(),
            "opacity": p.get_opacity() * st.live,
            "colors": colors,
        })
    return out
