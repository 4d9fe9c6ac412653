"""MM-FR baseline: LightGaussian multi-model foveated rendering.

Counterpart of gaussian_renderer_fov_mmfr/__init__.py:75-162 + the
_mmfr_pcheck_obb rasterizer (N8): four independently-pruned models, one
rasterizer pass per level rendering only the tiles whose level == cur_level,
images summed. Reproduced here by masking each pass's tiles via the
foveation level map and a per-pass tile mask — same 4-passes-per-frame cost
profile as the reference baseline (the point of the comparison).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from fovsplat.ops import foveation, rasterize as rast
from fovsplat.ops.blend import tiles_to_image
from fovsplat.ops.projection import TILE


def render_mmfr(models, camera, gaze, alpha,
                config: rast.RasterizeConfig,
                fov_cfg: foveation.FoveationConfig = foveation.FoveationConfig(),
                bg_color=None):
    """models: list of L dicts with keys xyz/scaling/rotation/opacity/
    colors (activated, per-model point counts may differ); one rasterize
    pass per level, restricted to that level's tiles."""
    levels = foveation.compute_tile_levels(gaze, camera.width, camera.height,
                                           alpha, fov_cfg)
    level_i = levels.astype(jnp.int32)
    num_tiles = levels.shape[0]

    total = None
    for li, m in enumerate(models):
        def tile_mask(orig, tile, li=li):
            t = jnp.minimum(tile, num_tiles - 1)
            return level_i[t] == li

        out = rast.rasterize(m["xyz"], m["scaling"], m["rotation"],
                             m["opacity"], camera, colors=m["colors"],
                             config=config, tile_mask_fn=tile_mask)
        img = out["render"]
        # Zero out tiles not owned by this level (renderCUDA_mmfr writes 0
        # there); also composite bg only on owned tiles.
        own = (level_i == li).astype(jnp.float32)
        gx = (camera.width + TILE - 1) // TILE
        gy = (camera.height + TILE - 1) // TILE
        own_img = tiles_to_image(
            jnp.broadcast_to(own[:, None], (num_tiles, TILE * TILE)),
            gx, gy, camera.width, camera.height)
        contrib = img * own_img[..., None]
        if bg_color is not None:
            contrib = contrib + (own_img * out["final_T"])[..., None] * \
                jnp.asarray(bg_color)
        total = contrib if total is None else total + contrib
    return total
