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

    use_fused = (config.backend == "pallas" and config.pallas_fused_expand
                 and config.use_obb)
    total = None
    for li, m in enumerate(models):
        if use_fused:
            # Fused route: bin the whole model once, then render only the
            # owned tiles by EMPTYING other tiles' segments — exactly the
            # reference's per-pass tile_skips (N8 renderCUDA_mmfr writes 0
            # on non-owned tiles), with no per-pair tile-mask path.
            out = _render_level_fused(m, camera, level_i, li, config)
        else:
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

def render_mmfr_level(m, camera, gaze, alpha, li, config,
                      fov_cfg=None, bg_color=None, return_diag=False):
    """ONE MM-FR level pass as a standalone jittable unit: the 4-pass
    frame compiles as four small programs instead of one (the unrolled
    4-model graph can exceed the remote compile service's memory).

    return_diag=True additionally returns {"overflow", "num_pairs",
    "candidates"} — the sizing signals for per-level capacity buckets
    (the L0 pass owns only the small gaze-centered box and keeps FEW
    pairs; sizing every level at the shared capacity made the L0 pass
    sort at ~10x its need, the round-3 ledger's #1 MM-FR lever)."""
    fov_cfg = fov_cfg or foveation.FoveationConfig()
    levels = foveation.compute_tile_levels(gaze, camera.width,
                                           camera.height, alpha, fov_cfg)
    level_i = levels.astype(jnp.int32)
    num_tiles = levels.shape[0]
    out = _render_level_fused(m, camera, level_i, li, config)
    own = (level_i == li).astype(jnp.float32)
    gx = (camera.width + TILE - 1) // TILE
    gy = (camera.height + TILE - 1) // TILE
    own_img = tiles_to_image(
        jnp.broadcast_to(own[:, None], (num_tiles, TILE * TILE)),
        gx, gy, camera.width, camera.height)
    contrib = out["render"] * own_img[..., None]
    if bg_color is not None:
        contrib = contrib + (own_img * out["final_T"])[..., None] *             jnp.asarray(bg_color)
    if return_diag:
        return contrib, {"overflow": out["overflow"],
                         "num_pairs": out["num_pairs"],
                         "candidates": out["candidates"]}
    return contrib


def _render_level_fused(m, camera, level_i, li, config):
    """One MM-FR level pass on the fused pipeline: column preprocess +
    fused binning of the whole model, blend restricted to owned tiles by
    segment masking."""
    from fovsplat.ops import binning, projection
    from fovsplat.ops.pallas import blend_fwd as pk
    gx = (camera.width + TILE - 1) // TILE
    gy = (camera.height + TILE - 1) // TILE
    cap = config.padded_capacity()
    pc = projection.preprocess_cols(m["xyz"], m["scaling"], m["rotation"],
                                    camera,
                                    scale_modifier=config.scale_modifier)
    # Clip every rect to the owned-tile region's bounding box BEFORE pair
    # expansion (output-invariant: pairs outside it land on tiles whose
    # segments the blend empties anyway). The level-0 pass owns only the
    # small gaze-centered box but carries the LARGEST model — without the
    # clip it binned its full cloud four times per frame. The reference's
    # MM-FR pays the full 4x binning (N8 culls only at render via
    # tile_skips); the 4-passes-per-frame structure is preserved.
    owned2d = (level_i == li).reshape(gy, gx)
    txs = jax.lax.broadcasted_iota(jnp.int32, (gy, gx), 1)
    tys = jax.lax.broadcasted_iota(jnp.int32, (gy, gx), 0)
    big = jnp.int32(1 << 20)
    bx0 = jnp.min(jnp.where(owned2d, txs, big))
    by0 = jnp.min(jnp.where(owned2d, tys, big))
    bx1 = jnp.max(jnp.where(owned2d, txs + 1, 0))
    by1 = jnp.max(jnp.where(owned2d, tys + 1, 0))
    rx0 = jnp.maximum(pc.rx0, bx0)
    ry0 = jnp.maximum(pc.ry0, by0)
    rx1 = jnp.minimum(pc.rx1, bx1)
    ry1 = jnp.minimum(pc.ry1, by1)
    tnum = jnp.maximum(rx1 - rx0, 0) * jnp.maximum(ry1 - ry0, 0)
    # Dead-opacity cull (output-invariant: the blend rejects a < 1/255
    # anyway): per-level MM models arrive as the full cloud with
    # non-members' opacity zeroed, but the reference's MM models are
    # independently-pruned SMALL models (prune_finetune.py) — without
    # this cull every level pass binned the full cloud, overstating the
    # baseline's candidate load ~4x.
    valid = pc.valid & (tnum > 0) & (m["opacity"] >= 1.0 / 255.0)
    t1cols = [rx0.astype(jnp.float32), ry0.astype(jnp.float32),
              jnp.maximum(rx1 - rx0, 1).astype(jnp.float32),
              jnp.where(valid, tnum, 0).astype(jnp.float32),
              pc.mx, pc.my, pc.v1x, pc.v1y, pc.v2x, pc.v2y,
              pc.len1, pc.len2, pc.ca, pc.cb, pc.cc,
              m["opacity"], m["colors"][:, 0], m["colors"][:, 1],
              m["colors"][:, 2]]
    (packed, seg_start, num_pairs, overflow, _cap3,
     candidates) = binning.bin_fused_ps1(
        t1cols, valid, pc.depth, gx, gy, cap, config.pallas_interpret,
        config.dummy_slack, config.compact_capacity, config.expand_chunk,
        config.expand_batch, sort_exact=config.sort_exact_depth)
    owned = level_i == li
    ss = seg_start[:-1]
    se = jnp.where(owned, seg_start[1:], ss)   # empty non-owned segments
    tile_color, final_T, _ = pk.blend_pallas_fwd_only(
        packed, ss, se, gx, gy, config.pallas_chunk, config.power_cutoff,
        config.pallas_interpret, batch=config.pallas_blend_batch)
    image = tiles_to_image(tile_color, gx, gy, camera.width, camera.height)
    T_img = tiles_to_image(final_T, gx, gy, camera.width, camera.height)
    return {"render": image, "final_T": T_img, "overflow": overflow,
            "num_pairs": num_pairs, "candidates": candidates}
