"""Forward-only rasterizer variants with per-Gaussian statistics.

TPU-native equivalents of the reference's counting rasterizers:
  mode="sum"  ~ diff-gaussian-rasterization_pcheck_obb_sum extra outputs
               (forward.cu:381,400): gs_count += 1 per binned (tile,Gaussian)
               pair, contribs += alpha*T per contributing pixel.
  mode="max"  ~ ..._pcheck_obb_max: contribs = max alpha*T per Gaussian
               (atomicMaxFloat, auxiliary.h:41-51).
  mode="loss_weighted_max_count" ~ ..._pcheck_obb_loss_weighted_max_count:
               each pixel routes its loss_map value to the single Gaussian
               with the highest alpha*T at that pixel (forward.cu:403-435);
               gs_count counts contributing pixels per Gaussian.
  mode="count_opacity" ~ LightGaussian's compress-diff-gaussian-rasterization
               renderCUDA_count (N9, forward.cu:380-475): gs_count += 1 and
               important_score += opacity per contributing pixel.

All accumulations are segment reductions over the sorted pair list —
deterministic, unlike the CUDA atomics (SURVEY.md §5.2). Tie-break for the
per-pixel argmax is lowest Gaussian id (the CUDA original's is a race).
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp

from fovsplat.ops import binning, projection, sh
from fovsplat.ops.blend import (PIX, T_EPS, _pair_pixel_geometry,
                                _seg_cumsum_excl, _segment_firsts,
                                tiles_to_image)
from fovsplat.ops.rasterize import RasterizeConfig, _grid

MODES = ("sum", "max", "loss_weighted_max_count", "count_opacity")


REF_FETCH_ROUND = 256   # the reference's BLOCK_SIZE fetch-batch width


def tile_fetch_counts(first_trig, seg_start, inside, num_tiles: int):
    """Per-tile fetched-pair count, matching the reference's collective
    fetch loop EXACTLY (..._pcheck_obb_sum/cuda_rasterizer/forward.cu:
    348-361): pairs are fetched in rounds of 256; the loop breaks at the
    first round START where every pixel is done (done = saturated, or
    outside the image from the start); gs_count counts +1 per FETCHED
    pair. first_trig: (T, PIX) local pair index of each pixel's
    saturation trigger (BIG if never); inside: (T, PIX) bool."""
    seg_len = seg_start[1:] - seg_start[:-1]                    # (T,)
    ft = jnp.where(inside, first_trig, -1.0)
    never = jnp.any(inside & (first_trig >= jnp.float32(1 << 30)), axis=1)
    max_j = jnp.max(ft, axis=1)                                 # (T,)
    rounds = jnp.floor(max_j / REF_FETCH_ROUND) + 1.0
    f = jnp.where(never | (max_j < 0.0), seg_len.astype(jnp.float32),
                  jnp.minimum(seg_len.astype(jnp.float32),
                              rounds * REF_FETCH_ROUND))
    # max_j < 0 means no inside pixel triggered... but if NO pixel is
    # inside at all (fully-padded tile), the reference fetches nothing.
    any_inside = jnp.any(inside, axis=1)
    f = jnp.where(any_inside, f, 0.0)
    return f.astype(jnp.int32)                                  # (T,)


def blend_stats(pair_tile, pair_gauss, pair_mean2d, pair_conic, pair_opacity,
                pair_color, seg_start, num_pairs, n_gaussians: int,
                grid_x: int, grid_y: int, chunk: int, power_cutoff: float,
                mode: str, loss_map_tiles=None, inside=None):
    """Forward blend + per-Gaussian stats over the sorted pair list.

    Returns (tile_color [T,PIX,3], final_T [T,PIX], gs_count (N,) i32,
    contribs (N,) f32). mode="sum" counts +1 per FETCHED pair (bounded by
    each tile's 256-round early-exit point, tile_fetch_counts) — exact
    reference semantics, forward.cu:357-361."""
    assert mode in MODES, mode
    num_tiles = grid_x * grid_y
    argmax_mode = mode == "loss_weighted_max_count"
    BIG = jnp.float32(1 << 30)

    fetch_mode = mode in ("sum", "loss_weighted_max_count")
    # Reference initializes done = !inside (forward.cu:326): padding
    # pixels on edge tiles never blend or count in ANY statistic.
    ins = (jnp.ones((num_tiles, PIX), bool) if inside is None else inside)

    def body(state):
        (k, color, logT, frozen, gs_count, contribs, best_w, best_g,
         first_trig) = state
        base = k * chunk
        kt = jax.lax.dynamic_slice_in_dim(pair_tile, base, chunk)
        gid = jax.lax.dynamic_slice_in_dim(pair_gauss, base, chunk)
        m2d = jax.lax.dynamic_slice_in_dim(pair_mean2d, base, chunk)
        con = jax.lax.dynamic_slice_in_dim(pair_conic, base, chunk)
        op = jax.lax.dynamic_slice_in_dim(pair_opacity, base, chunk)
        col = jax.lax.dynamic_slice_in_dim(pair_color, base, chunk)

        alpha, static_ok, _, dx, dy = _pair_pixel_geometry(
            kt, m2d, con, op, grid_x, power_cutoff)
        kt_safe = jnp.minimum(kt, num_tiles - 1)
        pair_valid = kt < num_tiles
        row_frozen = frozen[kt_safe]
        a_eff = jnp.where(static_ok & pair_valid[:, None] & ~row_frozen,
                          alpha, 0.0)

        first, _ = _segment_firsts(kt)
        logs = jnp.log1p(-a_eff)
        excl_log = _seg_cumsum_excl(logs, first)
        T_row = jnp.exp(logT[kt_safe] + excl_log)
        incl = T_row * (1.0 - a_eff)
        trigger = (a_eff > 0) & (incl < T_EPS)
        done_before = _seg_cumsum_excl(trigger.astype(jnp.int32), first) > 0
        contribute = (a_eff > 0) & ~trigger & ~done_before
        weight = jnp.where(contribute, a_eff * T_row, 0.0)

        color = color.at[kt].add(weight[:, :, None] * col[:, None, :],
                                 mode='drop')
        logT = logT.at[kt].add(jnp.where(contribute, logs, 0.0), mode='drop')
        frozen = frozen.at[kt].max(trigger, mode='drop')

        gid_safe = jnp.where(pair_valid, gid, n_gaussians)
        touched = jnp.sum(contribute.astype(jnp.int32), axis=1)
        if fetch_mode:
            # gs_count counted at FETCH time (forward.cu:357-361): track
            # each pixel's saturation-trigger local pair index; the count
            # itself happens after the loop via tile_fetch_counts.
            rank = ((base + jnp.arange(chunk, dtype=jnp.int32))
                    - seg_start[kt_safe]).astype(jnp.float32)
            ft = jnp.where(trigger, rank[:, None], BIG)
            first_trig = first_trig.at[kt].min(ft, mode='drop')
        if mode == "sum":
            contribs = contribs.at[gid_safe].add(jnp.sum(weight, axis=1),
                                                 mode='drop')
        elif mode == "max":
            # _pcheck_obb_max counts per (pair, pixel) passing the power
            # window while the pixel is not yet done — pre alpha-min,
            # trigger pair included (N4 forward.cu:381).
            power = (-0.5 * (con[:, 0:1] * dx * dx + con[:, 2:3] * dy * dy)
                     - con[:, 1:2] * dx * dy)
            geo_win = ((power <= 0.0) & (power >= power_cutoff)
                       & pair_valid[:, None] & ~row_frozen & ~done_before)
            gs_count = gs_count.at[gid_safe].add(
                jnp.sum(geo_win.astype(jnp.int32), axis=1), mode='drop')
            contribs = contribs.at[gid_safe].max(jnp.max(weight, axis=1),
                                                 mode='drop')
        elif mode == "count_opacity":
            gs_count = gs_count.at[gid_safe].add(touched, mode='drop')
            contribs = contribs.at[gid_safe].add(
                op * touched.astype(jnp.float32), mode='drop')
        else:  # loss_weighted_max_count
            # Per-(tile,pixel) argmax of weight across the whole pair list.
            # Within the chunk: scatter-max per tile row, then deterministic
            # min-id among achievers; merge with the running carry.
            cm = jnp.zeros_like(best_w).at[kt].max(weight, mode='drop')
            achieved = (weight >= cm[kt_safe]) & (weight > 0)
            cg = jnp.full_like(best_g, n_gaussians).at[kt].min(
                jnp.where(achieved, gid_safe[:, None], n_gaussians),
                mode='drop')
            better = cm > best_w
            best_g = jnp.where(better, cg, best_g)
            best_w = jnp.maximum(best_w, cm)
        return (k + 1, color, logT, frozen, gs_count, contribs, best_w,
                best_g, first_trig)

    def cond(state):
        return state[0] * chunk < num_pairs

    shape_pix = (num_tiles, PIX)
    init = (jnp.int32(0),
            jnp.zeros(shape_pix + (3,), jnp.float32),
            jnp.zeros(shape_pix, jnp.float32),
            ~ins,
            jnp.zeros(n_gaussians, jnp.int32),
            jnp.zeros(n_gaussians, jnp.float32),
            jnp.zeros(shape_pix, jnp.float32) if argmax_mode
            else jnp.zeros((1, 1), jnp.float32),
            jnp.full(shape_pix, n_gaussians, jnp.int32) if argmax_mode
            else jnp.zeros((1, 1), jnp.int32),
            jnp.full(shape_pix, BIG) if fetch_mode
            else jnp.zeros((1, 1), jnp.float32))
    (_, color, logT, _, gs_count, contribs, best_w, best_g,
     first_trig) = jax.lax.while_loop(cond, body, init)

    if fetch_mode:
        f = tile_fetch_counts(first_trig, seg_start, ins, num_tiles)  # (T,)
        cap_ = pair_tile.shape[0]
        lanes = jnp.arange(cap_, dtype=jnp.int32)
        kt_all = jnp.minimum(pair_tile, num_tiles - 1)
        fetched = ((pair_tile < num_tiles) & (lanes < num_pairs)
                   & ((lanes - seg_start[kt_all]) < f[kt_all]))
        gid_all = jnp.where(fetched, pair_gauss, n_gaussians)
        gs_count = jax.ops.segment_sum(
            fetched.astype(jnp.int32), jnp.minimum(gid_all, n_gaussians),
            num_segments=n_gaussians + 1)[:n_gaussians]

    if argmax_mode:
        lm = (jnp.ones(shape_pix, jnp.float32) if loss_map_tiles is None
              else loss_map_tiles)
        contribs = contribs.at[best_g.reshape(-1)].add(lm.reshape(-1),
                                                       mode='drop')
    return color, jnp.exp(logT), gs_count, contribs


def tile_inside_mask(grid_x: int, grid_y: int, width: int, height: int):
    """(T, PIX) bool: pixel inside the image (edge tiles carry padding
    pixels, which the reference initializes as done = !inside)."""
    t = jnp.arange(grid_x * grid_y, dtype=jnp.int32)
    lx = jnp.arange(PIX, dtype=jnp.int32) % projection.TILE
    ly = jnp.arange(PIX, dtype=jnp.int32) // projection.TILE
    px = (t % grid_x)[:, None] * projection.TILE + lx[None, :]
    py = (t // grid_x)[:, None] * projection.TILE + ly[None, :]
    return (px < width) & (py < height)


def image_to_tiles(img: jnp.ndarray, grid_x: int, grid_y: int) -> jnp.ndarray:
    """(H, W) -> [num_tiles, PIX] tile-major, zero-padded to full tiles."""
    h, w = img.shape[:2]
    ph = grid_y * projection.TILE - h
    pw = grid_x * projection.TILE - w
    img = jnp.pad(img, ((0, ph), (0, pw)))
    t = projection.TILE
    img = img.reshape(grid_y, t, grid_x, t).transpose(0, 2, 1, 3)
    return img.reshape(grid_y * grid_x, PIX)


def rasterize_stats(means3d, scales, rotations, opacities, camera,
                    colors=None, shs=None, sh_degree: int = 3, mode="sum",
                    loss_map=None, bg_color=None,
                    config: RasterizeConfig = RasterizeConfig(),
                    live_mask=None):
    """Render + per-Gaussian stats (the counting-variant public API:
    color, radii, gaussians_count, contributions —
    ..._pcheck_obb_sum/__init__.py:92-104)."""
    gx, gy = _grid(camera)
    cap = config.padded_capacity()
    n = means3d.shape[0]

    use_pallas = (config.backend == "pallas" and config.pallas_fused_expand
                  and config.use_obb)
    if use_pallas:
        prep = projection.preprocess_cols(
            means3d, scales, rotations, camera,
            scale_modifier=config.scale_modifier, live_mask=live_mask)
    else:
        prep = projection.preprocess(means3d, scales, rotations, camera,
                                     scale_modifier=config.scale_modifier,
                                     live_mask=live_mask)
    if colors is None:
        colors = sh.sh_to_rgb(sh_degree, shs, means3d, camera.cam_center)
    colors = jnp.asarray(colors)
    opacities = jnp.asarray(opacities)

    lm_tiles = None
    if loss_map is not None:
        lm_tiles = image_to_tiles(loss_map, gx, gy)

    if use_pallas:
        # Fused path: train-mode binning (exact rows + gid payload) + the
        # Pallas stats kernel (per-pair statistic rows, no atomics), then
        # segment reductions by gid.
        from fovsplat.ops.pallas import blend_stats as pbs
        t1cols = [prep.rx0.astype(jnp.float32), prep.ry0.astype(jnp.float32),
                  jnp.maximum(prep.rx1 - prep.rx0, 1).astype(jnp.float32),
                  prep.tnum.astype(jnp.float32),
                  prep.mx, prep.my,
                  prep.v1x, prep.v1y, prep.v2x, prep.v2y,
                  prep.len1, prep.len2,
                  prep.ca, prep.cb, prep.cc,
                  opacities, colors[:, 0], colors[:, 1], colors[:, 2]]
        (packed, seg_start, num_pairs, overflow, cap3,
         _cand) = binning.bin_fused_ps1(
            t1cols, prep.valid, prep.depth, gx, gy, cap,
            config.pallas_interpret, config.dummy_slack,
            config.compact_capacity, config.expand_chunk,
            config.expand_batch, train=True)
        tile_color, final_T, pair_stats, arg = pbs.blend_stats_pallas(
            packed, seg_start[:-1], seg_start[1:], gx, gy,
            config.pallas_chunk, config.power_cutoff,
            config.pallas_interpret, batch=config.pallas_blend_batch,
            width=camera.width, height=camera.height)
        lane = jnp.arange(cap3, dtype=jnp.int32)
        in_use = lane < num_pairs
        gid_pair = jnp.where(in_use, packed[9].astype(jnp.int32), n)
        segsum = lambda v: jax.ops.segment_sum(
            jnp.where(in_use, v, 0.0), gid_pair, num_segments=n + 1)[:n]

        def fetched_counts():
            # Exact FETCH-time gs_count (forward.cu:357-361): per-pair
            # tile via boundary-scatter + cumsum (searchsorted at millions
            # of queries is pathological on TPU), then count pairs below
            # each tile's 256-round early-exit point.
            num_tiles = gx * gy
            nf = tile_fetch_counts(
                arg[:, :, 2], seg_start,
                tile_inside_mask(gx, gy, camera.width, camera.height),
                num_tiles)
            marks = jnp.zeros(cap3, jnp.int32).at[
                seg_start[1:num_tiles]].add(1, mode='drop')
            t_all = jnp.minimum(jnp.cumsum(marks),
                                num_tiles - 1).astype(jnp.int32)
            fetched = in_use & ((lane - seg_start[t_all]) < nf[t_all])
            return jax.ops.segment_sum(
                fetched.astype(jnp.int32),
                jnp.where(fetched, gid_pair, n), num_segments=n + 1)[:n]

        if mode == "sum":
            gs_count = fetched_counts()
            contribs = segsum(pair_stats[0])
        elif mode == "max":
            # Per (pair, pixel) power-window count while not done
            # (N4 forward.cu:381).
            gs_count = segsum(pair_stats[3]).astype(jnp.int32)
            contribs = jnp.maximum(jax.ops.segment_max(
                jnp.where(in_use, pair_stats[2], 0.0), gid_pair,
                num_segments=n + 1)[:n], 0.0)   # segment_max identity=-inf
        elif mode == "count_opacity":
            gs_count = segsum(pair_stats[1]).astype(jnp.int32)
            contribs = segsum(packed[5] * pair_stats[1])
        else:  # loss_weighted_max_count
            gs_count = fetched_counts()
            lm = (jnp.ones((gx * gy, PIX), jnp.float32) if lm_tiles is None
                  else lm_tiles)
            best_lane = jnp.clip(arg[:, :, 0].astype(jnp.int32),
                                 0, cap3 - 1).reshape(-1)
            has_best = (arg[:, :, 1] > 0).reshape(-1)
            gid_best = jnp.where(has_best,
                                 jnp.take(gid_pair, best_lane), n)
            contribs = jax.ops.segment_sum(
                jnp.where(has_best, lm.reshape(-1), 0.0), gid_best,
                num_segments=n + 1)[:n]
        bn = binning.Binned(pair_gauss=None, pair_tile=None,
                            seg_start=seg_start, num_pairs=num_pairs,
                            overflow=overflow, depth_order=None)
    else:
        bn = binning.bin_gaussians(prep, gx, gy, cap,
                                   use_obb=config.use_obb)
        gid = jnp.minimum(bn.pair_gauss, n - 1)
        tile_color, final_T, gs_count, contribs = blend_stats(
            bn.pair_tile, bn.pair_gauss, prep.mean2d[gid], prep.conic[gid],
            opacities[gid], colors[gid], bn.seg_start, bn.num_pairs, n,
            gx, gy, config.chunk, config.power_cutoff, mode, lm_tiles,
            inside=tile_inside_mask(gx, gy, camera.width, camera.height))

    image = tiles_to_image(tile_color, gx, gy, camera.width, camera.height)
    T_img = tiles_to_image(final_T, gx, gy, camera.width, camera.height)
    if bg_color is not None:
        image = image + T_img[..., None] * jnp.asarray(bg_color, image.dtype)
    return {"render": image, "final_T": T_img, "gs_count": gs_count,
            "contribs": contribs,
            "radii": jnp.where(prep.valid, prep.radius, 0), "binned": bn}
