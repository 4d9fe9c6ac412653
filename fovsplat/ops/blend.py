"""Front-to-back alpha blending over the sorted pair list, with custom VJP.

TPU-native replacement for the reference renderCUDA forward
(..._pcheck_obb_sum/cuda_rasterizer/forward.cu:298-426) and backward
(backward.cu:400-557). Design:

  * The image is carried tile-major as [num_tiles, 256] so every update is a
    (dynamic-slice, segmented-cumsum, scatter-add) triple over one chunk of
    the tile-sorted pair list — no per-tile padding, O(num_pairs) work.
  * The sequential early-exit semantics (terminate pixel when
    T*(1-alpha) < 1e-4 *without* blending that Gaussian) are reproduced in
    closed form: within a chunk, exclusive transmittances come from a
    segmented cumsum of log(1-alpha); the first "trigger" freezes the pixel
    (see fovsplat.ops.dense.blend_prefix for the scalar-case derivation).
  * The backward is a custom VJP that walks the pair list back-to-front,
    recovering T by division (the reference's backward.cu:503 trick) from the
    saved per-pixel final_T and n_contrib — no per-pair residuals, fully
    deterministic gradients (the CUDA original's atomics are not).

All loops are `lax.while_loop`s over chunks, so work stops at num_pairs
instead of the static pair capacity.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp

from fovsplat.ops.projection import TILE

ALPHA_MIN = 1.0 / 255.0
ALPHA_MAX = 0.99
T_EPS = 1e-4
PIX = TILE * TILE  # pixels per tile


def _pair_pixel_geometry(kt, mean2d, conic, opacity, grid_x, power_cutoff):
    """Shared fwd/bwd per-pair alpha evaluation over the pair's 16x16 tile.

    Returns (alpha, static_ok, G, dx, dy) each (CH, PIX) except alpha inputs.
    """
    ch = kt.shape[0]
    lx = (jnp.arange(PIX, dtype=jnp.float32) % TILE)
    ly = jnp.floor(jnp.arange(PIX, dtype=jnp.float32) / TILE)
    tx = (kt % grid_x).astype(jnp.float32) * TILE
    ty = (kt // grid_x).astype(jnp.float32) * TILE
    px = tx[:, None] + lx[None, :]
    py = ty[:, None] + ly[None, :]
    dx = mean2d[:, 0:1] - px
    dy = mean2d[:, 1:2] - py
    a = conic[:, 0:1]
    b = conic[:, 1:2]
    c = conic[:, 2:3]
    power = -0.5 * (a * dx * dx + c * dy * dy) - b * dx * dy
    G = jnp.exp(jnp.minimum(power, 0.0))
    alpha = jnp.minimum(ALPHA_MAX, opacity[:, None] * G)
    static_ok = (power <= 0.0) & (power >= power_cutoff) & (alpha >= ALPHA_MIN)
    return alpha, static_ok, G, dx, dy


def _segment_firsts(kt):
    """First/last index of each pair's tile segment within the chunk
    (kt ascending)."""
    first = jnp.searchsorted(kt, kt, side='left').astype(jnp.int32)
    last = jnp.searchsorted(kt, kt, side='right').astype(jnp.int32) - 1
    return first, last


def _seg_cumsum_excl(x, first):
    """Exclusive segmented cumsum along axis 0. x: (CH, ...), first: (CH,)."""
    cs = jnp.cumsum(x, axis=0)
    before = cs - x                      # inclusive-cumsum up to j-1 (global)
    return before - before[first]


def _seg_cumsum_incl(x, first):
    cs = jnp.cumsum(x, axis=0)
    return cs - (cs - x)[first]


def _blend_forward_impl(pair_tile, pair_mean2d, pair_conic, pair_opacity,
                        pair_color, seg_start, num_pairs,
                        grid_x: int, grid_y: int, chunk: int,
                        power_cutoff: float):
    """Returns (tile_color [T,PIX,3], final_T [T,PIX], n_contrib [T,PIX] i32)."""
    num_tiles = grid_x * grid_y
    cap = pair_tile.shape[0]
    num_chunks = cap // chunk

    def body(state):
        k, color, logT, frozen, n_contrib = state
        base = k * chunk
        kt = jax.lax.dynamic_slice_in_dim(pair_tile, base, chunk)
        m2d = jax.lax.dynamic_slice_in_dim(pair_mean2d, base, chunk)
        con = jax.lax.dynamic_slice_in_dim(pair_conic, base, chunk)
        op = jax.lax.dynamic_slice_in_dim(pair_opacity, base, chunk)
        col = jax.lax.dynamic_slice_in_dim(pair_color, base, chunk)

        alpha, static_ok, _, _, _ = _pair_pixel_geometry(
            kt, m2d, con, op, grid_x, power_cutoff)
        kt_safe = jnp.minimum(kt, num_tiles - 1)
        row_frozen = frozen[kt_safe]                       # (CH, PIX)
        valid = (kt < num_tiles)[:, None]
        a_eff = jnp.where(static_ok & valid & ~row_frozen, alpha, 0.0)

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
        rank = (base + jnp.arange(chunk, dtype=jnp.int32)
                - seg_start[kt_safe]).astype(jnp.int32)
        n_contrib = n_contrib.at[kt].max(
            jnp.where(contribute, rank[:, None] + 1, 0), mode='drop')
        return k + 1, color, logT, frozen, n_contrib

    def cond(state):
        return state[0] * chunk < num_pairs

    init = (jnp.int32(0),
            jnp.zeros((num_tiles, PIX, 3), jnp.float32),
            jnp.zeros((num_tiles, PIX), jnp.float32),
            jnp.zeros((num_tiles, PIX), bool),
            jnp.zeros((num_tiles, PIX), jnp.int32))
    state = jax.lax.while_loop(cond, body, init)
    _, color, logT, _, n_contrib = state
    # Guard against spurious trips past capacity.
    del num_chunks
    return color, jnp.exp(logT), n_contrib


def _blend_backward_impl(pair_tile, pair_mean2d, pair_conic, pair_opacity,
                         pair_color, seg_start, num_pairs, final_T, n_contrib,
                         g_color, g_final_T,
                         grid_x: int, grid_y: int, chunk: int,
                         power_cutoff: float):
    """Back-to-front traversal producing per-pair gradients (CAP-sized)."""
    num_tiles = grid_x * grid_y
    cap = pair_tile.shape[0]
    last_chunk = jnp.maximum(
        (num_pairs + chunk - 1) // chunk, 1).astype(jnp.int32)

    def body(state):
        k, T_back, S, d_m2d, d_con, d_op, d_col = state
        k = k - 1
        base = k * chunk
        kt = jax.lax.dynamic_slice_in_dim(pair_tile, base, chunk)
        m2d = jax.lax.dynamic_slice_in_dim(pair_mean2d, base, chunk)
        con = jax.lax.dynamic_slice_in_dim(pair_conic, base, chunk)
        op = jax.lax.dynamic_slice_in_dim(pair_opacity, base, chunk)
        col = jax.lax.dynamic_slice_in_dim(pair_color, base, chunk)

        alpha, static_ok, G, dx, dy = _pair_pixel_geometry(
            kt, m2d, con, op, grid_x, power_cutoff)
        kt_safe = jnp.minimum(kt, num_tiles - 1)
        valid = (kt < num_tiles)[:, None]
        rank = (base + jnp.arange(chunk, dtype=jnp.int32)
                - seg_start[kt_safe]).astype(jnp.int32)
        contribute = static_ok & valid & (rank[:, None] < n_contrib[kt_safe])
        a_eff = jnp.where(contribute, alpha, 0.0)

        first, last = _segment_firsts(kt)
        logs = jnp.log1p(-a_eff)
        inc = _seg_cumsum_incl(logs, first)                # (CH, PIX)
        seg_total = inc[last]
        # T before pair j: T_after_chunk / prod_{k>=j, contrib} (1 - a_k).
        T_row_after = T_back[kt_safe]
        T_j = T_row_after * jnp.exp(-(seg_total - inc + logs))
        w = a_eff * T_j                                    # (CH, PIX)

        wc = w[:, :, None] * col[:, None, :]               # (CH, PIX, 3)
        Winc = _seg_cumsum_incl(wc, first)
        S_j = S[kt_safe] + (Winc[last] - Winc)             # suffix color sum

        g_pix = g_color[kt_safe]                           # (CH, PIX, 3)
        gT_pix = g_final_T[kt_safe]                        # (CH, PIX)
        Tf_pix = final_T[kt_safe]

        d_col_j = jnp.einsum('cp,cpk->ck', w, g_pix)
        inv_om = 1.0 / (1.0 - a_eff)
        dL_da = (jnp.einsum('cpk,ck->cp', g_pix, col) * T_j
                 - (jnp.einsum('cpk,cpk->cp', g_pix, S_j)
                    + gT_pix * Tf_pix) * inv_om)
        dL_da = jnp.where(contribute, dL_da, 0.0)
        # Reference semantics: the 0.99 cap is ignored in the gradient
        # (backward.cu recomputes alpha then sets dL_dG = opacity * dL_da).
        d_op_j = jnp.sum(G * dL_da, axis=1)
        d_power = alpha * dL_da                            # G*op*dL_da
        a_c = con[:, 0:1]
        b_c = con[:, 1:2]
        c_c = con[:, 2:3]
        d_dx = d_power * (-(a_c * dx + b_c * dy))
        d_dy = d_power * (-(c_c * dy + b_c * dx))
        d_m2d_j = jnp.stack([jnp.sum(d_dx, axis=1), jnp.sum(d_dy, axis=1)], -1)
        d_con_j = jnp.stack([
            jnp.sum(d_power * (-0.5 * dx * dx), axis=1),
            jnp.sum(d_power * (-dx * dy), axis=1),
            jnp.sum(d_power * (-0.5 * dy * dy), axis=1),
        ], -1)

        # Per-tile carry updates must fire once per segment, not once per
        # pair: mask everything except each segment's last pair.
        is_last = jnp.arange(chunk, dtype=jnp.int32) == last
        T_back = T_back.at[kt].multiply(
            jnp.where(is_last[:, None], jnp.exp(-seg_total), 1.0), mode='drop')
        S = S.at[kt].add(jnp.where(is_last[:, None, None], Winc[last], 0.0),
                         mode='drop')
        d_m2d = jax.lax.dynamic_update_slice_in_dim(d_m2d, d_m2d_j, base, 0)
        d_con = jax.lax.dynamic_update_slice_in_dim(d_con, d_con_j, base, 0)
        d_op = jax.lax.dynamic_update_slice_in_dim(d_op, d_op_j, base, 0)
        d_col = jax.lax.dynamic_update_slice_in_dim(d_col, d_col_j, base, 0)
        return k, T_back, S, d_m2d, d_con, d_op, d_col

    def cond(state):
        return state[0] > 0

    init = (last_chunk,
            final_T,
            jnp.zeros((num_tiles, PIX, 3), jnp.float32),
            jnp.zeros((cap, 2), jnp.float32),
            jnp.zeros((cap, 3), jnp.float32),
            jnp.zeros((cap,), jnp.float32),
            jnp.zeros((cap, 3), jnp.float32))
    state = jax.lax.while_loop(cond, body, init)
    _, _, _, d_m2d, d_con, d_op, d_col = state
    return d_m2d, d_con, d_op, d_col


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10))
def blend(pair_tile, pair_mean2d, pair_conic, pair_opacity, pair_color,
          seg_start, num_pairs, grid_x, grid_y, chunk, power_cutoff):
    """Differentiable tile blend. Returns (tile_color, final_T, n_contrib)."""
    return _blend_forward_impl(pair_tile, pair_mean2d, pair_conic,
                               pair_opacity, pair_color, seg_start, num_pairs,
                               grid_x, grid_y, chunk, power_cutoff)


def _blend_fwd(pair_tile, pair_mean2d, pair_conic, pair_opacity, pair_color,
               seg_start, num_pairs, grid_x, grid_y, chunk, power_cutoff):
    out = _blend_forward_impl(pair_tile, pair_mean2d, pair_conic,
                              pair_opacity, pair_color, seg_start, num_pairs,
                              grid_x, grid_y, chunk, power_cutoff)
    tile_color, final_T, n_contrib = out
    res = (pair_tile, pair_mean2d, pair_conic, pair_opacity, pair_color,
           seg_start, num_pairs, final_T, n_contrib)
    return out, res


def _blend_bwd(grid_x, grid_y, chunk, power_cutoff, res, g):
    (pair_tile, pair_mean2d, pair_conic, pair_opacity, pair_color,
     seg_start, num_pairs, final_T, n_contrib) = res
    g_color, g_final_T, _ = g
    d_m2d, d_con, d_op, d_col = _blend_backward_impl(
        pair_tile, pair_mean2d, pair_conic, pair_opacity, pair_color,
        seg_start, num_pairs, final_T, n_contrib, g_color, g_final_T,
        grid_x, grid_y, chunk, power_cutoff)
    return (None, d_m2d, d_con, d_op, d_col, None, None)


blend.defvjp(_blend_fwd, _blend_bwd)


def tiles_to_image(tile_img: jnp.ndarray, grid_x: int, grid_y: int,
                   width: int, height: int) -> jnp.ndarray:
    """[num_tiles, PIX, C] tile-major -> (H, W, C) image (cropped)."""
    c = tile_img.shape[-1] if tile_img.ndim == 3 else None
    if c is None:
        img = tile_img.reshape(grid_y, grid_x, TILE, TILE)
        img = img.transpose(0, 2, 1, 3).reshape(grid_y * TILE, grid_x * TILE)
        return img[:height, :width]
    img = tile_img.reshape(grid_y, grid_x, TILE, TILE, c)
    img = img.transpose(0, 2, 1, 3, 4).reshape(grid_y * TILE, grid_x * TILE, c)
    return img[:height, :width]
