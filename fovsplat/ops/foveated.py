"""Foveated rasterizer: per-tile quality levels + dual-level blending.

TPU-native replacement for diff-gaussian-rasterization_fov_pcheck_obb (N6,
SURVEY.md §2.1) and its Python renderer (gaussian_renderer_fov/__init__.py):

  * per-tile fractional levels from gaze eccentricity (fovsplat.ops.foveation)
  * level-cull fused into binning (filter kernel,
    ..._fov_pcheck_obb/rasterizer_impl.cu:264-383): a (Gaussian, tile) pair
    survives only if tile_level < highest_level + 1
  * per-level DC color / opacity arrays (compute_fov_colors,
    rasterizer_impl.cu:489-531): color_l = max(0, SH_C0*dc_l + rest_eval)
  * one fused blend pass with TWO transmittance chains per pixel; on
    "blending" tiles the two adjacent levels L1/L2 are accumulated
    simultaneously and merged with the smoothstep 3x^2-2x^3 of the estimated
    per-pixel level (renderCUDA_blending, forward.cu:262-487); on plain tiles
    the second chain is masked off (renderCUDA, forward.cu:490-604).

The SM-FR baseline (N7, shared color/opacity across levels) and the MM-FR
baseline (N8, one model per level summed over 4 passes) are thin wrappers at
the bottom — they reuse the same machinery.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any

import jax
import jax.numpy as jnp

from fovsplat.ops import binning, foveation, projection, sh
from fovsplat.ops.blend import (PIX, T_EPS, _pair_pixel_geometry,
                                _seg_cumsum_excl, _segment_firsts,
                                tiles_to_image, ALPHA_MAX, ALPHA_MIN)
from fovsplat.ops.foveation import FoveationConfig
from fovsplat.ops.projection import TILE
from fovsplat.ops.rasterize import RasterizeConfig, _grid



def _pack_i64(a, b):
    """Two f32 vectors -> one i64. Lossless; exists purely to halve
    lax.sort payload-operand count (sort cost is per operand, not per
    byte). Uses the trailing-dim widening bitcast — (N, 2) f32 -> (N,)
    i64 — instead of emulated 64-bit shift/or lanes (TPUs have no native
    i64; shift chains on 2.7M-lane vectors cost real milliseconds)."""
    return jax.lax.bitcast_convert_type(jnp.stack([a, b], axis=-1),
                                        jnp.int64)


def _unpack_i64(q):
    """Inverse of _pack_i64 -> (2, N) f32 (narrowing bitcast adds the
    trailing dim back; the transpose is a plain 8-byte-strided copy)."""
    return jax.lax.bitcast_convert_type(q, jnp.float32).T


def _clip_rects_to_levels(prep, levels, hl, gx, gy, L):
    """Clip per-Gaussian tile rects to the bbox of tiles their level reaches.

    A Gaussian with highest level h only contributes to tiles whose
    foveation level is < h+1 — a gaze-centered region. Intersecting each
    rect with that region's tile bounding box before pair expansion shrinks
    the candidate count (and hence the static pair capacity) several-fold.
    The exact per-pair level_mask cull still runs afterwards, so this is
    output-invariant.
    """
    lv2d = levels.reshape(gy, gx)
    txs = jax.lax.broadcasted_iota(jnp.int32, (gy, gx), 1)
    tys = jax.lax.broadcasted_iota(jnp.int32, (gy, gx), 0)

    def level_bbox(h):
        ok = lv2d < (h + 1.0)
        big = jnp.int32(1 << 20)
        x0 = jnp.min(jnp.where(ok, txs, big))
        y0 = jnp.min(jnp.where(ok, tys, big))
        x1 = jnp.max(jnp.where(ok, txs + 1, 0))
        y1 = jnp.max(jnp.where(ok, tys + 1, 0))
        return jnp.stack([x0, y0, x1, y1])

    bboxes = jnp.stack([level_bbox(float(h)) for h in range(L)])  # (L, 4)
    gb = bboxes[jnp.clip(hl.astype(jnp.int32), 0, L - 1)]         # (N, 4)
    new_min = jnp.maximum(prep.rect_min, gb[:, 0:2])
    new_max = jnp.minimum(prep.rect_max, gb[:, 2:4])
    new_tnum = jnp.maximum(new_max[:, 0] - new_min[:, 0], 0) * \
        jnp.maximum(new_max[:, 1] - new_min[:, 1], 0)
    return dataclasses.replace(
        prep, rect_min=new_min, rect_max=jnp.maximum(new_max, new_min),
        tiles_touched=jnp.where(prep.valid, new_tnum, 0),
        valid=prep.valid & (new_tnum > 0))


def compute_fov_colors(means3d, shs_rest, shs_dcs, cam_center,
                       sh_degree: int = 3) -> jnp.ndarray:
    """(N, L, 3) per-level clamped RGB: shared SH-rest term + per-level DC."""
    rest = sh.eval_sh_rest(sh_degree, shs_rest, means3d, cam_center)  # (N,3)
    return jnp.maximum(sh.SH_C0 * shs_dcs + rest[:, None, :], 0.0)


def _trunc_bf16(x):
    """bf16-representable truncation of f32 via explicit bit masking.

    NOT ``x.astype(bf16).astype(f32)``: XLA's algebraic simplifier runs
    with excess precision allowed and folds that convert pair to the
    IDENTITY on TPU (verified on a v5e — the fold made every XLA-side
    split below return (x, 0, 0), which the later bf16 table store then
    rounded, silently corrupting cum_excl by up to +-1024 at bench scale
    and mass-culling pairs). A bitcast+mask cannot be folded, and the
    truncated value is exactly bf16-representable, so the bf16 store is
    lossless."""
    return jax.lax.bitcast_convert_type(
        jax.lax.bitcast_convert_type(x, jnp.uint32)
        & jnp.uint32(0xFFFF0000), jnp.float32)


def _split3(x):
    """f32 column -> 3 bf16-EXACT f32 parts with hi+mid+lo == x exactly
    (8+8+8 >= f32's 24 mantissa bits; truncating splits keep each part
    and each residual exact). Stored as bf16 dtable rows, a 0/1 bf16
    one-hot matmul passes the value through losslessly at ONE MXU pass —
    small-M f32-HIGHEST matmuls run at <15% MXU utilization."""
    hi = _trunc_bf16(x)
    r = x - hi
    mid = _trunc_bf16(r)
    return hi, mid, r - mid


def _split2(x):
    """f32 column -> 2 bf16 parts; reconstruction has ~2^-16 relative
    error — used for OBB axes/extents whose compares have real margins."""
    hi = _trunc_bf16(x)
    return hi, x - hi


def build_fov_dtable(t1cols, t2cols, valid, depth, cap2, chunk):
    """Build the foveated expand kernel's bf16 split-row table.

    Layout (ops/pallas/expand_fov.DROWS = 64 rows, bf16, original
    Gaussian order; invalid rows carry one dummy pair with hl = -2):
      0 rx0 | 1 ry0 | 2 rw | 3-5 cum_excl | 6-8 mx | 9-11 my
      12-13 v1x | 14-15 v1y | 16-17 v2x | 18-19 v2y | 20-21 len1
      22-23 len2 | 24-26 ca | 27 hl | 28-30 depth | 31 pad
      32-35 op[0..3] | 36-39 r[0..3] | 40-43 g[0..3] | 44-47 b[0..3]
      48 cb | 49 cc | 50-63 pad
    Exact values (ints, coords, depth) ride as x3 splits ([[_split3]]);
    OBB axes/extents as x2; per-level colors/opacities single bf16 (they
    are bf16-packed for the sort anyway).

    Returns (dtable (DROWS, n_pad) bf16, cum_pad (n_pad+128,) f32,
    gstarts (cap2/chunk,) i32, total () i32, total_f () f32)."""
    from fovsplat.ops.pallas import expand_fov as pex

    # cum_excl rides as a bf16 x3 split (24-bit exact) and pair indices as
    # f32 iotas — both require the pair capacity to stay below 2^24.
    assert cap2 < (1 << 24), (
        f"pair capacity {cap2} >= 2^24: split-row cum_excl and f32 pair "
        "indices would lose integer exactness; shard the cloud instead")
    n = depth.shape[0]
    t1 = list(t1cols)
    tnum = jnp.where(valid, t1[3], 1.0)
    cum_incl = jnp.cumsum(tnum)
    total_f = cum_incl[-1]
    cum_excl = cum_incl - tnum
    # EVERY value column is valid-masked, not just the rect fields:
    # invalid rows' projective values can be inf/NaN (p_w blows up near
    # hw = 0 — a Gaussian CROSSING the camera plane mid-training hits
    # this), inf splits write NaN residual rows, and the TPU MXU
    # propagates a NaN operand through ZERO one-hot columns into every
    # pair of the chunk (verified on-chip; this seeded the r3 pipeline
    # run's two non-finite-gradient events).
    def vm(x, safe=0.0):
        return jnp.where(valid, x, safe)

    cols = [vm(t1[0]),                                # rx0
            vm(t1[1]),                                # ry0
            vm(t1[2], 1.0),                           # rw
            *_split3(cum_excl),
            *_split3(vm(t1[4])), *_split3(vm(t1[5])),  # mx, my
            *_split2(vm(t1[6])), *_split2(vm(t1[7])),  # v1x, v1y
            *_split2(vm(t1[8])), *_split2(vm(t1[9])),  # v2x, v2y
            *_split2(vm(t1[10])), *_split2(vm(t1[11])),  # len1, len2
            *_split3(vm(t1[12], 1.0)),                # ca
            jnp.where(valid, t1[15], -2.0),           # hl: dummy culled
            *_split3(vm(depth, 1.0)),
            jnp.zeros(n, jnp.float32)] \
        + [vm(c) for c in t2cols] + [vm(t1[13]), vm(t1[14], 1.0)]  # cb, cc
    total = jnp.minimum(total_f, cap2).astype(jnp.int32)

    wsize = chunk + pex.WPAD
    n_pad = max(((n + 127) // 128) * 128, wsize + 1)
    dtable = jnp.stack(cols, axis=0).astype(jnp.bfloat16)
    dtable = jnp.pad(dtable, ((0, pex.DROWS - len(cols)), (0, n_pad - n)))

    # The kernel builds its expansion one-hot from cum_excl intervals; the
    # sentinel row n closes the last Gaussian's interval at `total` and the
    # padding rows past it can never match.
    cum_pad = jnp.full((n_pad + 128,), jnp.float32(1 << 30))
    cum_pad = cum_pad.at[:n].set(cum_excl.astype(jnp.float32))
    cum_pad = cum_pad.at[n].set(total_f)
    # Per-chunk first owner: ~CAP/chunk queries only (searchsorted is fine
    # at this size; it is per-PAIR searchsorted that is slow on TPU).
    chunk_firsts = jnp.arange(0, cap2, chunk, dtype=jnp.float32)
    gstarts = jnp.clip(
        jnp.searchsorted(cum_excl, chunk_firsts, side='right').astype(
            jnp.int32) - 1, 0, n - 1)
    return dtable, cum_pad, gstarts, total, total_f


def _bin_fov_fused(t1cols, t2cols, valid, depth, gaze, alpha, gx, gy,
                   cap, camera, fov_cfg, interpret, dummy_slack=None,
                   compact_capacity=None, chunk=256, kbatch=16,
                   prebuilt=None, n_rows=None, sort_exact=False,
                   fov_layout=None, drop_invalid=False, return_keys=False):
    """Fused-Pallas foveated binning: expansion + OBB + level cull + per-pair
    level selection in one kernel (ops/pallas/expand_fov), then ONE stable
    tile sort whose payloads are the finished kernel SoA rows.

    t1cols: 16 (N,) f32 columns [rx0, ry0, rw, tnum, mx, my, v1x, v1y, v2x,
    v2y, len1, len2, ca, cb, cc, hl]; t2cols: 4L (N,) columns
    [op_0..op_L-1, r_*, g_*, b_*].

    Returns (packed (8, CAP2) f32 sorted SoA [mx, my, ca, P_cbcc, P_op,
    P_a, P_b, P_c], seg_start (T+1,), num_pairs, overflow, CAP2) — CAP2 is
    cap rounded up to the kernel chunking."""
    from fovsplat.ops.pallas import expand_fov as pex

    n = depth.shape[0] if depth is not None else n_rows
    num_tiles = gx * gy
    L = fov_cfg.fov_num
    # NO depth presort. A 33-operand payload sort wedges the XLA TPU
    # compiler (>20 min compile); argsort + row gathers cost ~72 ms at
    # 1.16M rows. Instead: every INVALID row contributes exactly one dummy
    # pair (tnum=1, hl=-2 so the kernel's level cull drops it), which keeps
    # the pair->row map advancing >=1 row per pair — the expand kernel's
    # bounded-window property holds in ORIGINAL order. Depth rides the
    # kernel output and the tile sort orders (tile, depth) with num_keys=2.
    # Capacity grows by one slot per row to hold the dummies.
    cap_d = cap + (n if dummy_slack is None else dummy_slack)
    cap2 = ((cap_d + chunk * kbatch - 1) // (chunk * kbatch)) * (chunk * kbatch)
    # The kernel compacts culled+dummy pairs away before HBM: the sort only
    # sees kept pairs, bounded by compact_capacity (default: no shrink).
    cap_out = cap2 if compact_capacity is None else compact_capacity

    if prebuilt is None:
        dtable, cum_pad, gstarts, total, total_f = build_fov_dtable(
            t1cols, t2cols, valid, depth, cap2, chunk)
        cum_pad = cum_pad[None, :]
    else:
        # Table built by the fused per-Gaussian kernel
        # (ops/pallas/build_table): derive the window-start prefetch
        # scalars + sentinel tail here (same semantics as
        # build_fov_dtable; cum[lane >= n] == total closes the last
        # interval, the 2^30 tail covers the +128 window overread).
        dtable, cum, total_f = prebuilt
        assert cap2 < (1 << 24), (
            f"pair capacity {cap2} >= 2^24: split-row cum_excl and f32 "
            "pair indices would lose integer exactness")
        cum_pad = jnp.concatenate(
            [cum, jnp.full((1, 128), jnp.float32(1 << 30))], axis=1)
        total = jnp.minimum(total_f, cap2).astype(jnp.int32)
        chunk_firsts = jnp.arange(0, cap2, chunk, dtype=jnp.float32)
        gstarts = jnp.clip(
            jnp.searchsorted(cum[0, :n], chunk_firsts,
                             side='right').astype(jnp.int32) - 1, 0, n - 1)
    overflow = jnp.maximum(total_f.astype(jnp.int32) - cap2, 0)

    gaze_dir = jnp.stack(foveation._ncd2dir(
        gaze[0], gaze[1], fov_cfg.real_image_width,
        camera.height / camera.width * fov_cfg.real_image_width,
        fov_cfg.real_viewing_distance))

    key, dbits, attrs, kept, missed = pex.expand_fov_pallas(
        dtable, cum_pad, gstarts, total, gaze_dir,
        jnp.float32(alpha), cap=cap2, cap_out=cap_out,
        chunk=chunk, batch=kbatch, grid_x=gx, grid_y=gy,
        width=camera.width, height=camera.height,
        real_w=fov_cfg.real_image_width,
        real_h=camera.height / camera.width * fov_cfg.real_image_width,
        dist=fov_cfg.real_viewing_distance, fov_num=fov_layout or L,
        fov_num_cull=L, guard_marker=drop_invalid,
        sqrt_max_ps=fov_cfg.sqrt_max_ps, interpret=interpret)
    cap3 = key.shape[0]
    # Compacted-output overflow: kept pairs beyond the kernel's usable
    # write region were dropped (reported, never silently reordered);
    # window-missed pairs (drop_invalid tables) likewise count as
    # overflow — dropped and reported, never corrupted.
    overflow = overflow + jnp.maximum(
        kept - (cap3 - (chunk + 128)), 0) + missed

    # ONE sort over the COMPACTED pairs: i32 fused (tile | depth-hi) key
    # (+ the exact-depth secondary key when configured — see
    # expand_fov.fused_key32 for the precision/cost trade) with the 6
    # packed payload rows riding as plain f32 operands (measured ~7%
    # cheaper than the same bytes bit-packed into i64, and no x64 scope
    # or pack/unpack passes). Two zero rows pad the blend SoA to 8 for
    # DMA sublane alignment.
    keys = (key, dbits) if sort_exact else (key,)
    res = jax.lax.sort((*keys, *attrs), num_keys=len(keys))
    packed = jnp.concatenate(
        [jnp.stack(res[len(keys):], axis=0),
         jnp.zeros((2, cap3), jnp.float32)], axis=0)         # (8, CAP3)
    seg_start = jnp.searchsorted(
        res[0], pex.seg_bounds32(num_tiles),
        side='left').astype(jnp.int32)
    if return_keys:
        # Sharded path (parallel/fov_shard): the sorted (key, dbits) rows
        # ship with the pair rows so tile owners can re-establish the
        # exact global (tile, depth) order after the all-to-all merge.
        assert sort_exact, "return_keys requires the exact-depth sort"
        return (packed, seg_start, seg_start[-1], overflow, cap3, total_f,
                (res[0], res[1]))
    return packed, seg_start, seg_start[-1], overflow, cap3, total_f


def _dual_blend(pair_tile, pair_mean2d, pair_conic, pair_op1, pair_op2,
                pair_col1, pair_col2, pair_l2_cull, seg_start, num_pairs,
                tile_l1_active, tile_l2_active,
                grid_x: int, grid_y: int, chunk: int, power_cutoff: float):
    """Two simultaneous transmittance chains over the sorted pair list.

    tile_l1_active/tile_l2_active: (T, PIX) bool masks — which pixels
    accumulate each chain (plain tiles: L1 everywhere, L2 nowhere).
    pair_l2_cull: (CAP,) bool — pair skipped in the L2 chain
    (highest_level + 1 < L2_f).
    Returns (C1, C2, T1, T2) with shapes ([T,PIX,3], ..., [T,PIX], ...).
    """
    num_tiles = grid_x * grid_y

    def chain_update(a_eff, logT, frozen, color, col, kt, kt_safe, first):
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
        return logT, frozen, color

    def body(state):
        k, c1, c2, lt1, lt2, fr1, fr2 = state
        base = k * chunk
        sl = lambda x: jax.lax.dynamic_slice_in_dim(x, base, chunk)
        kt = sl(pair_tile)
        m2d = sl(pair_mean2d)
        con = sl(pair_conic)
        op1 = sl(pair_op1)
        op2 = sl(pair_op2)
        col1 = sl(pair_col1)
        col2 = sl(pair_col2)
        l2c = sl(pair_l2_cull)

        kt_safe = jnp.minimum(kt, num_tiles - 1)
        valid = (kt < num_tiles)[:, None]
        first, _ = _segment_firsts(kt)

        # Shared geometry (the reference computes exp(power) once,
        # forward.cu:389-397).
        ch = kt.shape[0]
        lx = jnp.arange(PIX, dtype=jnp.float32) % TILE
        ly = jnp.floor(jnp.arange(PIX, dtype=jnp.float32) / TILE)
        px = (kt % grid_x).astype(jnp.float32)[:, None] * TILE + lx[None, :]
        py = (kt // grid_x).astype(jnp.float32)[:, None] * TILE + ly[None, :]
        dx = m2d[:, 0:1] - px
        dy = m2d[:, 1:2] - py
        a_c, b_c, c_c = con[:, 0:1], con[:, 1:2], con[:, 2:3]
        power = -0.5 * (a_c * dx * dx + c_c * dy * dy) - b_c * dx * dy
        G = jnp.exp(jnp.minimum(power, 0.0))
        geo_ok = (power <= 0.0) & (power >= power_cutoff) & valid

        alpha1 = jnp.minimum(ALPHA_MAX, op1[:, None] * G)
        ok1 = geo_ok & (alpha1 >= ALPHA_MIN) & tile_l1_active[kt_safe] \
            & ~fr1[kt_safe]
        a1 = jnp.where(ok1, alpha1, 0.0)
        lt1, fr1, c1 = chain_update(a1, lt1, fr1, c1, col1, kt, kt_safe, first)

        alpha2 = jnp.minimum(ALPHA_MAX, op2[:, None] * G)
        ok2 = geo_ok & (alpha2 >= ALPHA_MIN) & tile_l2_active[kt_safe] \
            & ~l2c[:, None] & ~fr2[kt_safe]
        a2 = jnp.where(ok2, alpha2, 0.0)
        lt2, fr2, c2 = chain_update(a2, lt2, fr2, c2, col2, kt, kt_safe, first)

        return k + 1, c1, c2, lt1, lt2, fr1, fr2

    def cond(state):
        return state[0] * chunk < num_pairs

    shape = (num_tiles, PIX)
    init = (jnp.int32(0),
            jnp.zeros(shape + (3,), jnp.float32),
            jnp.zeros(shape + (3,), jnp.float32),
            jnp.zeros(shape, jnp.float32),
            jnp.zeros(shape, jnp.float32),
            jnp.zeros(shape, bool),
            jnp.zeros(shape, bool))
    _, c1, c2, lt1, lt2, _, _ = jax.lax.while_loop(cond, body, init)
    return c1, c2, jnp.exp(lt1), jnp.exp(lt2)


def rasterize_fov(means3d, scales, rotations, opacities, shs_dcs, shs_rest,
                  highest_levels, camera, gaze, alpha,
                  blending: bool = True, bg_color=None, sh_degree: int = 3,
                  config: RasterizeConfig = RasterizeConfig(),
                  fov_cfg: FoveationConfig = FoveationConfig(),
                  colors_override=None, opacity_shared=None,
                  live_mask=None):
    """Foveated render ("ours" FR).

    Args:
      opacities: (N, L) activated per-level opacity (or None with
        opacity_shared (N,) for the SM-FR baseline).
      shs_dcs: (N, L, 3) per-level DC SH coefficients (or None with
        colors_override (N, L, 3) precomputed colors).
      shs_rest: (N, K-1, 3) shared rest coefficients.
      highest_levels: (N,) coarsest level each Gaussian survives to.
      gaze: (2,) NDC in [0, 1]. alpha: foveation strength (0.05 in the FPS
        harness, render_compose_gazes_fps.py:51).
    """
    gx, gy = _grid(camera)
    num_tiles = gx * gy
    cap = config.padded_capacity()
    n = means3d.shape[0]
    L = fov_cfg.fov_num

    prep = projection.preprocess(means3d, scales, rotations, camera,
                                 scale_modifier=config.scale_modifier,
                                 live_mask=live_mask)

    levels = foveation.compute_tile_levels(gaze, camera.width, camera.height,
                                           alpha, fov_cfg)
    grad_x, grad_y, _, tile_blend = foveation.compute_tile_level_infos(
        levels, camera.width, camera.height, fov_cfg)
    if not blending:
        tile_blend = jnp.zeros_like(tile_blend)

    hl = jnp.asarray(highest_levels, jnp.float32)

    def level_mask(orig, tile):
        t = jnp.minimum(tile, num_tiles - 1)
        return levels[t] < hl[orig] + 1.0

    # Pre-expansion cull: clip each Gaussian's tile rect to the bounding box
    # of tiles its level can reach (level < hl+1 is a gaze-centered region).
    # The reference tests per (Gaussian, tile) only; clipping up front
    # shrinks the candidate-pair count (and the static pair capacity) 2-3x.
    # Output-invariant: removes only pairs level_mask would reject
    # (tests/test_rasterize_parity.py toggles config.clip_level_rects to
    # check).
    if config.clip_level_rects:
        prep = _clip_rects_to_levels(prep, levels, hl, gx, gy, L)

    if colors_override is None:
        fov_colors = compute_fov_colors(means3d, shs_rest, shs_dcs,
                                        camera.cam_center, sh_degree)
    else:
        fov_colors = colors_override                       # (N, L, 3)
    if opacity_shared is not None:
        opacities = jnp.broadcast_to(opacity_shared[:, None], (n, L))

    fused = None
    if config.backend == "pallas" and config.pallas_fused_expand:
        t1cols = [
            prep.rect_min[:, 0].astype(jnp.float32),
            prep.rect_min[:, 1].astype(jnp.float32),
            jnp.maximum(prep.rect_max[:, 0] - prep.rect_min[:, 0],
                        1).astype(jnp.float32),
            prep.tiles_touched.astype(jnp.float32),
            prep.mean2d[:, 0], prep.mean2d[:, 1],
            prep.eigen_vec[:, 0, 0], prep.eigen_vec[:, 0, 1],
            prep.eigen_vec[:, 1, 0], prep.eigen_vec[:, 1, 1],
            prep.eigen_len[:, 0], prep.eigen_len[:, 1],
            prep.conic[:, 0], prep.conic[:, 1], prep.conic[:, 2],
            hl,
        ]
        t2cols = ([opacities[:, l] for l in range(L)]
                  + [fov_colors[:, l, c] for c in range(3) for l in range(L)])
        fused = _bin_fov_fused(t1cols, t2cols, prep.valid, prep.depth, gaze,
                               alpha, gx, gy, cap, camera, fov_cfg,
                               config.pallas_interpret, config.dummy_slack,
                               config.compact_capacity, config.expand_chunk,
                               config.expand_batch,
                               sort_exact=config.sort_exact_depth)
        bn = None
    elif config.backend == "pallas":
        # Pre-sort per-pair attribute derivation (see bin_gaussians): the
        # tile's fractional level is recomputed analytically per pair
        # (cheaper than a CAP gather from the per-tile table), the
        # level-dependent opacity/color/cull are selected elementwise from
        # ONE expanded (N, 4L+1) attr table, and all 9 derived values ride
        # the tile sort as free payload operands. This removes every
        # post-sort CAP-sized gather from the foveated hot path.
        attr_table = jnp.concatenate(
            [opacities, fov_colors[:, :, 0], fov_colors[:, :, 1],
             fov_colors[:, :, 2], hl[:, None]], axis=1)    # (N, 4L+1)

        def pair_fn(orig, tx, ty, tile, rows2):
            lv = foveation.tile_levels_at(tx, ty, gaze, camera.width,
                                          camera.height, alpha, fov_cfg)
            hl_row = rows2[:, 4 * L]
            keep = lv < hl_row + 1.0                       # level cull
            p1 = lv.astype(jnp.int32)
            p2 = jnp.minimum(p1 + 1, L - 1)

            def sel(pk):
                out = []
                for c in range(4):                          # op, r, g, b
                    v = rows2[:, c * L]
                    for k in range(1, L):
                        v = jnp.where(pk == k, rows2[:, c * L + k], v)
                    out.append(v)
                return out

            o1, r1, g1, b1 = sel(p1)
            o2, r2, g2, b2 = sel(p2)
            cull = ((hl_row + 1.0) < (lv + 1.0)).astype(jnp.float32)
            return keep, [o1, r1, g1, b1, o2, r2, g2, b2, cull]

        bn = binning.bin_gaussians(prep, gx, gy, cap, use_obb=config.use_obb,
                                   carry_geometry=True,
                                   attr_table=attr_table, pair_fn=pair_fn)
    else:
        bn = binning.bin_gaussians(prep, gx, gy, cap, tile_mask_fn=level_mask,
                                   use_obb=config.use_obb)

    # Per-tile level indices and per-pixel estimated level.
    l1_i = levels.astype(jnp.int32)
    l2_i = jnp.minimum(l1_i + 1, L - 1)
    lx = jnp.arange(PIX, dtype=jnp.float32) % TILE
    ly = jnp.floor(jnp.arange(PIX, dtype=jnp.float32) / TILE)
    est = (levels[:, None]
           + (lx[None, :] * grad_x[:, None] + ly[None, :] * grad_y[:, None])
           / TILE)                                          # (T, PIX)

    # Chain activity masks (renderCUDA_blending's L1_done init / L2_done).
    l1_active = jnp.where(tile_blend[:, None],
                          est <= (l1_i + 1)[:, None].astype(jnp.float32),
                          jnp.ones((num_tiles, PIX), bool))
    l2_active = jnp.broadcast_to(tile_blend[:, None], (num_tiles, PIX))

    if config.backend == "pallas":
        from fovsplat.ops.pallas import blend_fov as pkf
        if fused is not None:
            packed, seg_start, num_pairs, overflow, _cap2, _cand = fused
            bn = binning.Binned(pair_gauss=None, pair_tile=None,
                                seg_start=seg_start, num_pairs=num_pairs,
                                overflow=overflow, depth_order=None)
        else:
            # bn.pair_attrs rows: [mx, my, ca, cb, cc, op1, r1, g1, b1, op2,
            # r2, g2, b2, l2cull] — geometry and the pre-sort-derived
            # per-level values all rode the tile sort as payloads; pack
            # them into the blend kernel's 6-row layout (expand_fov
            # docstring: ca bf16 x2 split, ops u8/255 with the L2-cull as
            # op2 = 0, colors u8 on [0, 2]) + 2 zero pad rows.
            A = bn.pair_attrs
            o2s = jnp.where(A[13] > 0.5, jnp.float32(0.0), A[9])
            q8 = lambda v, sc: jnp.clip(jnp.floor(v * sc + 0.5),
                                        0.0, 255.0).astype(jnp.int32)
            oprg = jax.lax.bitcast_convert_type(
                (q8(A[5], 255.0) << 24) | (q8(o2s, 255.0) << 16)
                | (q8(A[6], 127.5) << 8) | q8(A[7], 127.5), jnp.float32)
            brgb = jax.lax.bitcast_convert_type(
                (q8(A[8], 127.5) << 24) | (q8(A[10], 127.5) << 16)
                | (q8(A[11], 127.5) << 8) | q8(A[12], 127.5), jnp.float32)
            ca_hi = _trunc_bf16(A[2])
            packed = jnp.concatenate(
                [A[0:2],
                 jnp.stack([pkf.pack2bf16_xla(ca_hi, A[2] - ca_hi),
                            pkf.pack2bf16_xla(A[3], A[4]),
                            oprg, brgb,
                            jnp.zeros_like(oprg),
                            jnp.zeros_like(oprg)], axis=0)],
                axis=0)                                      # (8, CAP)
            seg_start = bn.seg_start
        tile_act = jnp.stack([
            l1_active.astype(jnp.float32), l2_active.astype(jnp.float32),
            jnp.zeros_like(l1_active, jnp.float32),
            jnp.zeros_like(l1_active, jnp.float32)], axis=-1)
        c1, t1, c2, t2 = pkf.blend_fov_pallas(
            packed, seg_start[:-1], seg_start[1:], tile_act, gx, gy,
            config.pallas_chunk, config.power_cutoff,
            config.pallas_interpret, batch=config.pallas_blend_batch,
            prefix_mode=config.pallas_prefix_mode)
    else:
        # XLA fallback (CPU tests/oracle): per-level rows gathered post-sort
        # from one packed (N*L, 5) table — two row gathers per pair instead
        # of six scalar gathers.
        gid = jnp.minimum(bn.pair_gauss, n - 1)
        kt_safe = jnp.minimum(bn.pair_tile, num_tiles - 1)
        pl1 = l1_i[kt_safe]
        pl2 = l2_i[kt_safe]
        lvl_table = jnp.concatenate([
            fov_colors.reshape(n * L, 3),
            opacities.reshape(n * L, 1),
            jnp.broadcast_to(hl[:, None, None], (n, L, 1)).reshape(n * L, 1),
        ], axis=1)                                           # (N*L, 5)
        row1 = lvl_table[gid * L + pl1]
        row2 = lvl_table[gid * L + pl2]
        l2_cull = (row1[:, 4] + 1.0) < (levels[kt_safe] + 1.0)  # hl+1 < L2_f
        c1, c2, t1, t2 = _dual_blend(
            bn.pair_tile, prep.mean2d[gid], prep.conic[gid], row1[:, 3],
            row2[:, 3], row1[:, 0:3], row2[:, 0:3], l2_cull, bn.seg_start,
            bn.num_pairs, l1_active, l2_active,
            gx, gy, config.chunk, config.power_cutoff)

    bg = (jnp.zeros(3, jnp.float32) if bg_color is None
          else jnp.asarray(bg_color, jnp.float32))
    c1 = c1 + t1[..., None] * bg
    c2 = c2 + t2[..., None] * bg
    # Smoothstep merge (forward.cu:459-476).
    x = jnp.abs(est - (l1_i[:, None].astype(jnp.float32) + fov_cfg.start_blend))
    x = jnp.clip(x / fov_cfg.blend_width, 0.0, 1.0)
    blend_T = 3 * x * x - 2 * x * x * x
    l1_w = 1.0 - blend_T
    merged = c1 * l1_w[..., None] + c2 * (1.0 - l1_w[..., None])
    tile_color = jnp.where(tile_blend[:, None, None], merged, c1)

    image = tiles_to_image(tile_color, gx, gy, camera.width, camera.height)
    return {"render": image,
            "radii": jnp.where(prep.valid, prep.radius, 0),
            "tile_levels": levels, "tile_blend": tile_blend,
            "binned": bn}


# --------------------------------------------------------- SoA fast path

@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class FovModelSoA:
    """Foveated model packed once for the render loop: every per-frame
    consumer reads full-lane (…, N)-last arrays, so no frame pays the
    (N, K, 3)->(3, K, N) transposes or minor-dim-layout loads (measured
    ~70 ms/frame at 1.16M Gaussians on a v5e)."""
    xyz: Any        # (N, 3)
    scales: Any     # (N, 3) activated
    rotations: Any  # (N, 4) unit quats
    rest_t: Any     # (3, K, N) SH coeffs, zero DC at index 0
    dc_t: Any       # (3, L, N) per-level DC
    opac_t: Any     # (L, N) activated per-level opacity
    hl: Any         # (N,) f32 highest levels
    geo_t: Any      # (16, N_pad) f32 table-kernel geometry rows
    col_t: Any      # (64, N_pad) bf16 table-kernel color rows


def pack_fov_model(means3d, scales, rotations, opacities, shs_dcs, shs_rest,
                   highest_levels, shared_colors: bool = False) -> FovModelSoA:
    """One-time layout conversion (the reference loads its composed model
    once per FPS run too, render_compose_gazes_fps.py:81-90).

    shared_colors=True packs the SM-FR (naive, reference N7) layout: ONE
    DC color and opacity per Gaussian (opacities (N,) or (N, L) col 0;
    shs_dcs (N, 1, 3) or (N, L, 3) level 0), while highest_levels still
    drive the full 4-level cull. The table shrinks 64 -> 48 rows, which
    cuts the expand kernel's expansion-matmul volume 25% — the naive
    baseline is structurally CHEAPER than ours, as in the reference
    (871 vs 702 FPS)."""
    n = means3d.shape[0]
    if shared_colors:
        opacities = jnp.asarray(opacities)
        shs_dcs = jnp.asarray(shs_dcs)
        if opacities.ndim == 2:
            opacities = opacities[:, :1]
        else:
            opacities = opacities[:, None]
        if shs_dcs.shape[1] != 1:
            shs_dcs = shs_dcs[:, :1, :]
    # Color/opacity rows are stored bf16: the expand kernel's attribute
    # table quantizes them to bf16/u8 anyway (expand_fov docstring), so
    # the per-frame SH/color reads — the largest per-Gaussian HBM term,
    # 61 of ~72 model rows — run at half the bytes. Consumers upcast
    # slice-wise (fused converts); geometry stays f32. Inference-only:
    # training paths never use this packing.
    rest_t = jnp.concatenate(
        [jnp.zeros((3, 1, n), jnp.bfloat16),
         jnp.asarray(shs_rest, jnp.bfloat16).transpose(2, 1, 0)], axis=1)
    dc_t = jnp.asarray(shs_dcs, jnp.bfloat16).transpose(2, 1, 0)
    opac_t = jnp.asarray(opacities, jnp.bfloat16).T
    hl = jnp.asarray(highest_levels, jnp.float32)
    xyz = jnp.asarray(means3d, jnp.float32)
    sc = jnp.asarray(scales, jnp.float32)
    rot = jnp.asarray(rotations, jnp.float32)

    # Packed tables for the fused table-build kernel
    # (ops/pallas/build_table): one f32 geometry table and one bf16 color
    # table, both lane-padded to the kernel chunk.
    from fovsplat.ops.pallas import build_table as ptab
    n_pad = ((n + ptab.TCHUNK - 1) // ptab.TCHUNK) * ptab.TCHUNK
    geo = jnp.concatenate(
        [xyz.T, sc.T, rot.T, hl[None, :],
         jnp.zeros((ptab.GROWS - 11, n), jnp.float32)], axis=0)
    L = dc_t.shape[1]
    col = jnp.concatenate(
        [rest_t.reshape(48, n), dc_t.reshape(3 * L, n), opac_t], axis=0)
    col = jnp.pad(col, ((0, ptab.CROWS - col.shape[0]), (0, 0)))
    return FovModelSoA(
        xyz=xyz, scales=sc, rotations=rot,
        rest_t=rest_t, dc_t=dc_t, opac_t=opac_t, hl=hl,
        geo_t=jnp.pad(geo, ((0, 0), (0, n_pad - n))),
        col_t=jnp.pad(col, ((0, 0), (0, n_pad - n))))


def fov_soa_cols(xyz, scales, rotations, rest_t, dc_t, opac_t, hl, camera,
                 bb, L: int, L_lay: int, sh_degree: int,
                 scale_modifier: float = 1.0):
    """XLA column stage of the SoA foveated pipeline (the non-table-kernel
    route): per-Gaussian preprocess + level-rect clip + per-level
    color/opacity columns. Shared by rasterize_fov_soa and the
    Gaussian-sharded renderer (parallel/fov_shard) — the stage is
    embarrassingly parallel over Gaussians, so each shard runs it on its
    own rows. Returns (t1cols, t2cols, valid, depth)."""
    pc = projection.preprocess_cols(xyz, scales, rotations, camera,
                                    scale_modifier=scale_modifier)
    # Level-rect clip on columns: bbox per level selected by
    # where-chain over L scalars — no (N, 4) gather.
    hli = jnp.clip(hl.astype(jnp.int32), 0, L - 1)
    bx0 = jnp.full_like(hli, bb[0][0])
    by0 = jnp.full_like(hli, bb[0][1])
    bx1 = jnp.full_like(hli, bb[0][2])
    by1 = jnp.full_like(hli, bb[0][3])
    for h in range(1, L):
        m = hli == h
        bx0 = jnp.where(m, bb[h][0], bx0)
        by0 = jnp.where(m, bb[h][1], by0)
        bx1 = jnp.where(m, bb[h][2], bx1)
        by1 = jnp.where(m, bb[h][3], by1)
    rx0 = jnp.maximum(pc.rx0, bx0)
    ry0 = jnp.maximum(pc.ry0, by0)
    rx1 = jnp.minimum(pc.rx1, bx1)
    ry1 = jnp.minimum(pc.ry1, by1)
    tnum = (jnp.maximum(rx1 - rx0, 0) * jnp.maximum(ry1 - ry0, 0))
    # hl < 0 encodes "dead" rows (eval/fps folds the live mask in).
    valid = pc.valid & (tnum > 0) & (hl >= 0.0)
    tnum = jnp.where(valid, tnum, 0)
    rx1 = jnp.maximum(rx1, rx0)

    # Per-level colors as columns: shared SH-rest + per-level DC.
    dx_ = xyz[:, 0] - camera.cam_center[0]
    dy_ = xyz[:, 1] - camera.cam_center[1]
    dz_ = xyz[:, 2] - camera.cam_center[2]
    inv = jax.lax.rsqrt(dx_ * dx_ + dy_ * dy_ + dz_ * dz_)
    rest_c = sh._eval_sh_nlast(sh_degree, rest_t, dx_ * inv,
                               dy_ * inv, dz_ * inv) + 0.5    # (3, N)

    t1cols = [
        rx0.astype(jnp.float32), ry0.astype(jnp.float32),
        jnp.maximum(rx1 - rx0, 1).astype(jnp.float32),
        tnum.astype(jnp.float32),
        pc.mx, pc.my, pc.v1x, pc.v1y, pc.v2x, pc.v2y, pc.len1, pc.len2,
        pc.ca, pc.cb, pc.cc, hl,
    ]
    # A shared-color model (L_lay == 1) just broadcasts its one level.
    t2cols = ([opac_t[min(l, L_lay - 1)].astype(jnp.float32)
               for l in range(L)]
              + [jnp.maximum(
                  sh.SH_C0 * dc_t[c, min(l, L_lay - 1)].astype(jnp.float32)
                  + rest_c[c], 0.0)
                 for c in range(3) for l in range(L)])
    return t1cols, t2cols, valid, pc.depth


def rasterize_fov_soa(model: FovModelSoA, camera, gaze, alpha,
                      blending: bool = True, bg_color=None,
                      sh_degree: int = 3,
                      config: RasterizeConfig = RasterizeConfig(),
                      fov_cfg: FoveationConfig = FoveationConfig()):
    """Foveated render over a pre-packed SoA model (pallas backend only).

    Same output as rasterize_fov (same kernels, same binning); the
    difference is purely input layout: all per-Gaussian math runs on (N,)
    columns end to end."""
    gx, gy = _grid(camera)
    num_tiles = gx * gy
    cap = config.padded_capacity()
    L = fov_cfg.fov_num
    # Color-layout level count from the packed model: 1 = SM-FR shared
    # colors (pack_fov_model(shared_colors=True)); the level CULL always
    # runs at L levels.
    L_lay = model.dc_t.shape[1]
    hl = model.hl
    n = model.xyz.shape[0]

    levels = foveation.compute_tile_levels(gaze, camera.width, camera.height,
                                           alpha, fov_cfg)
    grad_x, grad_y, _, tile_blend = foveation.compute_tile_level_infos(
        levels, camera.width, camera.height, fov_cfg)
    if not blending:
        tile_blend = jnp.zeros_like(tile_blend)

    # Per-level clip-bbox scalars (see _clip_rects_to_levels).
    lv2d = levels.reshape(gy, gx)
    txs = jax.lax.broadcasted_iota(jnp.int32, (gy, gx), 1)
    tys = jax.lax.broadcasted_iota(jnp.int32, (gy, gx), 0)
    big = jnp.int32(1 << 20)
    bb = []
    for h in range(L):
        ok = lv2d < (h + 1.0)
        bb.append((jnp.min(jnp.where(ok, txs, big)),
                   jnp.min(jnp.where(ok, tys, big)),
                   jnp.max(jnp.where(ok, txs + 1, 0)),
                   jnp.max(jnp.where(ok, tys + 1, 0))))

    if config.pallas_table_kernel:
        # Fused per-Gaussian table build (ops/pallas/build_table): one
        # Pallas pass replaces preprocess_cols + level clip + SH + the
        # split-row table stack + the tiles-touched cumsum.
        from fovsplat.ops.pallas import build_table as ptab
        consts = ptab.make_table_consts(
            camera,
            jnp.stack([b[0] for b in bb]), jnp.stack([b[1] for b in bb]),
            jnp.stack([b[2] for b in bb]), jnp.stack([b[3] for b in bb]))
        dtable, cum, total_f, tnum = ptab.build_fov_table_pallas(
            model.geo_t, model.col_t, consts, n=n,
            grid_x=gx, grid_y=gy, width=camera.width, height=camera.height,
            scale_modifier=config.scale_modifier, fov_num=L_lay,
            fov_num_bbox=L, sh_degree=sh_degree,
            interpret=config.pallas_interpret,
            drop_invalid=config.expand_drop_invalid)
        n_rows = n
        dummy_slack = config.dummy_slack
        if config.compact_table:
            dtable, cum, total_f, n_rows = binning.compact_prebuilt(
                dtable, tnum, flag_row=27, flag_thresh=-1.0,
                interpret=config.pallas_interpret)
            dummy_slack = 0
        packed, seg_start, num_pairs, overflow, _cap2, candidates = _bin_fov_fused(
            None, None, None, None, gaze, alpha, gx, gy, cap, camera,
            fov_cfg, config.pallas_interpret, dummy_slack,
            config.compact_capacity, config.expand_chunk,
            config.expand_batch, prebuilt=(dtable, cum, total_f),
            n_rows=n_rows, sort_exact=config.sort_exact_depth,
            fov_layout=L_lay, drop_invalid=config.expand_drop_invalid)
    else:
        t1cols, t2cols, valid, depth_c = fov_soa_cols(
            model.xyz, model.scales, model.rotations, model.rest_t,
            model.dc_t, model.opac_t, hl, camera, bb, L, L_lay, sh_degree,
            config.scale_modifier)

        packed, seg_start, num_pairs, overflow, _cap2, candidates = _bin_fov_fused(
            t1cols, t2cols, valid, depth_c, gaze, alpha, gx, gy, cap,
            camera, fov_cfg, config.pallas_interpret, config.dummy_slack,
            config.compact_capacity, config.expand_chunk,
            config.expand_batch, sort_exact=config.sort_exact_depth)

    # Per-tile activity + blend + smoothstep merge (same as rasterize_fov).
    l1_i = levels.astype(jnp.int32)
    lx = jnp.arange(PIX, dtype=jnp.float32) % TILE
    ly = jnp.floor(jnp.arange(PIX, dtype=jnp.float32) / TILE)
    est = (levels[:, None]
           + (lx[None, :] * grad_x[:, None] + ly[None, :] * grad_y[:, None])
           / TILE)
    l1_active = jnp.where(tile_blend[:, None],
                          est <= (l1_i + 1)[:, None].astype(jnp.float32),
                          jnp.ones((num_tiles, PIX), bool))
    l2_active = jnp.broadcast_to(tile_blend[:, None], (num_tiles, PIX))

    from fovsplat.ops.pallas import blend_fov as pkf
    tile_act = jnp.stack([
        l1_active.astype(jnp.float32), l2_active.astype(jnp.float32),
        jnp.zeros_like(l1_active, jnp.float32),
        jnp.zeros_like(l1_active, jnp.float32)], axis=-1)
    c1, t1, c2, t2 = pkf.blend_fov_pallas(
        packed, seg_start[:-1], seg_start[1:], tile_act, gx, gy,
        config.pallas_chunk, config.power_cutoff, config.pallas_interpret,
        batch=config.pallas_blend_batch,
        prefix_mode=config.pallas_prefix_mode)

    bg = (jnp.zeros(3, jnp.float32) if bg_color is None
          else jnp.asarray(bg_color, jnp.float32))
    c1 = c1 + t1[..., None] * bg
    c2 = c2 + t2[..., None] * bg
    x = jnp.abs(est - (l1_i[:, None].astype(jnp.float32) + fov_cfg.start_blend))
    x = jnp.clip(x / fov_cfg.blend_width, 0.0, 1.0)
    blend_T = 3 * x * x - 2 * x * x * x
    l1_w = 1.0 - blend_T
    merged = c1 * l1_w[..., None] + c2 * (1.0 - l1_w[..., None])
    tile_color = jnp.where(tile_blend[:, None, None], merged, c1)

    image = tiles_to_image(tile_color, gx, gy, camera.width, camera.height)
    return {"render": image, "tile_levels": levels, "tile_blend": tile_blend,
            "num_pairs": num_pairs, "overflow": overflow,
            # Candidate pairs incl. dummy rows (pre-cull, unclamped):
            # the measured sizing signal for the candidate (pair_capacity
            # + dummy_slack) axis of capacity buckets (bench.py).
            "candidates": candidates}
