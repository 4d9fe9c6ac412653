"""Tile binning: depth sort + pair expansion + OBB cull + stable tile sort.

TPU-native replacement for the reference's CUB pipeline
(InclusiveSum -> OBB_test -> duplicateWithKeys -> DeviceRadixSort ->
identifyTileRanges, ..._pcheck_obb_sum/cuda_rasterizer/rasterizer_impl.cu),
redesigned for static shapes:

  1. Sort Gaussians by view depth once (N log N) — then every later stage is
     depth-ordered for free.
  2. Expand (Gaussian, tile) candidate pairs *without scatter*: a pair index
     p in [0, CAP) maps to its owning Gaussian via searchsorted over the
     inclusive cumsum of per-Gaussian tile-rect areas, and to a tile via the
     pair's rank within the rect. CAP is a static capacity; overflow is
     counted and reported, never silently wrong order.
  3. Vectorized separating-axis (OBB) test per pair — same math as
     auxiliary.h:66-156 OBB_check, reduced to 4 closed-form interval tests.
  4. One *stable* sort of pairs by tile id. Stability + step 1 ==> pairs
     within a tile are depth-ordered, reproducing the reference's
     (tile << 32 | depth) radix sort exactly (identifyTileRanges becomes a
     searchsorted over the sorted keys).

The optional `tile_mask_fn` hook injects the foveated level-cull
(filter kernel, ..._fov_pcheck_obb/rasterizer_impl.cu:264-383) into step 3.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax
import jax.numpy as jnp

from fovsplat.ops.projection import TILE, Preprocessed


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Binned:
    """Sorted pair list + per-tile segments. CAP = static pair capacity."""
    pair_gauss: Any   # (CAP,) int32 original Gaussian index (N = invalid sentinel)
    pair_tile: Any    # (CAP,) int32 tile id, ascending (num_tiles = sentinel)
    seg_start: Any    # (num_tiles + 1,) int32 segment bounds into pair arrays
    num_pairs: Any    # () int32 valid pairs after culling
    overflow: Any     # () int32 candidate pairs dropped by capacity
    depth_order: Any  # (N,) int32 Gaussians sorted by depth (invalid last)
    pair_attrs: Any = None  # optional (K, CAP) f32 attributes carried
                            # through the sort (mean2d, conic, extras)


def obb_pass(tile_x: jnp.ndarray, tile_y: jnp.ndarray, center: jnp.ndarray,
             eigen_vec: jnp.ndarray, eigen_len: jnp.ndarray) -> jnp.ndarray:
    """Vectorized OBB/tile separating-axis test (auxiliary.h OBB_check).

    All args are per-pair: tile_x/y int tiles, center (P,2) pixel center of
    the Gaussian, eigen_vec (P,2,2) unit axes, eigen_len (P,2).
    """
    half = TILE / 2.0
    tpx = tile_x.astype(jnp.float32) * TILE + half
    tpy = tile_y.astype(jnp.float32) * TILE + half
    v1 = eigen_vec[..., 0, :]
    v2 = eigen_vec[..., 1, :]
    d1 = eigen_len[..., 0:1] * v1        # (P, 2)
    d2 = eigen_len[..., 1:2] * v2
    cx = center[..., 0] - tpx
    cy = center[..., 1] - tpy
    # Axis tests 1-2: gaussian OBB AABB vs tile AABB (both around tile center).
    ext_x = jnp.abs(d1[..., 0]) + jnp.abs(d2[..., 0])
    ext_y = jnp.abs(d1[..., 1]) + jnp.abs(d2[..., 1])
    pass_x = jnp.abs(cx) <= half + ext_x
    pass_y = jnp.abs(cy) <= half + ext_y
    # Axis tests 3-4: tile corners projected onto the principal axes.
    base1 = -(cx * v1[..., 0] + cy * v1[..., 1])   # (tile_center - center) . v1
    base2 = -(cx * v2[..., 0] + cy * v2[..., 1])
    e1 = half * (jnp.abs(v1[..., 0]) + jnp.abs(v1[..., 1]))
    e2 = half * (jnp.abs(v2[..., 0]) + jnp.abs(v2[..., 1]))
    pass_1 = jnp.abs(base1) <= eigen_len[..., 0] + e1
    pass_2 = jnp.abs(base2) <= eigen_len[..., 1] + e2
    return pass_x & pass_y & pass_1 & pass_2


def bin_gaussians(prep: Preprocessed, grid_x: int, grid_y: int,
                  pair_capacity: int,
                  tile_mask_fn: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray] | None = None,
                  use_obb: bool = True,
                  carry_geometry: bool = False,
                  gauss_attrs=None,
                  attr_table=None,
                  pair_fn=None) -> Binned:
    """Bin preprocessed Gaussians into depth-ordered per-tile pair segments.

    tile_mask_fn(orig_gauss_idx, tile_idx) -> bool: extra per-pair cull
    (used for the foveated level test). tile_idx = ty * grid_x + tx.
    carry_geometry: carry (mx, my, ca, cb, cc) through the tile sort as
    payload operands — post-sort attribute gathers (slow on TPU) disappear.
    gauss_attrs: optional (N, K) f32 per-Gaussian columns carried the same
    way (e.g. opacity + RGB for the single-level path).

    attr_table/pair_fn: derived per-PAIR attribute hook. attr_table (N, K2)
    is expanded with ONE extra row gather (kept separate from the binning
    table: TPU row-gather cost is flat up to ~128-byte rows, then triples);
    pair_fn(orig, tx, ty, tile, rows2) -> (keep_mask | None, [attr, ...])
    computes per-pair values (e.g. foveated level selection) pre-sort, and
    the results ride the tile sort as payloads — measured FREE on TPU
    (lax.sort at 3M pairs costs ~32 ms for 1 or 13 payload operands alike),
    whereas every post-sort CAP-sized gather costs ~45-55 ms.
    """
    n = prep.depth.shape[0]
    num_tiles = grid_x * grid_y
    cap = pair_capacity

    # 1. Depth sort (invalid Gaussians pushed to the back).
    sort_key = jnp.where(prep.valid, prep.depth, jnp.inf)
    depth_order = jnp.argsort(sort_key)                     # (N,) orig ids

    tnum_sorted = prep.tiles_touched[depth_order]           # (N,)
    cum_incl = jnp.cumsum(tnum_sorted)
    total = cum_incl[-1]
    overflow = jnp.maximum(total - cap, 0)

    # 2. Pair expansion by rank. The p -> owning-Gaussian interval lookup is
    # a boundary-scatter + cumsum (searchsorted with millions of queries is
    # extremely slow on TPU), and all per-Gaussian data needed downstream is
    # packed into ONE row table so the CAP-sized expansion costs a single
    # row gather instead of ten scalar gathers.
    p = jnp.arange(cap, dtype=jnp.int32)
    cum_excl = (cum_incl - tnum_sorted).astype(jnp.int32)   # (N,)
    marks = jnp.zeros(cap, jnp.int32).at[cum_excl[1:]].add(
        jnp.ones((), jnp.int32), mode='drop')
    g = jnp.minimum(jnp.cumsum(marks), n - 1).astype(jnp.int32)
    in_range = p < total

    # Per-Gaussian packed table: build in ORIGINAL order (pure stacking, no
    # gathers), then ONE row gather into depth order, then ONE row gather
    # per pair. [orig, rmin_x, rmin_y, rw, tnum, mx, my, v1x, v1y, v2x,
    # v2y, l1, l2, cum_excl]
    cols = [
        jnp.arange(n, dtype=jnp.float32),
        prep.rect_min[:, 0].astype(jnp.float32),
        prep.rect_min[:, 1].astype(jnp.float32),
        jnp.maximum(prep.rect_max[:, 0] - prep.rect_min[:, 0],
                    1).astype(jnp.float32),
        prep.tiles_touched.astype(jnp.float32),
        prep.mean2d[:, 0],
        prep.mean2d[:, 1],
        prep.eigen_vec[:, 0, 0],
        prep.eigen_vec[:, 0, 1],
        prep.eigen_vec[:, 1, 0],
        prep.eigen_vec[:, 1, 1],
        prep.eigen_len[:, 0],
        prep.eigen_len[:, 1],
        jnp.zeros(n, jnp.float32),
    ]
    n_extra = 0
    if carry_geometry:
        cols += [prep.conic[:, 0], prep.conic[:, 1], prep.conic[:, 2]]
        n_extra = 3
        if gauss_attrs is not None:
            cols += [gauss_attrs[:, k] for k in range(gauss_attrs.shape[1])]
            n_extra += gauss_attrs.shape[1]
    table = jnp.stack(cols, axis=1)                         # (N, 14+K)
    table = table[depth_order]
    table = table.at[:, 13].set(cum_excl.astype(jnp.float32))
    # NOTE: integer columns ride as f32 — exact for N, coords < 2^24.
    rows = table[g]                                         # (CAP, 14+K)

    orig = rows[:, 0].astype(jnp.int32)
    local = p - rows[:, 13].astype(jnp.int32)
    rw = rows[:, 3].astype(jnp.int32)
    tx = rows[:, 1].astype(jnp.int32) + local % rw
    ty = rows[:, 2].astype(jnp.int32) + local // rw
    tile = ty * grid_x + tx

    # 3. Cull: OBB + optional level mask. Single-tile rects skip the OBB test
    # (the reference filter only SAT-tests multi-tile rects).
    keep = in_range
    if use_obb:
        # eigen_len[0] > 0 iff the Gaussian was multi-tile at PREPROCESS
        # time (projection.py sets lens to 0 otherwise) — equivalent to
        # tiles_touched > 1 there, but stable under later rect clipping
        # (ops/foveated.py level clip), keeping that clip output-invariant.
        multi = rows[:, 11] > 0.0
        ob = obb_pass(tx, ty, rows[:, 5:7],
                      rows[:, 7:11].reshape(-1, 2, 2), rows[:, 11:13])
        keep = keep & (ob | ~multi)
    if tile_mask_fn is not None:
        keep = keep & tile_mask_fn(orig, tile)

    derived = []
    if pair_fn is not None:
        rows2 = attr_table[jnp.minimum(orig, n - 1)] \
            if attr_table is not None else None             # (CAP, K2)
        extra_keep, derived = pair_fn(orig, tx, ty, tile, rows2)
        if extra_keep is not None:
            keep = keep & extra_keep

    key = jnp.where(keep, tile, num_tiles).astype(jnp.int32)

    # 4. Stable sort by tile id; payloads = Gaussian index (+ carried attrs).
    if carry_geometry:
        carried = [rows[:, 5], rows[:, 6]] + \
                  [rows[:, 14 + k] for k in range(n_extra)] + list(derived)
        res = jax.lax.sort((key, orig, *carried), num_keys=1, is_stable=True)
        sorted_key, sorted_orig = res[0], res[1]
        pair_attrs = jnp.stack(res[2:], axis=0)             # (2+K, CAP)
    else:
        sorted_key, sorted_orig = jax.lax.sort((key, orig), num_keys=1,
                                               is_stable=True)
        pair_attrs = None
    seg_start = jnp.searchsorted(sorted_key,
                                 jnp.arange(num_tiles + 1, dtype=jnp.int32),
                                 side='left').astype(jnp.int32)
    num_pairs = seg_start[-1]

    return Binned(pair_gauss=sorted_orig, pair_tile=sorted_key,
                  seg_start=seg_start, num_pairs=num_pairs,
                  overflow=overflow, depth_order=depth_order,
                  pair_attrs=pair_attrs)


def bin_fused_ps1(t1cols, valid, depth, grid_x: int, grid_y: int,
                  pair_capacity: int, interpret: bool = False,
                  dummy_slack=None, compact_capacity=None, chunk=512,
                  kbatch=16, prebuilt=None, n_rows=None, train=False,
                  sort_exact=False, drop_invalid=False):
    """Single-level fused-Pallas binning (ops/pallas/expand_fov._ps1_kernel):
    pair expansion + OBB cull in-kernel, one 2-key (tile, depth) sort
    carrying the finished blend-kernel SoA.

    NO depth presort (an argsort + (N, 24) row gather costs tens of ms at
    1M rows; payload sorts with 20+ operands wedge the XLA TPU compiler):
    the table stays in ORIGINAL order and every invalid row contributes one
    dummy pair (valid=0, culled in-kernel) so the expand kernel's bounded
    window property holds; per-pair depth is emitted by the kernel and
    becomes the sort's second key. Capacity grows by one slot per row.

    t1cols: 19 (N,) f32 columns [rx0, ry0, rw, tnum, mx, my, v1x, v1y, v2x,
    v2y, len1, len2, ca, cb, cc, op, r, g, b].

    The kernel output is COMPACTED (culled + dummy pairs never reach HBM;
    see expand_fov module docstring) and the tile sort runs over kept
    pairs only, bounded by compact_capacity (None = no shrink).

    Returns (packed (ROW=16, CAP3) f32 sorted SoA rows
    [mx, my, P_caca, P_cbcc, OPRGB, ...pad] (expand_ps1_pallas quantized
    layout), seg_start (T+1,), num_pairs, overflow, CAP3)."""
    from fovsplat.ops.pallas import expand_fov as pex

    n = depth.shape[0] if depth is not None else n_rows
    num_tiles = grid_x * grid_y
    # drop_invalid: invalid rows carry NO dummy pair (the candidate
    # stream shrinks by ~n_invalid; window-missed pairs are counted into
    # overflow — see expand_fov guard_marker). Requires a dense-enough
    # pair stream; callers verify overflow == 0 on a probe step.
    slack = 0 if drop_invalid else \
        (n if dummy_slack is None else dummy_slack)
    cap_d = pair_capacity + slack
    cap2 = ((cap_d + chunk * kbatch - 1) // (chunk * kbatch)) \
        * (chunk * kbatch)
    # See foveated.build_fov_dtable: split-row exactness needs cap2 < 2^24.
    assert cap2 < (1 << 24), (
        f"pair capacity {cap2} >= 2^24 breaks split-row integer exactness")

    from fovsplat.ops.foveated import _split2, _split3

    if prebuilt is not None:
        # Table built by the fused per-Gaussian kernel
        # (ops/pallas/build_table mode='ps1'): derive the window-start
        # prefetch scalars + sentinel tail here (cum[lane >= n] == total
        # closes the last interval; the 2^30 tail covers the +128 window
        # overread).
        dtable, cum, total_f = prebuilt
        total = jnp.minimum(total_f, cap2).astype(jnp.int32)
        overflow = jnp.maximum(total_f.astype(jnp.int32) - cap2, 0)
        cum_pad2 = jnp.concatenate(
            [cum, jnp.full((1, 128), jnp.float32(1 << 30))], axis=1)
        chunk_firsts = jnp.arange(0, cap2, chunk, dtype=jnp.float32)
        gstarts = jnp.clip(
            jnp.searchsorted(cum[0, :n], chunk_firsts,
                             side='right').astype(jnp.int32) - 1, 0, n - 1)
        return _ps1_expand_sort(pex, dtable, cum_pad2, gstarts, total,
                                total_f, overflow, grid_x, grid_y, cap2,
                                compact_capacity, chunk, kbatch, interpret,
                                train, sort_exact, drop_invalid)

    t1 = list(t1cols)
    tnum = jnp.where(valid, t1[3], 0.0 if drop_invalid else 1.0)
    cum_incl = jnp.cumsum(tnum)
    total_f = cum_incl[-1]
    cum_excl = cum_incl - tnum
    total = jnp.minimum(total_f, cap2).astype(jnp.int32)
    overflow = jnp.maximum(total_f.astype(jnp.int32) - cap2, 0)

    # bf16 split-row table (same design as foveated.build_fov_dtable —
    # exact values as x3 splits so the kernel's single bf16 one-hot matmul
    # is lossless; OBB axes/extents x2). Layout (PROWS = 64 rows):
    #   0 rx0 | 1 ry0 | 2 rw | 3-5 cum_excl | 6-8 mx | 9-11 my
    #   12-13 v1x | 14-15 v1y | 16-17 v2x | 18-19 v2y | 20-21 len1
    #   22-23 len2 | 24-26 ca | 27-29 cb | 30-32 cc | 33-35 op
    #   36-38 r | 39-41 g | 42-44 b | 45 valid | 46-48 depth
    #   49-51 gid (train-mode payload) | 52-63 pad
    # Valid-mask EVERY value column — see foveated.build_fov_dtable: a
    # NaN table row poisons every pair of its expansion chunk through the
    # MXU one-hot matmul (0 * NaN accumulates NaN on TPU).
    def vm(x, safe=0.0):
        return jnp.where(valid, x, safe)

    cols = [vm(t1[0]),
            vm(t1[1]),
            vm(t1[2], 1.0),
            *_split3(cum_excl),
            *_split3(vm(t1[4])), *_split3(vm(t1[5])),   # mx, my
            *_split2(vm(t1[6])), *_split2(vm(t1[7])),   # v1x, v1y
            *_split2(vm(t1[8])), *_split2(vm(t1[9])),   # v2x, v2y
            *_split2(vm(t1[10])), *_split2(vm(t1[11])),  # len1, len2
            *_split3(vm(t1[12], 1.0)), *_split3(vm(t1[13])),  # ca, cb
            *_split3(vm(t1[14], 1.0)), *_split3(vm(t1[15])),  # cc, op
            *_split3(vm(t1[16])), *_split3(vm(t1[17])),  # r, g
            *_split3(vm(t1[18])),                       # b
            valid.astype(jnp.float32),
            *_split3(vm(depth, 1.0)),
            *_split3(jnp.arange(n, dtype=jnp.float32))]   # gid (train mode)

    wsize = chunk + pex.WPAD
    n_pad = max(((n + 127) // 128) * 128, wsize + 1)
    dtable = jnp.stack(cols, axis=0).astype(jnp.bfloat16)   # (49, N)
    dtable = jnp.pad(dtable,
                     ((0, pex.PROWS - len(cols)), (0, n_pad - n)))

    # Interval one-hot inputs (see expand_fov_pallas): exclusive cumsum
    # with a sentinel at n and unreachable padding, plus per-chunk owners.
    cum_pad = jnp.full((n_pad + 128,), jnp.float32(1 << 30))
    cum_pad = cum_pad.at[:n].set(cum_excl.astype(jnp.float32))
    cum_pad = cum_pad.at[n].set(total_f)
    chunk_firsts = jnp.arange(0, cap2, chunk, dtype=jnp.float32)
    gstarts = jnp.clip(
        jnp.searchsorted(cum_excl, chunk_firsts, side='right').astype(
            jnp.int32) - 1, 0, n - 1)

    return _ps1_expand_sort(pex, dtable, cum_pad[None, :], gstarts, total,
                            total_f, overflow, grid_x, grid_y, cap2,
                            compact_capacity, chunk, kbatch, interpret,
                            train, sort_exact, drop_invalid)


def compact_prebuilt(dtable, tnum, *, flag_row: int, flag_thresh: float,
                     interpret: bool = False):
    """Drop invalid rows from a prebuilt split-row table
    (ops/pallas/compact_table) and rebuild the (dtable, cum, total,
    n_rows) prebuilt-binning contract.

    The compacted cum is recovered from the rewritten cum_excl split rows
    (3-5, exact bf16 part sums); lanes past the live count are set to the
    pair total, which closes the last Gaussian's expansion interval and
    leaves every later interval empty — the same tail convention as
    build_fov_table_pallas' zero-tnum padding lanes."""
    from fovsplat.ops.pallas import compact_table as pct
    n_pad = dtable.shape[1]
    # Output capacity: worst-case live (= n_pad) plus the kernel's
    # staged-block slack, rounded to the expand pipeline's 8192-lane
    # (chunk*kbatch) granule so the downstream contract holds unchanged.
    cap_out = n_pad + 8192
    dtc, live, total = pct.compact_table_pallas(
        dtable, tnum, flag_row=flag_row, flag_thresh=flag_thresh,
        cap_out=cap_out, interpret=interpret)
    total_f = total.astype(jnp.float32)
    lane = jnp.arange(cap_out, dtype=jnp.int32)
    cumc = (dtc[3].astype(jnp.float32) + dtc[4].astype(jnp.float32)
            + dtc[5].astype(jnp.float32))
    cum = jnp.where(lane < live, cumc, total_f)[None, :]
    return dtc, cum, total_f, cap_out


def _ps1_expand_sort(pex, dtable, cum_pad2, gstarts, total, total_f,
                     overflow, grid_x, grid_y, cap2, compact_capacity,
                     chunk, kbatch, interpret, train=False,
                     sort_exact=False, drop_invalid=False):
    num_tiles = grid_x * grid_y
    cap_out = cap2 if compact_capacity is None else compact_capacity
    key, dbits, attrs, kept, missed = pex.expand_ps1_pallas(
        dtable, cum_pad2, gstarts, total, cap=cap2, cap_out=cap_out,
        chunk=chunk, batch=kbatch,
        grid_x=grid_x, grid_y=grid_y, interpret=interpret, train=train,
        guard_marker=drop_invalid)
    cap3 = key.shape[0]
    overflow = (overflow + jnp.maximum(kept - (cap3 - (chunk + 128)), 0)
                + missed)

    # ONE sort over the COMPACTED pairs: i32 fused (tile | depth-hi) key;
    # the train path adds the exact-depth secondary key (its backward must
    # re-walk the forward's exact order), inference defaults to the lossy
    # single key (see expand_fov.fused_key32). Payloads ride as plain f32
    # rows — measured cheaper than the round-2 bit-packed i64 operands.
    keys = (key, dbits) if (train or sort_exact) else (key,)
    res = jax.lax.sort((*keys, *attrs), num_keys=len(keys))
    nk = len(keys)
    pad_rows = 16 - len(attrs)
    packed = jnp.concatenate(
        [jnp.stack(res[nk:], axis=0),
         jnp.zeros((pad_rows, cap3), jnp.float32)], axis=0)   # (16, CAP3)
    seg_start = jnp.searchsorted(
        res[0], pex.seg_bounds32(num_tiles),
        side='left').astype(jnp.int32)
    return packed, seg_start, seg_start[-1], overflow, cap3, total_f


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class AlignedBinned:
    """Pair list re-spaced so each tile's segment starts at a chunk
    boundary (kernel chunks never straddle tiles — required for race-free
    per-chunk gradient DMA in the Pallas backward). Rows in
    [seg_end[t], next start) are padding (gauss id 0, masked by seg_end)."""
    pair_gauss: Any   # (CAP2,) int32
    pair_tile: Any    # (CAP2,) int32 (num_tiles on padding rows)
    seg_start: Any    # (T,) int32 aligned start per tile
    seg_end: Any      # (T,) int32 start + true length
    num_pairs: Any    # () int32 (aligned total)
    overflow: Any     # () int32


def align_segments(bn: Binned, chunk: int, num_tiles: int,
                   out_capacity: int) -> AlignedBinned:
    """Gather formulation (no scatter — slow on TPU): each aligned output
    slot q looks up its source pair via searchsorted over the aligned
    starts. All gathers have ascending indices."""
    assert out_capacity % chunk == 0
    seg_len = (bn.seg_start[1:] - bn.seg_start[:-1]).astype(jnp.int32)  # (T,)
    aligned_len = ((seg_len + chunk - 1) // chunk) * chunk
    aligned_start = jnp.concatenate(
        [jnp.zeros(1, jnp.int32),
         jnp.cumsum(aligned_len).astype(jnp.int32)])           # (T+1,)
    total = aligned_start[-1]
    overflow2 = jnp.maximum(total - out_capacity, 0)

    q = jnp.arange(out_capacity, dtype=jnp.int32)
    # Row -> tile interval lookup via boundary-scatter + cumsum
    # (searchsorted over millions of queries is very slow on TPU).
    marks = jnp.zeros(out_capacity, jnp.int32).at[
        aligned_start[1:num_tiles]].add(1, mode='drop')
    t = jnp.minimum(jnp.cumsum(marks), num_tiles - 1).astype(jnp.int32)
    off = q - aligned_start[t]
    valid = (q < total) & (off < seg_len[t])
    src = jnp.clip(bn.seg_start[t] + off, 0, bn.pair_gauss.shape[0] - 1)
    pair_gauss = jnp.where(valid, jnp.take(bn.pair_gauss, src), 0)
    pair_tile = jnp.where(valid, t, num_tiles)

    starts = jnp.minimum(aligned_start[:-1], out_capacity)
    ends = jnp.minimum(aligned_start[:-1] + seg_len, out_capacity)
    return AlignedBinned(pair_gauss=pair_gauss, pair_tile=pair_tile,
                         seg_start=starts, seg_end=ends,
                         num_pairs=jnp.minimum(total, out_capacity),
                         overflow=bn.overflow + overflow2)
