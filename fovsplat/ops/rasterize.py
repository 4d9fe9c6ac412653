"""Public rasterizer API: preprocess -> bin -> gather -> blend -> image.

This is the TPU-native counterpart of the reference's
``GaussianRasterizer.__call__`` (submodules/*/diff_gaussian_rasterization*/
__init__.py) plus the render dispatch (``gaussian_renderer/__init__.py:19-147``)
collapsed into one functional entry point. The nine CUDA variants become
modes/flags of a single pipeline:

  rasterize(...)                      ~ pcheck_obb / pcheck_obb_sum (training)
  power_cutoff=-inf                   ~ the original Inria rasterizer
  rasterize_stats(...)                ~ _sum/_max/_loss_weighted_max_count
  fovsplat.ops.foveated.rasterize_fov ~ _fov/_naive/_mmfr variants

Differentiable w.r.t. means3d/scales/rotations/opacities/colors (and SH via
color precomputation); the blend step carries a custom VJP, everything else
is plain JAX autodiff.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from fovsplat.ops import binning, blend, projection, sh
from fovsplat.ops.projection import TILE


@dataclasses.dataclass(frozen=True)
class RasterizeConfig:
    """Static rasterizer configuration (shapes/capacities/behavior flags)."""
    pair_capacity: int = 1 << 18      # max (Gaussian, tile) pairs per frame
    chunk: int = 1024                 # pairs per blend step
    power_cutoff: float = -4.5        # OBB variants' early skip; -inf = Inria
    use_obb: bool = True              # exact tile/Gaussian SAT test
    scale_modifier: float = 1.0
    backend: str = "xla"              # "xla" | "pallas" (TPU hot path)
    pallas_chunk: int = 256           # pairs per kernel chunk
    pallas_bwd_chunk: int = 128       # blend-backward chunk (measured
                                      # fastest at 128; fwd stays 256 —
                                      # scripts/probe_bwd_variants.py)
    pallas_sfx_parts: int = 3         # blend-backward suffix-sum split
                                      # order: 3 = exact f32 summation,
                                      # 2 = ~2^-17-relative (drops a
                                      # third of the tril-matmul volume;
                                      # enable only with a measured win)
    pallas_interpret: bool = False    # interpreter mode (CPU tests)
    pallas_fwd_only: bool = False     # inference: skip segment alignment
                                      # (not differentiable)
    pallas_fused_expand: bool = True  # foveated path: fused Pallas
                                      # expansion/cull/derive kernel
                                      # (ops/pallas/expand_fov)
    expand_drop_invalid: bool = False  # fov SoA path: invalid rows carry
                                      # NO dummy pair (the candidate
                                      # stream shrinks ~22%, worth
                                      # ~2.7 ms/frame at bench scale);
                                      # window-missed pairs are counted
                                      # into overflow (never silent).
                                      # Requires a pair density the
                                      # fixed expand window can hold:
                                      # dense gazes with scattered
                                      # invalid rows qualify, sparse
                                      # (corner-gaze) streams do not —
                                      # callers must verify overflow==0
                                      # on a probe frame (bench.py does,
                                      # with fallback to this default
                                      # dummy scheme).
    sort_exact_depth: bool = False    # fused paths: add the full f32
                                      # depth bits as a second i32 sort
                                      # key (exact blend order, ~+8% sort
                                      # cost). Default: single fused key
                                      # with ~2^-11-relative depth ties —
                                      # inside the u8 quantization ladder
                                      # (expand_fov.fused_key32). Training
                                      # paths are ALWAYS exact.
    compact_capacity: int | None = None  # fused paths: capacity of the
                                      # in-kernel-COMPACTED pair buffer the
                                      # tile sort runs over (kept pairs
                                      # only — culled + dummy pairs never
                                      # reach HBM). None = candidate
                                      # capacity (always safe); set to the
                                      # measured kept-pair bound + headroom
                                      # to shrink the sort (its cost is
                                      # linear in capacity). Overflow is
                                      # counted, never silently reordered.
    expand_chunk: int = 512           # fused expand kernel: pairs per chunk
                                      # (512x16 9.6 ms vs 256x16 12.7 ms on
                                      # the 1.16M bench: fewer chunks beat
                                      # the larger per-chunk mask area
                                      # after the compaction rework)
    expand_batch: int = 16            # fused expand kernel: chunks per
                                      # grid program (amortizes launch cost)
    pallas_blend_batch: int = 8       # blend kernels: tiles per grid
                                      # program (amortizes ~9 us launch)
    pallas_prefix_mode: str = "scan"  # fov blend transmittance prefix:
                                      # "scan" (exact f32 Hillis-Steele
                                      # product scan — measured FASTER
                                      # than logmm in the transposed
                                      # orientation, 8.5 vs 10.4 ms on
                                      # the bench workload, and exact) or
                                      # "logmm" (bf16 log-space MXU
                                      # matmul, ~2e-3 relative weight
                                      # error; round-2 default)
    pallas_table_kernel: bool = True  # SoA foveated path: build the
                                      # expand kernel's split-row table
                                      # with the fused per-Gaussian Pallas
                                      # pass (ops/pallas/build_table)
                                      # instead of ~50 XLA column passes
    compact_table: bool = False       # SoA table-kernel paths: drop
                                      # invalid rows (and their dummy
                                      # pairs — ~17% of expand chunks on
                                      # the bench workload) with the
                                      # ops/pallas/compact_table pass
                                      # before expansion. OFF by default:
                                      # the pass measures 6-7.4 ms at
                                      # 1.16M rows on the v5e — more than
                                      # the ~2.5 ms of dummy-chunk expand
                                      # time it removes (parked; the
                                      # kernel+tests stay for a cheaper
                                      # rework)
    clip_level_rects: bool = True     # foveated paths: clip each
                                      # Gaussian's tile rect to its
                                      # level's reachable bbox before
                                      # pair expansion (output-invariant
                                      # capacity optimization; tests
                                      # toggle it off to assert
                                      # invariance)
    dummy_slack: int | None = None    # fused paths: slot budget for the
                                      # one-dummy-pair-per-invalid-row
                                      # scheme. None = N (always safe);
                                      # set lower when the invalid-row
                                      # count is known (the whole binning
                                      # pipeline is CAP-sized, so unused
                                      # slack costs sort/expand time).
                                      # Overflow counter reports violations.

    def padded_capacity(self) -> int:
        c = self.chunk
        return ((self.pair_capacity + c - 1) // c) * c

    def aligned_capacity(self, num_tiles: int) -> int:
        """Capacity of the chunk-aligned pair list (pallas backend): worst
        case adds one partial chunk of padding per tile."""
        c = self.pallas_chunk
        base = self.padded_capacity()
        return ((base + num_tiles * c + c - 1) // c) * c


def _grid(camera):
    gx = (camera.width + TILE - 1) // TILE
    gy = (camera.height + TILE - 1) // TILE
    return gx, gy


def rasterize(means3d, scales, rotations, opacities, camera,
              colors=None, shs=None, sh_degree: int = 3,
              bg_color=None, config: RasterizeConfig = RasterizeConfig(),
              tile_mask_fn=None, live_mask=None, mean2d_offset=None):
    """Render one view.

    Args:
      means3d: (N,3); scales: (N,3) activated (exp'd); rotations: (N,4) unit
        quats; opacities: (N,) activated (sigmoid'd).
      colors: (N,3) precomputed RGB, or None to evaluate `shs`.
      shs: (N,K,3) SH coefficients (used when colors is None).
      bg_color: (3,) or None (black).
      tile_mask_fn: optional extra per-pair cull, see binning.bin_gaussians.

    Returns dict: render (H,W,3), final_T (H,W), n_contrib (H,W),
      radii (N,), binned (Binned), prep (Preprocessed).
    """
    gx, gy = _grid(camera)
    cfg = config
    cap = cfg.padded_capacity()

    fwd_only = cfg.backend == "pallas" and cfg.pallas_fwd_only
    fused_any = (cfg.backend == "pallas" and cfg.pallas_fused_expand
                 and tile_mask_fn is None and cfg.use_obb)
    fused = fwd_only and fused_any
    fused_train = fused_any and not fwd_only

    if fused_any:
        # Fused paths run the column preprocess (unrolled (N,) math — no
        # (N, 3) lane-waste layouts, measured ~4x faster on TPU) and feed
        # its columns straight into the expand kernel's table builder.
        prep = projection.preprocess_cols(
            means3d, scales, rotations, camera,
            scale_modifier=cfg.scale_modifier, live_mask=live_mask)
        mx_c, my_c = prep.mx, prep.my
        if mean2d_offset is not None:
            # The reference's screenspace_points trick
            # (gaussian_renderer/__init__.py:28-32).
            mx_c = mx_c + mean2d_offset[:, 0]
            my_c = my_c + mean2d_offset[:, 1]
    else:
        prep = projection.preprocess(means3d, scales, rotations, camera,
                                     scale_modifier=cfg.scale_modifier,
                                     live_mask=live_mask)
        if mean2d_offset is not None:
            prep = dataclasses.replace(prep,
                                       mean2d=prep.mean2d + mean2d_offset)
    if colors is None:
        colors = sh.sh_to_rgb(sh_degree, shs, means3d, camera.cam_center)
    colors = jnp.asarray(colors)
    opacities = jnp.asarray(opacities)

    if fused_train:
        # Train-mode fused binning: expand/compact kernel + 5-i64 sort
        # with gid payload; differentiable via the custom-VJP builder
        # (gather semantics). Replaces the XLA expansion + the CAP-sized
        # pack_pairs gather of the unfused path.
        diff_cols = (mx_c, my_c, prep.ca, prep.cb, prep.cc,
                     opacities, colors[:, 0], colors[:, 1], colors[:, 2])
        # stop_gradient: rect/eigen/OBB inputs are non-differentiable by
        # design (pair SELECTION is treated as constant, like the
        # reference); without it, zero cotangents still evaluate their
        # VJP chains, whose guarded rsqrt jacobians can be inf (0 x inf
        # = NaN in d_means).
        aux_cols = jax.tree.map(jax.lax.stop_gradient, (
            prep.rx0.astype(jnp.float32), prep.ry0.astype(jnp.float32),
            jnp.maximum(prep.rx1 - prep.rx0, 1).astype(jnp.float32),
            prep.tnum.astype(jnp.float32),
            prep.v1x, prep.v1y, prep.v2x, prep.v2y,
            prep.len1, prep.len2))
        builder = _fused_train_pair_builder(gx, gy, cap, cfg,
                                            means3d.shape[0])
        packed, seg_start, num_pairs, overflow, _cap3, _cand = builder(
            diff_cols, aux_cols, prep.valid, prep.depth)
        bn = binning.Binned(pair_gauss=None, pair_tile=None,
                            seg_start=seg_start, num_pairs=num_pairs,
                            overflow=overflow, depth_order=None)
    elif fused:
        t1cols = [
            prep.rx0.astype(jnp.float32), prep.ry0.astype(jnp.float32),
            jnp.maximum(prep.rx1 - prep.rx0, 1).astype(jnp.float32),
            prep.tnum.astype(jnp.float32),
            mx_c, my_c,
            prep.v1x, prep.v1y, prep.v2x, prep.v2y,
            prep.len1, prep.len2,
            prep.ca, prep.cb, prep.cc,
            opacities, colors[:, 0], colors[:, 1], colors[:, 2],
        ]
        (packed, seg_start, num_pairs, overflow, _cap2,
         _cand) = binning.bin_fused_ps1(
            t1cols, prep.valid, prep.depth, gx, gy, cap,
            cfg.pallas_interpret, cfg.dummy_slack, cfg.compact_capacity,
            cfg.expand_chunk, cfg.expand_batch,
            sort_exact=cfg.sort_exact_depth,
            drop_invalid=cfg.expand_drop_invalid)
        bn = binning.Binned(pair_gauss=None, pair_tile=None,
                            seg_start=seg_start, num_pairs=num_pairs,
                            overflow=overflow, depth_order=None)
    else:
        bn = binning.bin_gaussians(
            prep, gx, gy, cap, tile_mask_fn=tile_mask_fn,
            use_obb=cfg.use_obb, carry_geometry=fwd_only,
            gauss_attrs=jnp.stack([opacities, colors[:, 0], colors[:, 1],
                                   colors[:, 2]], axis=1) if fwd_only
            else None)

    if cfg.backend == "pallas":
        from fovsplat.ops.pallas import blend_fwd as pk
        if fused_train:
            tile_color, final_T, n_contrib = pk.blend_pallas(
                packed, seg_start[:-1], seg_start[1:], gx, gy,
                cfg.pallas_chunk, cfg.power_cutoff, cfg.pallas_interpret,
                cfg.pallas_bwd_chunk, cfg.pallas_sfx_parts)
        elif fused:
            tile_color, final_T, n_contrib = pk.blend_pallas_fwd_only(
                packed, seg_start[:-1], seg_start[1:], gx, gy,
                cfg.pallas_chunk, cfg.power_cutoff, cfg.pallas_interpret,
                batch=cfg.pallas_blend_batch)
        elif cfg.pallas_fwd_only:
            # Inference path: attributes were carried through the sort
            # (zero post-sort gathers); the kernel handles unaligned
            # segments by flooring DMA windows, so no alignment pass
            # either. Pack into the kernel's quantized row layout
            # (expand_ps1_pallas docstring: ca split-bf16, cb|cc bf16,
            # op/colors u8).
            A = bn.pair_attrs        # [mx, my, ca, cb, cc, op, r, g, b]
            q8 = lambda v, sc: jnp.clip(jnp.floor(v * sc + 0.5),
                                        0.0, 255.0).astype(jnp.int32)
            oprgb = jax.lax.bitcast_convert_type(
                (q8(A[5], 255.0) << 24) | (q8(A[6], 127.5) << 16)
                | (q8(A[7], 127.5) << 8) | q8(A[8], 127.5), jnp.float32)
            from fovsplat.ops.foveated import _trunc_bf16
            ca_hi = _trunc_bf16(A[2])
            from fovsplat.ops.pallas.blend_fov import pack2bf16_xla
            packed = jnp.concatenate(
                [A[0:2],
                 jnp.stack([pack2bf16_xla(ca_hi, A[2] - ca_hi),
                            pack2bf16_xla(A[3], A[4]), oprgb], axis=0),
                 jnp.zeros((pk.ROW - 5, cap), jnp.float32)], axis=0)
            tile_color, final_T, n_contrib = pk.blend_pallas_fwd_only(
                packed, bn.seg_start[:-1], bn.seg_start[1:], gx, gy,
                cfg.pallas_chunk, cfg.power_cutoff, cfg.pallas_interpret,
                batch=cfg.pallas_blend_batch)
        else:
            # Training path: UNALIGNED segments straight from the tile
            # sort — the backward read-merge-writes boundary chunks
            # (blend_fwd._bwd_one_tile), so align_segments' re-spacing
            # gather and its +T*chunk capacity inflation are gone.
            gid = jnp.minimum(bn.pair_gauss, means3d.shape[0] - 1)
            packed = pk.pack_pairs(prep.mean2d[gid], prep.conic[gid],
                                   opacities[gid], colors[gid])
            tile_color, final_T, n_contrib = pk.blend_pallas(
                packed, bn.seg_start[:-1], bn.seg_start[1:], gx, gy,
                cfg.pallas_chunk, cfg.power_cutoff, cfg.pallas_interpret,
                cfg.pallas_bwd_chunk, cfg.pallas_sfx_parts)
    else:
        gid = jnp.minimum(bn.pair_gauss, means3d.shape[0] - 1)
        tile_color, final_T, n_contrib = blend.blend(
            bn.pair_tile, prep.mean2d[gid], prep.conic[gid], opacities[gid],
            colors[gid], bn.seg_start, bn.num_pairs, gx, gy, cfg.chunk,
            cfg.power_cutoff)

    image = blend.tiles_to_image(tile_color, gx, gy, camera.width, camera.height)
    T_img = blend.tiles_to_image(final_T, gx, gy, camera.width, camera.height)
    if bg_color is not None:
        image = image + T_img[..., None] * jnp.asarray(bg_color, image.dtype)
    nc_img = blend.tiles_to_image(n_contrib, gx, gy, camera.width, camera.height)
    return {
        "render": image,
        "final_T": T_img,
        "n_contrib": nc_img,
        "radii": jnp.where(prep.valid, prep.radius, 0),
        "binned": bn,
        "prep": prep,
    }



def _fused_train_pair_builder(gx, gy, cap, cfg, n):
    """custom-VJP wrapper for the train-mode fused binning: forward runs
    the (non-differentiable) expand/compact kernel + tile sort; backward
    treats the pipeline as a generalized gather — per-pair cotangents
    scatter back to per-Gaussian columns by the gid payload the kernel
    carried through the sort (deterministic segment-sum, the TPU answer
    to the reference backward's atomics)."""

    @jax.custom_vjp
    def build(diff_cols, aux_cols, valid, depth):
        t1cols = [aux_cols[0], aux_cols[1], aux_cols[2], aux_cols[3],
                  diff_cols[0], diff_cols[1],
                  aux_cols[4], aux_cols[5], aux_cols[6], aux_cols[7],
                  aux_cols[8], aux_cols[9],
                  diff_cols[2], diff_cols[3], diff_cols[4], diff_cols[5],
                  diff_cols[6], diff_cols[7], diff_cols[8]]
        return binning.bin_fused_ps1(
            t1cols, valid, depth, gx, gy, cap, cfg.pallas_interpret,
            cfg.dummy_slack, cfg.compact_capacity, cfg.expand_chunk,
            cfg.expand_batch, train=True,
            drop_invalid=cfg.expand_drop_invalid)

    def fwd(diff_cols, aux_cols, valid, depth):
        out = build(diff_cols, aux_cols, valid, depth)
        packed, seg_start, num_pairs, overflow, cap3, _cand = out
        return out, (packed[9], num_pairs)

    def bwd(res, ct):
        gid_row, num_pairs = res
        d_packed = ct[0]                          # (16, CAP3)
        cap3 = gid_row.shape[0]
        lane = jnp.arange(cap3, dtype=jnp.int32)
        # Per-Gaussian reduction of the 9 cotangent rows. XLA TPU has no
        # fast scatter: 9x segment_sum costs ~216 ms at 3.4M pairs
        # (scripts/bench_gid_reduce.py). Instead: ONE gid sort, then the
        # windowed interval-reduce kernel over the sorted stream
        # (ops/pallas/segment_reduce) — exact f32, no atomics, ~10x
        # cheaper end to end. Deterministic like the segment_sum it
        # replaces (per-gid sums reduce in sorted-lane order).
        # ZERO-cotangent lanes (everything past each tile's deepest
        # contributing pair — ~2/3 of the stream at bench scale,
        # scripts/probe_bwd_variants.py "bwd-covered rows") ride the
        # SENTINEL id: they sort to the tail and the reduce kernel
        # skips whole dead chunks (skip_from). Adding zeros commutes,
        # so the per-gid sums are unchanged.
        from fovsplat.ops.pallas import segment_reduce as psr
        vals = [jnp.where(lane < num_pairs, d_packed[r], 0.0)
                for r in range(9)]
        alive = vals[0] != 0.0
        for r in range(1, 9):
            alive = alive | (vals[r] != 0.0)
        gid = jnp.where(alive, gid_row.astype(jnp.int32), n)
        srt = jax.lax.sort((gid, *vals), num_keys=1)
        quant = 512 * 16
        pad = (-cap3) % quant
        rows = jnp.concatenate(
            [srt[0][None, :].astype(jnp.float32),
             jnp.stack(srt[1:], axis=0),
             jnp.zeros((6, cap3), jnp.float32)], axis=0)
        if pad:
            tail = jnp.zeros((16, pad), jnp.float32)
            tail = tail.at[0, :].set(jnp.float32(n))
            rows = jnp.concatenate([rows, tail], axis=1)
        n_pad = ((n + 1 + psr.FLUSH - 1) // psr.FLUSH) * psr.FLUSH
        out = psr.reduce_by_sorted_gid(rows, n_pad=n_pad,
                                       interpret=cfg.pallas_interpret,
                                       skip_from=n)
        d_diff = tuple(out[1 + r, :n] for r in range(9))
        d_aux = tuple(jnp.zeros(n, jnp.float32) for _ in range(10))
        return d_diff, d_aux, None, jnp.zeros(n, jnp.float32)

    build.defvjp(fwd, bwd)
    return build


# --------------------------------------------------- ps1 SoA fast path

@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Ps1ModelSoA:
    """Single-level model packed once for the inference render loop
    (counterpart of foveated.FovModelSoA): the fused table-build kernel
    (ops/pallas/build_table mode='ps1') reads the two packed tables
    directly — no per-frame (N, 3) column slicing or SH-layout
    transposes. SH/opacity rows are stored bf16 (the expand kernel's
    attribute table quantizes to bf16/u8 anyway); geometry stays f32."""
    geo_t: Any      # (16, N_pad) f32 [x, y, z, sx, sy, sz, q0..q3, pad]
    col_t: Any      # (64, N_pad) bf16 [SH 3x16 (DC at k=0), opacity, pad]
    n: int = dataclasses.field(metadata=dict(static=True))  # row count


def pack_ps1_model(means3d, scales, rotations, opacities, features_dc,
                   features_rest) -> Ps1ModelSoA:
    """scales/rotations/opacities ACTIVATED; features_dc (N, 1, 3),
    features_rest (N, K-1, 3)."""
    from fovsplat.ops.pallas import build_table as ptab
    n = means3d.shape[0]
    n_pad = ((n + ptab.TCHUNK - 1) // ptab.TCHUNK) * ptab.TCHUNK
    geo = jnp.concatenate(
        [jnp.asarray(means3d, jnp.float32).T,
         jnp.asarray(scales, jnp.float32).T,
         jnp.asarray(rotations, jnp.float32).T,
         jnp.zeros((ptab.GROWS - 10, n), jnp.float32)], axis=0)
    sh48 = jnp.concatenate(
        [jnp.asarray(features_dc, jnp.bfloat16).transpose(2, 1, 0),
         jnp.asarray(features_rest, jnp.bfloat16).transpose(2, 1, 0)],
        axis=1).reshape(48, n)
    col = jnp.concatenate(
        [sh48, jnp.asarray(opacities, jnp.bfloat16)[None, :],
         jnp.zeros((ptab.CROWS - 49, n), jnp.bfloat16)], axis=0)
    return Ps1ModelSoA(
        geo_t=jnp.pad(geo, ((0, 0), (0, n_pad - n))),
        col_t=jnp.pad(col, ((0, 0), (0, n_pad - n))),
        n=n)


def rasterize_ps1_soa(model: Ps1ModelSoA, camera, bg_color=None,
                      sh_degree: int = 3,
                      config: RasterizeConfig = RasterizeConfig()):
    """Inference-only single-level render over a pre-packed SoA model:
    fused table kernel -> fused expand/compact kernel -> quantized tile
    sort -> fwd-only blend. Same kernels as rasterize(pallas_fwd_only)
    minus the per-frame XLA column stage."""
    from fovsplat.ops.pallas import blend_fwd as pk
    from fovsplat.ops.pallas import build_table as ptab
    gx = (camera.width + 15) // 16
    gy = (camera.height + 15) // 16
    cap = config.padded_capacity()
    consts = ptab.make_table_consts(camera)
    dtable, cum, total_f, tnum = ptab.build_fov_table_pallas(
        model.geo_t, model.col_t, consts, n=model.n, grid_x=gx, grid_y=gy,
        width=camera.width, height=camera.height,
        scale_modifier=config.scale_modifier, fov_num=1,
        sh_degree=sh_degree, interpret=config.pallas_interpret,
        mode="ps1")
    n_rows = model.n
    dummy_slack = config.dummy_slack
    if config.compact_table:
        from fovsplat.ops import binning as _bn
        dtable, cum, total_f, n_rows = _bn.compact_prebuilt(
            dtable, tnum, flag_row=45, flag_thresh=0.5,
            interpret=config.pallas_interpret)
        dummy_slack = 0
    (packed, seg_start, num_pairs, overflow, _cap3,
     _cand) = binning.bin_fused_ps1(
        None, None, None, gx, gy, cap, config.pallas_interpret,
        dummy_slack, config.compact_capacity, config.expand_chunk,
        config.expand_batch, prebuilt=(dtable, cum, total_f),
        n_rows=n_rows, sort_exact=config.sort_exact_depth)
    tile_color, final_T, n_contrib = pk.blend_pallas_fwd_only(
        packed, seg_start[:-1], seg_start[1:], gx, gy, config.pallas_chunk,
        config.power_cutoff, config.pallas_interpret,
        batch=config.pallas_blend_batch)
    image = blend.tiles_to_image(tile_color, gx, gy, camera.width,
                                 camera.height)
    T_img = blend.tiles_to_image(final_T, gx, gy, camera.width,
                                 camera.height)
    if bg_color is not None:
        image = image + T_img[..., None] * jnp.asarray(bg_color, image.dtype)
    return {"render": image, "final_T": T_img,
            "num_pairs": num_pairs, "overflow": overflow}
