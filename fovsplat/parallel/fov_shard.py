"""Multi-chip FOVEATED rendering: the production fused pipeline sharded
over Gaussians, with a tile-major all-to-all pair exchange.

This extends parallel/tile_shard.py (single-level, XLA binning) to the
flagship foveated renderer (reference N6,
diff-gaussian-rasterization_fov_pcheck_obb/cuda_rasterizer/
rasterizer_impl.cu:617-941): each device runs the PRODUCTION kernels on
its Gaussian shard — the XLA column preprocess + level-rect clip
(ops/foveated.fov_soa_cols), the fused Pallas expand/OBB/level-cull/
compact kernel (ops/pallas/expand_fov) and the fused (tile|depth) key
sort — then routes its quantized pair rows to tile owners with ONE
`jax.lax.all_to_all` over ICI, and every owner re-sorts its merged rows
by the exact (key, dbits) pair and blends its tiles with the dual-
transmittance Pallas kernel (ops/pallas/blend_fov).

Order correctness across shards: every shard sorts with the EXACT f32
depth secondary key (sort_exact — expand_fov.fused_key32), the exchange
carries (key, dbits) with the rows, and the receiving owner re-sorts the
merged list with the same two keys — so the blend order is bitwise the
single-chip exact-sort order regardless of how shard blocks interleave.

Like tile_shard, this path is FORWARD-ONLY (inference / FPS scaling);
training scales by data parallelism over views (parallel/data_parallel
— design rationale in tile_shard's module docstring). Per-destination
traffic uses a fixed capacity with an overflow counter; capacity misses
are reported, never silently dropped.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from fovsplat.ops import foveation
from fovsplat.ops.blend import PIX, tiles_to_image
from fovsplat.ops.foveated import FovModelSoA, _bin_fov_fused, fov_soa_cols
from fovsplat.ops.foveation import FoveationConfig
from fovsplat.ops.projection import TILE

NROW = 8     # exchange rows: [key, dbits, mx, my, P_caca, P_cbcc, OPRG, BRGB]


def _f32(i):
    return jax.lax.bitcast_convert_type(i, jnp.float32)


def _i32(f):
    return jax.lax.bitcast_convert_type(f, jnp.int32)


def render_fov_tile_sharded(mesh: Mesh, model: FovModelSoA, camera, gaze,
                            alpha: float = 0.05, blending: bool = True,
                            pair_capacity: int = 1 << 18,
                            compact_capacity: int | None = None,
                            per_dest_capacity: int | None = None,
                            expand_chunk: int = 256, expand_batch: int = 8,
                            blend_chunk: int = 256,
                            power_cutoff: float = -4.5,
                            axis: str = "data", bg_color=None,
                            sh_degree: int = 3, interpret: bool = False,
                            fov_cfg: FoveationConfig = FoveationConfig()):
    """Foveated render with the Gaussian cloud sharded over `axis`.

    model: FovModelSoA whose N axis is divisible by the mesh size (pad
    with hl = -1 rows via pad_fov_model otherwise). Returns
    (image (H, W, 3) replicated, aux dict with overflow/num_pairs).

    pair_capacity / compact_capacity are GLOBAL (divided across shards);
    per_dest_capacity bounds each (source, dest) block of the all-to-all
    (default: 2x the balanced share).
    """
    ndev = mesh.shape[axis]
    gx = (camera.width + TILE - 1) // TILE
    gy = (camera.height + TILE - 1) // TILE
    num_tiles = gx * gy
    tiles_per_dev = -(-num_tiles // ndev)
    L = fov_cfg.fov_num
    L_lay = model.dc_t.shape[1]
    n = model.xyz.shape[0]
    assert n % ndev == 0, (n, ndev, "pad the model to a multiple of the "
                           "mesh size (hl = -1 rows are dead)")
    cap_local = max(pair_capacity // ndev, expand_chunk * expand_batch)
    compact_local = (None if compact_capacity is None
                     else max(compact_capacity // ndev, 4096))
    c2 = per_dest_capacity or max(2 * cap_local // ndev, 256)

    from fovsplat.ops.pallas import expand_fov as pex
    db = 31 - pex.tile_bits(num_tiles)

    # Replicated per-gaze tile state (cheap per-tile math, identical on
    # every device): levels, blending masks, smoothstep weights, and the
    # per-level clip bboxes.
    gaze = jnp.asarray(gaze, jnp.float32)
    levels = foveation.compute_tile_levels(gaze, camera.width,
                                           camera.height, alpha, fov_cfg)
    grad_x, grad_y, _, tile_blend = foveation.compute_tile_level_infos(
        levels, camera.width, camera.height, fov_cfg)
    if not blending:
        tile_blend = jnp.zeros_like(tile_blend)
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
    bb_arr = jnp.stack([jnp.stack(b) for b in bb])           # (L, 4)

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
    tile_act = jnp.stack([
        l1_active.astype(jnp.float32), l2_active.astype(jnp.float32),
        jnp.zeros_like(l1_active, jnp.float32),
        jnp.zeros_like(l1_active, jnp.float32)], axis=-1)
    x = jnp.abs(est - (l1_i[:, None].astype(jnp.float32)
                       + fov_cfg.start_blend))
    x = jnp.clip(x / fov_cfg.blend_width, 0.0, 1.0)
    blend_T = 3 * x * x - 2 * x * x * x                       # (T, PIX)
    # Pad per-tile state to ndev * tiles_per_dev rows so every owner's
    # dynamic tile-range slice is in bounds (the padding tiles' outputs
    # are dropped after the all_gather).
    t_pad_rows = ndev * tiles_per_dev - num_tiles
    if t_pad_rows:
        tile_act = jnp.pad(tile_act, ((0, t_pad_rows), (0, 0), (0, 0)))
        blend_T = jnp.pad(blend_T, ((0, t_pad_rows), (0, 0)))
        tile_blend_p = jnp.pad(tile_blend, ((0, t_pad_rows),))
    else:
        tile_blend_p = tile_blend

    def device_fn(xyz, scales, rotations, rest_t, dc_t, opac_t, hl,
                  bb_a, lv, t_act, bl_T, t_blend):
        bb_l = [(bb_a[h, 0], bb_a[h, 1], bb_a[h, 2], bb_a[h, 3])
                for h in range(L)]
        t1cols, t2cols, valid, depth = fov_soa_cols(
            xyz, scales, rotations, rest_t, dc_t, opac_t, hl, camera,
            bb_l, L, L_lay, sh_degree)
        (packed, _seg, num_pairs, overflow, cap3, _tot,
         (key, dbits)) = _bin_fov_fused(
            t1cols, t2cols, valid, depth, gaze, alpha, gx, gy, cap_local,
            camera, fov_cfg, interpret, None, compact_local,
            expand_chunk, expand_batch, sort_exact=True,
            fov_layout=L_lay, return_keys=True)

        # Destination of tile t is t // tiles_per_dev; the key-sorted pair
        # list is destination-contiguous (key = tile << db | depth_hi).
        bounds = (jnp.arange(ndev + 1, dtype=jnp.int32)
                  * tiles_per_dev) << jnp.int32(db)
        dest_bounds = jnp.minimum(
            jnp.searchsorted(key, bounds, side='left').astype(jnp.int32),
            num_pairs)        # clamp: sentinel keys are not real pairs
        rows = jnp.stack([_f32(key), _f32(dbits), packed[0], packed[1],
                          packed[2], packed[3], packed[4], packed[5]],
                         axis=-1)                             # (cap3, 8)
        idx = dest_bounds[:-1, None] + jnp.arange(c2,
                                                  dtype=jnp.int32)[None, :]
        valid_s = idx < dest_bounds[1:, None]
        gathered = rows[jnp.minimum(idx, cap3 - 1)]           # (ndev, c2, 8)
        sent = jnp.zeros((1, 1, NROW), jnp.float32).at[0, 0, 0].set(
            _f32(jnp.int32(num_tiles << db)))
        send = jnp.where(valid_s[:, :, None], gathered, sent)
        send_overflow = jnp.sum(
            jnp.maximum(dest_bounds[1:] - dest_bounds[:-1] - c2, 0))

        recv = jax.lax.all_to_all(send, axis, split_axis=0, concat_axis=0)
        recv = recv.reshape(ndev * c2, NROW)

        # Exact global order at the owner: 2-key (fused key, exact depth
        # bits) sort of the merged rows.
        res = jax.lax.sort(
            (_i32(recv[:, 0]), _i32(recv[:, 1]), recv[:, 2], recv[:, 3],
             recv[:, 4], recv[:, 5], recv[:, 6], recv[:, 7]), num_keys=2)
        r_key = res[0]
        packed_rx = jnp.concatenate(
            [jnp.stack(res[2:], axis=0),
             jnp.zeros((2, ndev * c2), jnp.float32)], axis=0)  # (8, D*c2)

        # Blend ONLY the owned tile subrange (blend_fov_pallas tile0/
        # n_tiles): non-owned tiles have no pairs here, but their empty
        # segments would still cost per-tile bookkeeping (~2.3 us/tile
        # on a v5e — (D-1)/D of the grid wasted per device).
        my_dev = jax.lax.axis_index(axis)
        t0 = my_dev * tiles_per_dev
        bounds = ((t0 + jnp.arange(tiles_per_dev + 1, dtype=jnp.int32))
                  << jnp.int32(db))
        seg_loc = jnp.searchsorted(r_key, bounds,
                                   side='left').astype(jnp.int32)
        act_loc = jax.lax.dynamic_slice_in_dim(t_act, t0, tiles_per_dev, 0)

        from fovsplat.ops.pallas import blend_fov as pkf
        c1, t1, c2_, t2 = pkf.blend_fov_pallas(
            packed_rx, seg_loc[:-1], seg_loc[1:], act_loc, gx, gy,
            blend_chunk, power_cutoff, interpret, prefix_mode="scan",
            tile0=t0, n_tiles=tiles_per_dev)

        bg = (jnp.zeros(3, jnp.float32) if bg_color is None
              else jnp.asarray(bg_color, jnp.float32))
        c1 = c1 + t1[..., None] * bg
        c2_ = c2_ + t2[..., None] * bg
        blw = jax.lax.dynamic_slice_in_dim(bl_T, t0, tiles_per_dev, 0)
        tbl = jax.lax.dynamic_slice_in_dim(t_blend, t0, tiles_per_dev, 0)
        l1_w = 1.0 - blw
        merged = c1 * l1_w[..., None] + c2_ * (1.0 - l1_w[..., None])
        my_color = jnp.where(tbl[:, None, None], merged, c1)

        all_color = jax.lax.all_gather(my_color, axis, axis=0)
        all_color = all_color.reshape(ndev * tiles_per_dev,
                                      PIX, 3)[:num_tiles]
        ovf = jax.lax.psum(overflow + send_overflow, axis)
        np_tot = jax.lax.psum(seg_loc[-1] - seg_loc[0], axis)
        return all_color, ovf, np_tot

    shard = P(axis)
    last = P(None, axis)      # (..., N)-last tables shard on the lane axis
    rep = P()
    mapped = jax.shard_map(
        device_fn, mesh=mesh,
        in_specs=(shard, shard, shard, P(None, None, axis),
                  P(None, None, axis), last, shard,
                  rep, rep, rep, rep, rep),
        out_specs=(rep, rep, rep), check_vma=False)
    tile_color, overflow, num_pairs = mapped(
        model.xyz, model.scales, model.rotations, model.rest_t,
        model.dc_t, model.opac_t, model.hl,
        bb_arr, levels, tile_act, blend_T, tile_blend_p)
    image = tiles_to_image(tile_color, gx, gy, camera.width, camera.height)
    return image, {"overflow": overflow, "num_pairs": num_pairs,
                   "tile_levels": levels}


def pad_fov_model(model: FovModelSoA, ndev: int) -> FovModelSoA:
    """Pad the model's N axis to a multiple of ndev with dead rows
    (hl = -1: fov_soa_cols marks them invalid)."""
    import dataclasses
    n = model.xyz.shape[0]
    pad = (-n) % ndev
    if pad == 0:
        return model
    pN = lambda a: jnp.pad(a, [(0, pad)] + [(0, 0)] * (a.ndim - 1))
    pL = lambda a: jnp.pad(a, [(0, 0)] * (a.ndim - 1) + [(0, pad)])
    return dataclasses.replace(
        model, xyz=pN(model.xyz), scales=pN(model.scales),
        rotations=pN(model.rotations), rest_t=pL(model.rest_t),
        dc_t=pL(model.dc_t), opac_t=pL(model.opac_t),
        hl=jnp.concatenate([model.hl, jnp.full((pad,), -1.0, jnp.float32)]),
        geo_t=model.geo_t, col_t=model.col_t)
