"""Single-frame multi-chip rendering: Gaussian-sharded preprocess + binning,
tile-sharded blending, all-to-all pair exchange over ICI.

The reference has nothing to port here (single GPU, SURVEY.md §2.5/§5.7);
this is the new distributed design: each device preprocesses and bins its
shard of the Gaussian cloud against ALL tiles, routes the resulting
(tile, depth, attrs) pairs to the device that owns the tile via ONE
`jax.lax.all_to_all` (rides ICI under a Mesh), then every device
depth-sorts and alpha-blends only its own tile rows. Per-destination
traffic uses a fixed capacity with an overflow counter (no dynamic shapes).

Depth correctness across shards: pairs from different source devices
interleave arbitrarily, so the receiver re-sorts its merged pair list by
(tile, view depth) — the same two-key order the single-chip path encodes
with its depth-presort + stable tile sort.

DESIGN DECISION (round 2): multi-chip TRAINING stays pure data-parallel
(parallel/data_parallel.py — replicated params, one view per device,
psum/pmean gradient all-reduce over ICI); the tile-sharded path here is
FORWARD-ONLY (inference / FPS scaling). Rationale:

  * the training workload is view-parallel by construction: prune/mask
    loops iterate over hundreds of cameras per epoch and their prune
    events sweep the whole train set (~190 renders x 5) — embarrassingly
    parallel over views with zero communication beyond the gradient
    all-reduce, which XLA overlaps with the backward;
  * a differentiable all-to-all would need a custom VJP that routes
    per-pair gradients BACK through the pair exchange (transposing
    all_to_all is mechanical — it is its own transpose — but the
    fixed per-destination capacities double as gradient buffers, so
    peak memory grows by the same D x pair-capacity again), for a
    single-frame speedup training does not need: one 1237x822 frame at
    1.16M Gaussians fits one chip with >10x memory headroom;
  * the reference's own training is single-GPU (SURVEY.md §2.5) — DP
    over views is already strictly more capability, and the fwd-only
    tile shard covers the one case DP cannot (one frame too big or too
    slow for one chip, e.g. 8K foveated output).

If a future model breaks the one-frame-per-chip assumption, the upgrade
path is: keep binning Gaussian-sharded, give the all-to-all a custom VJP
(gradient all_to_all with the transposed split/concat axes), and
segment-sum per-Gaussian gradients on the HOME shard of each Gaussian —
no new collectives beyond a second all_to_all in the backward.
tests/test_parallel.py pins both halves of the decision: the DP step
reduces identically to single-device, and the fwd tile-sharded render
matches the single-device image.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from fovsplat.ops import binning, blend, projection
from fovsplat.ops.projection import TILE

NATTR = 11   # mx my ca cb cc op r g b depth tile


def _device_render(m, s, q, o, c, camera, gx, gy, ndev, tiles_per_dev,
                   cap_local, c2, chunk, power_cutoff, axis,
                   backend="xla", interpret=False):
    num_tiles = gx * gy
    prep = projection.preprocess(m, s, q, camera)
    bn = binning.bin_gaussians(prep, gx, gy, cap_local)
    gid = jnp.minimum(bn.pair_gauss, m.shape[0] - 1)
    tile = bn.pair_tile
    depth = jnp.where(tile < num_tiles, prep.depth[gid], jnp.inf)

    attrs = jnp.stack([
        prep.mean2d[gid, 0], prep.mean2d[gid, 1],
        prep.conic[gid, 0], prep.conic[gid, 1], prep.conic[gid, 2],
        o[gid], c[gid, 0], c[gid, 1], c[gid, 2],
        depth, tile.astype(jnp.float32)], axis=-1)        # (CAPL, NATTR)

    # Destination of tile t is t // tiles_per_dev; the tile-sorted list is
    # therefore destination-contiguous.
    dest_bounds = jnp.searchsorted(
        tile, jnp.arange(ndev + 1, dtype=jnp.int32) * tiles_per_dev,
        side='left').astype(jnp.int32)
    idx = dest_bounds[:-1, None] + jnp.arange(c2, dtype=jnp.int32)[None, :]
    valid = idx < dest_bounds[1:, None]
    gathered = attrs[jnp.minimum(idx, cap_local - 1)]     # (ndev, c2, NATTR)
    sentinel = jnp.zeros((1, 1, NATTR), jnp.float32).at[0, 0, 10].set(
        float(num_tiles)).at[0, 0, 9].set(jnp.inf)
    send = jnp.where(valid[:, :, None], gathered, sentinel)
    send_overflow = jnp.sum(
        jnp.maximum(dest_bounds[1:] - dest_bounds[:-1] - c2, 0))

    # The collective: pair blocks ride ICI to their tile owners.
    recv = jax.lax.all_to_all(send, axis, split_axis=0, concat_axis=0)
    recv = recv.reshape(ndev * c2, NATTR)

    # Re-sort merged pairs by (tile, depth).
    r_tile = recv[:, 10].astype(jnp.int32)
    res = jax.lax.sort((r_tile, recv[:, 9], recv[:, 0], recv[:, 1],
                        recv[:, 2], recv[:, 3], recv[:, 4], recv[:, 5],
                        recv[:, 6], recv[:, 7], recv[:, 8]),
                       num_keys=2, is_stable=True)
    r_tile = res[0]
    mean2d = jnp.stack([res[2], res[3]], -1)
    conic = jnp.stack([res[4], res[5], res[6]], -1)
    opac = res[7]
    col3 = jnp.stack([res[8], res[9], res[10]], -1)

    seg_start = jnp.searchsorted(
        r_tile, jnp.arange(num_tiles + 1, dtype=jnp.int32),
        side='left').astype(jnp.int32)
    num_pairs = seg_start[-1]

    if backend == "pallas":
        # Production kernel on each shard's local (tile-sorted) list —
        # the scaling path blends with the same fwd-only Pallas kernel
        # as the single-chip route (quantized row layout,
        # expand_ps1_pallas docstring).
        from fovsplat.ops.pallas import blend_fwd as pk
        from fovsplat.ops.pallas.blend_fov import pack2bf16_xla
        q8 = lambda v, sc: jnp.clip(jnp.floor(v * sc + 0.5),
                                    0.0, 255.0).astype(jnp.int32)
        oprgb = jax.lax.bitcast_convert_type(
            (q8(opac, 255.0) << 24) | (q8(col3[:, 0], 127.5) << 16)
            | (q8(col3[:, 1], 127.5) << 8) | q8(col3[:, 2], 127.5),
            jnp.float32)
        ca = conic[:, 0]
        from fovsplat.ops.foveated import _trunc_bf16
        ca_hi = _trunc_bf16(ca)
        packed = jnp.stack(
            [mean2d[:, 0], mean2d[:, 1],
             pack2bf16_xla(ca_hi, ca - ca_hi),
             pack2bf16_xla(conic[:, 1], conic[:, 2]), oprgb]
            + [jnp.zeros_like(oprgb)] * (pk.ROW - 5), axis=0)
        tile_color, final_T, _ = pk.blend_pallas_fwd_only(
            packed, seg_start[:-1], seg_start[1:], gx, gy,
            min(chunk, 256), power_cutoff, interpret)
    else:
        tile_color, final_T, _ = blend._blend_forward_impl(
            r_tile, mean2d, conic, opac, col3, seg_start, num_pairs,
            gx, gy, chunk, power_cutoff)

    # Keep only my tile rows; all_gather assembles the full tile-major image.
    my_dev = jax.lax.axis_index(axis)
    base = my_dev * tiles_per_dev
    rows = jnp.arange(tiles_per_dev) + base
    rows = jnp.minimum(rows, num_tiles - 1)
    my_color = tile_color[rows]
    my_T = final_T[rows]
    all_color = jax.lax.all_gather(my_color, axis, axis=0)
    all_T = jax.lax.all_gather(my_T, axis, axis=0)
    all_color = all_color.reshape(ndev * tiles_per_dev, -1, 3)[:num_tiles]
    all_T = all_T.reshape(ndev * tiles_per_dev, -1)[:num_tiles]
    return all_color, all_T, bn.overflow + send_overflow


def render_tile_sharded(mesh: Mesh, means3d, scales, rotations, opacities,
                        colors, camera, pair_capacity: int = 1 << 18,
                        per_dest_capacity: int | None = None,
                        chunk: int = 1024, power_cutoff: float = -4.5,
                        axis: str = "data", bg_color=None,
                        backend: str = "xla", interpret: bool = False):
    """Render one view with the Gaussian cloud sharded over `axis`.

    All per-Gaussian arrays are sharded on axis 0 (N divisible by mesh
    size). Returns (image (H,W,3) replicated, aux dict)."""
    ndev = mesh.shape[axis]
    gx = (camera.width + TILE - 1) // TILE
    gy = (camera.height + TILE - 1) // TILE
    num_tiles = gx * gy
    tiles_per_dev = -(-num_tiles // ndev)
    cap_local = pair_capacity // ndev
    c2 = per_dest_capacity or max(2 * cap_local // ndev, 256)

    def fn(m, s, q, o, c):
        return _device_render(m, s, q, o, c, camera, gx, gy, ndev,
                              tiles_per_dev, cap_local, c2, chunk,
                              power_cutoff, axis, backend=backend,
                              interpret=interpret)

    shard = P(axis)
    rep = P()
    mapped = jax.shard_map(
        fn, mesh=mesh,
        in_specs=(shard, shard, shard, shard, shard),
        out_specs=(rep, rep, rep), check_vma=False)
    tile_color, final_T, overflow = mapped(means3d, scales, rotations,
                                           opacities, colors)
    image = blend.tiles_to_image(tile_color, gx, gy, camera.width,
                                 camera.height)
    T_img = blend.tiles_to_image(final_T, gx, gy, camera.width,
                                 camera.height)
    if bg_color is not None:
        image = image + T_img[..., None] * jnp.asarray(bg_color)
    return image, {"final_T": T_img, "overflow": overflow}
