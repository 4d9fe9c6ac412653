"""Pallas TPU forward blend kernel.

Replaces the XLA scatter-based blend loop (fovsplat.ops.blend) on the hot
path — the TPU counterpart of the reference's renderCUDA
(..._pcheck_obb_sum/cuda_rasterizer/forward.cu:298-426). One grid program
per 16x16 tile:

  * the tile's segment of the tile-sorted pair list is streamed from HBM in
    fixed-size chunks via double-buffered async DMA,
  * each chunk evaluates alpha for all 256 pixels on the VPU and applies the
    exact sequential early-exit semantics in closed form (exclusive cumprod
    along the chunk axis — see fovsplat.ops.blend for the derivation),
  * the per-tile loop exits early once every pixel is saturated
    (T < 1e-4), mirroring the CUDA block-vote break.

Pair attributes are packed as one (CAP, 16) f32 row matrix
[mx, my, ca, cb, cc, op, r, g, b, ...pad] so each chunk is a single
contiguous DMA.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fovsplat.ops.projection import TILE

PIX = TILE * TILE
ALPHA_MIN = 1.0 / 255.0
ALPHA_MAX = 0.99
T_EPS = 1e-4
ROW = 16          # packed floats per pair


def pack_pairs(mean2d, conic, opacity, color):
    """(CAP,2),(CAP,3),(CAP,),(CAP,3) -> (CAP, ROW) f32."""
    cap = mean2d.shape[0]
    out = jnp.zeros((cap, ROW), jnp.float32)
    out = out.at[:, 0:2].set(mean2d)
    out = out.at[:, 2:5].set(conic)
    out = out.at[:, 5].set(opacity)
    out = out.at[:, 6:9].set(color)
    return out


def _kernel(seg_start_ref, pairs_hbm, out_ref, nc_ref, buf, sem,
            *, grid_x: int, chunk: int, power_cutoff: float, cap: int):
    t = pl.program_id(0)
    start = seg_start_ref[t]
    end = seg_start_ref[t + 1]
    n = end - start

    tile_x = (t % grid_x).astype(jnp.float32) * TILE
    tile_y = (t // grid_x).astype(jnp.float32) * TILE
    pix_i = jax.lax.broadcasted_iota(jnp.int32, (1, PIX), 1)
    lx = (pix_i % TILE).astype(jnp.float32)
    ly = (pix_i // TILE).astype(jnp.float32)
    px = tile_x + lx                      # (1, PIX)
    py = tile_y + ly

    num_chunks = pl.cdiv(n, chunk)

    def get_dma(slot, k):
        src_start = jnp.minimum(start + k * chunk, cap - chunk)
        return pltpu.make_async_copy(
            pairs_hbm.at[pl.ds(src_start, chunk), :],
            buf.at[slot],
            sem.at[slot],
        )

    @pl.when(num_chunks > 0)
    def _prefetch():
        get_dma(0, 0).start()

    def body(state):
        k, T_pix, color, nc = state

        @pl.when(k + 1 < num_chunks)
        def _():
            get_dma((k + 1) % 2, k + 1).start()

        get_dma(k % 2, k).wait()
        data = buf[k % 2]                 # (chunk, ROW)

        # Tail chunks clamp their DMA window; valid rows are those whose
        # global id lies inside this tile's segment.
        src_start = jnp.minimum(start + k * chunk, cap - chunk)
        row_idx = jax.lax.broadcasted_iota(jnp.int32, (chunk, 1), 0)
        gid = src_start + row_idx
        in_seg = (gid >= start) & (gid < end)

        mx = data[:, 0:1]
        my = data[:, 1:2]
        ca = data[:, 2:3]
        cb = data[:, 3:4]
        cc = data[:, 4:5]
        op = data[:, 5:6]
        dx = mx - px                      # (chunk, PIX)
        dy = my - py
        power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
        G = jnp.exp(jnp.minimum(power, 0.0))
        alpha = jnp.minimum(ALPHA_MAX, op * G)
        ok = ((power <= 0.0) & (power >= power_cutoff)
              & (alpha >= ALPHA_MIN) & in_seg)
        a_eff = jnp.where(ok, alpha, 0.0)

        one_minus = 1.0 - a_eff
        logs = jnp.log1p(-a_eff)
        # Prefix sums along the chunk axis as strictly-lower-triangular
        # matmuls — cumsum/cumprod aren't lowered by Mosaic, and the MXU is
        # idle here anyway.
        tri = (jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 0)
               > jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 1)
               ).astype(jnp.float32)
        excl = jnp.dot(tri, logs, preferred_element_type=jnp.float32)
        T_row = T_pix * jnp.exp(excl)                        # T before row j
        incl = T_row * one_minus
        trigger = (a_eff > 0) & (incl < T_EPS)
        done_before = jnp.dot(tri, trigger.astype(jnp.float32),
                              preferred_element_type=jnp.float32) > 0
        contribute = (a_eff > 0) & ~trigger & ~done_before
        weight = jnp.where(contribute, a_eff * T_row, 0.0)   # (chunk, PIX)

        r = jnp.sum(weight * data[:, 6:7], axis=0)           # (PIX,)
        g = jnp.sum(weight * data[:, 7:8], axis=0)
        b = jnp.sum(weight * data[:, 8:9], axis=0)
        color = color + jnp.stack([r, g, b], axis=0)         # (3, PIX)

        log_delta = jnp.sum(jnp.where(contribute, logs, 0.0),
                            axis=0, keepdims=True)           # (1, PIX)
        T_pix = T_pix * jnp.exp(log_delta)

        rank = (gid - start + 1).astype(jnp.float32)         # (chunk, 1)
        nc = jnp.maximum(nc, jnp.max(jnp.where(contribute, rank, 0.0),
                                     axis=0, keepdims=True))
        return k + 1, T_pix, color, nc

    def cond(state):
        k, T_pix, _, _ = state
        return (k < num_chunks) & (jnp.max(T_pix) >= T_EPS)

    T0 = jnp.ones((1, PIX), jnp.float32)
    C0 = jnp.zeros((3, PIX), jnp.float32)
    N0 = jnp.zeros((1, PIX), jnp.float32)
    _, T_pix, color, nc = jax.lax.while_loop(cond, body, (jnp.int32(0), T0, C0, N0))

    out_ref[0, 0:3, :] = color
    out_ref[0, 3, :] = T_pix[0]
    nc_ref[0, 0, :] = nc[0].astype(jnp.int32)


@functools.partial(jax.jit,
                   static_argnames=("grid_x", "grid_y", "chunk",
                                    "power_cutoff", "interpret"))
def blend_fwd_pallas(pair_data, seg_start, grid_x: int, grid_y: int,
                     chunk: int = 256, power_cutoff: float = -4.5,
                     interpret: bool = False):
    """pair_data (CAP, ROW) f32 tile-sorted; seg_start (T+1,) i32.

    Returns (tile_color [T,PIX,3], final_T [T,PIX], n_contrib [T,PIX] i32).
    """
    num_tiles = grid_x * grid_y
    cap = pair_data.shape[0]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(num_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[
            pl.BlockSpec((1, 4, PIX), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, PIX), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, chunk, ROW), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = functools.partial(_kernel, grid_x=grid_x, chunk=chunk,
                               power_cutoff=power_cutoff, cap=cap)
    out, nc = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((num_tiles, 4, PIX), jnp.float32),
            jax.ShapeDtypeStruct((num_tiles, 1, PIX), jnp.int32),
        ],
        interpret=interpret,
    )(seg_start, pair_data)
    tile_color = jnp.moveaxis(out[:, 0:3, :], 1, 2)   # (T, PIX, 3)
    final_T = out[:, 3, :]
    return tile_color, final_T, nc[:, 0, :]
