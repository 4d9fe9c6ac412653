"""Pallas TPU blend kernels (forward + backward) with custom VJP.

TPU counterpart of the reference renderCUDA forward
(..._pcheck_obb_sum/cuda_rasterizer/forward.cu:298-426) and backward
(backward.cu:400-557). One grid program per 16x16 tile:

  * the tile's segment of the tile-sorted pair list is streamed from HBM in
    fixed-size chunks via double-buffered async DMA (segments are
    chunk-aligned — binning.align_segments — so a chunk never straddles two
    tiles and the backward can DMA per-chunk gradient slices race-free),
  * alpha for all 256 pixels is evaluated on the VPU; the sequential
    early-exit semantics are applied in closed form with prefix sums
    computed as lower-triangular matmuls on the MXU (cumsum/cumprod are not
    lowered by Mosaic),
  * the forward loop exits once every pixel saturates (T < 1e-4) — the CUDA
    block-vote break; the backward walks chunks back-to-front recovering T
    by division from the saved final_T (backward.cu:503) and contribution
    membership from the saved per-pixel n_contrib.

Pair attributes are packed as one (CAP, 16) f32 row matrix
[mx, my, ca, cb, cc, op, r, g, b, pad...]; gradients come back in the same
packed layout and are unpacked/segment-summed by the caller's autodiff.
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


def unpack_grads(g):
    """(CAP, ROW) -> (d_mean2d, d_conic, d_opacity, d_color)."""
    return g[:, 0:2], g[:, 2:5], g[:, 5], g[:, 6:9]


def _tri_strict(chunk):
    return (jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 0)
            > jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 1)
            ).astype(jnp.float32)


def _tri_incl(chunk):
    return (jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 0)
            >= jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 1)
            ).astype(jnp.float32)


def _pixel_coords(t, grid_x):
    pix_i = jax.lax.broadcasted_iota(jnp.int32, (1, PIX), 1)
    lx = (pix_i % TILE).astype(jnp.float32)
    ly = (pix_i // TILE).astype(jnp.float32)
    px = (t % grid_x).astype(jnp.float32) * TILE + lx
    py = (t // grid_x).astype(jnp.float32) * TILE + ly
    return px, py


def _alpha_from_chunk(data, px, py, power_cutoff):
    mx = data[:, 0:1]
    my = data[:, 1:2]
    ca = data[:, 2:3]
    cb = data[:, 3:4]
    cc = data[:, 4:5]
    op = data[:, 5:6]
    dx = mx - px
    dy = my - py
    power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
    G = jnp.exp(jnp.minimum(power, 0.0))
    alpha = jnp.minimum(ALPHA_MAX, op * G)
    geo_ok = (power <= 0.0) & (power >= power_cutoff)
    return alpha, geo_ok, G, dx, dy


# --------------------------------------------------------------- forward

def _fwd_kernel(seg_start_ref, seg_end_ref, pairs_hbm, out_ref, nc_ref,
                buf, sem, *, grid_x: int, chunk: int, power_cutoff: float,
                cap: int):
    t = pl.program_id(0)
    start = seg_start_ref[t]
    end = seg_end_ref[t]
    n = end - start
    px, py = _pixel_coords(t, grid_x)
    num_chunks = pl.cdiv(n, chunk)

    def get_dma(slot, k):
        src = jnp.minimum(start + k * chunk, cap - chunk)
        return pltpu.make_async_copy(pairs_hbm.at[pl.ds(src, chunk), :],
                                     buf.at[slot], sem.at[slot])

    @pl.when(num_chunks > 0)
    def _():
        get_dma(0, 0).start()

    def body(state):
        k, T_pix, color, nc = state

        @pl.when(k + 1 < num_chunks)
        def _():
            get_dma((k + 1) % 2, k + 1).start()

        get_dma(k % 2, k).wait()
        data = buf[k % 2]
        src = jnp.minimum(start + k * chunk, cap - chunk)
        gid = src + jax.lax.broadcasted_iota(jnp.int32, (chunk, 1), 0)
        in_seg = (gid >= start) & (gid < end)

        alpha, geo_ok, _, _, _ = _alpha_from_chunk(data, px, py, power_cutoff)
        ok = geo_ok & (alpha >= ALPHA_MIN) & in_seg
        a_eff = jnp.where(ok, alpha, 0.0)

        one_minus = 1.0 - a_eff
        logs = jnp.log1p(-a_eff)
        tri = _tri_strict(chunk)
        excl = jnp.dot(tri, logs, preferred_element_type=jnp.float32)
        T_row = T_pix * jnp.exp(excl)
        incl = T_row * one_minus
        trigger = (a_eff > 0) & (incl < T_EPS)
        done_before = jnp.dot(tri, trigger.astype(jnp.float32),
                              preferred_element_type=jnp.float32) > 0
        contribute = (a_eff > 0) & ~trigger & ~done_before
        weight = jnp.where(contribute, a_eff * T_row, 0.0)

        r = jnp.sum(weight * data[:, 6:7], axis=0)
        g = jnp.sum(weight * data[:, 7:8], axis=0)
        b = jnp.sum(weight * data[:, 8:9], axis=0)
        color = color + jnp.stack([r, g, b], axis=0)

        log_delta = jnp.sum(jnp.where(contribute, logs, 0.0), axis=0,
                            keepdims=True)
        T_pix = T_pix * jnp.exp(log_delta)

        rank = (gid - start + 1).astype(jnp.float32)
        nc = jnp.maximum(nc, jnp.max(jnp.where(contribute, rank, 0.0),
                                     axis=0, keepdims=True))
        return k + 1, T_pix, color, nc

    def cond(state):
        k, T_pix, _, _ = state
        return (k < num_chunks) & (jnp.max(T_pix) >= T_EPS)

    init = (jnp.int32(0), jnp.ones((1, PIX), jnp.float32),
            jnp.zeros((3, PIX), jnp.float32), jnp.zeros((1, PIX), jnp.float32))
    _, T_pix, color, nc = jax.lax.while_loop(cond, body, init)

    out_ref[0, 0:3, :] = color
    out_ref[0, 3, :] = T_pix[0]
    nc_ref[0, 0, :] = nc[0].astype(jnp.int32)


def _forward(pair_data, seg_start, seg_end, grid_x: int, grid_y: int,
             chunk: int, power_cutoff: float, interpret: bool):
    num_tiles = grid_x * grid_y
    cap = pair_data.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(num_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[
            pl.BlockSpec((1, 4, PIX), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, PIX), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[pltpu.VMEM((2, chunk, ROW), jnp.float32),
                        pltpu.SemaphoreType.DMA((2,))],
    )
    kernel = functools.partial(_fwd_kernel, grid_x=grid_x, chunk=chunk,
                               power_cutoff=power_cutoff, cap=cap)
    out, nc = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((num_tiles, 4, PIX), jnp.float32),
                   jax.ShapeDtypeStruct((num_tiles, 1, PIX), jnp.int32)],
        interpret=interpret,
    )(seg_start, seg_end, pair_data)
    return out, nc


# --------------------------------------------------------------- backward

def _bwd_kernel(seg_start_ref, seg_end_ref, pairs_hbm, fin_ref, grads_hbm,
                buf, gbuf, sem, gsem, *, grid_x: int, chunk: int,
                power_cutoff: float, cap: int):
    """fin_ref: blocked (1, 8, PIX) per tile = [g_r, g_g, g_b, g_T, final_T,
    n_contrib, pad, pad]. grads_hbm: (CAP, ROW) output, written per chunk.

    Mirrors the reference backward (backward.cu:400-557): back-to-front
    walk recovering T by division, suffix color accumulators, per-pair
    gradients for color/opacity/conic/mean2d.
    """
    t = pl.program_id(0)
    start = seg_start_ref[t]
    end = seg_end_ref[t]
    n = end - start
    px, py = _pixel_coords(t, grid_x)
    num_chunks = pl.cdiv(n, chunk)

    g_pix = fin_ref[0, 0:3, :]               # (3, PIX)
    gT = fin_ref[0, 3:4, :]                  # (1, PIX)
    Tf = fin_ref[0, 4:5, :]
    nc = fin_ref[0, 5:6, :]

    def get_dma(slot, k):
        src = jnp.minimum(start + k * chunk, cap - chunk)
        return pltpu.make_async_copy(pairs_hbm.at[pl.ds(src, chunk), :],
                                     buf.at[slot], sem.at[slot])

    @pl.when(num_chunks > 0)
    def _():
        get_dma((num_chunks - 1) % 2, num_chunks - 1).start()

    def body(state):
        k, T_back, S = state                 # k counts down num_chunks..1
        kk = k - 1

        @pl.when(kk > 0)
        def _():
            get_dma((kk - 1) % 2, kk - 1).start()

        get_dma(kk % 2, kk).wait()
        data = buf[kk % 2]
        src = jnp.minimum(start + kk * chunk, cap - chunk)
        gid = src + jax.lax.broadcasted_iota(jnp.int32, (chunk, 1), 0)
        in_seg = (gid >= start) & (gid < end)
        rank = (gid - start).astype(jnp.float32)

        alpha, geo_ok, G, dx, dy = _alpha_from_chunk(data, px, py,
                                                     power_cutoff)
        contribute = geo_ok & (alpha >= ALPHA_MIN) & in_seg & (rank < nc)
        a_eff = jnp.where(contribute, alpha, 0.0)
        logs = jnp.log1p(-a_eff)

        tri = _tri_incl(chunk)
        inc = jnp.dot(tri, logs, preferred_element_type=jnp.float32)
        seg_total = jnp.sum(logs, axis=0, keepdims=True)
        T_j = T_back * jnp.exp(-(seg_total - inc + logs))
        w = a_eff * T_j                      # (chunk, PIX)

        wr = w * data[:, 6:7]
        wg = w * data[:, 7:8]
        wb = w * data[:, 8:9]
        Winc_r = jnp.dot(tri, wr, preferred_element_type=jnp.float32)
        Winc_g = jnp.dot(tri, wg, preferred_element_type=jnp.float32)
        Winc_b = jnp.dot(tri, wb, preferred_element_type=jnp.float32)
        tot = jnp.stack([jnp.sum(wr, 0), jnp.sum(wg, 0), jnp.sum(wb, 0)], 0)
        S_r = S[0:1, :] + (tot[0:1, :] - Winc_r)
        S_g = S[1:2, :] + (tot[1:2, :] - Winc_g)
        S_b = S[2:3, :] + (tot[2:3, :] - Winc_b)

        gc_dot_col = (g_pix[0:1, :] * data[:, 6:7]
                      + g_pix[1:2, :] * data[:, 7:8]
                      + g_pix[2:3, :] * data[:, 8:9])
        gc_dot_S = (g_pix[0:1, :] * S_r + g_pix[1:2, :] * S_g
                    + g_pix[2:3, :] * S_b)
        inv_om = 1.0 / (1.0 - a_eff)
        dL_da = jnp.where(contribute,
                          gc_dot_col * T_j - (gc_dot_S + gT * Tf) * inv_om,
                          0.0)

        d_op = jnp.sum(G * dL_da, axis=1)
        d_power = alpha * dL_da
        ca = data[:, 2:3]
        cb = data[:, 3:4]
        cc = data[:, 4:5]
        d_dx = d_power * (-(ca * dx + cb * dy))
        d_dy = d_power * (-(cc * dy + cb * dx))

        g_out = jnp.zeros((chunk, ROW), jnp.float32)
        g_out = g_out.at[:, 0].set(jnp.sum(d_dx, axis=1))
        g_out = g_out.at[:, 1].set(jnp.sum(d_dy, axis=1))
        g_out = g_out.at[:, 2].set(jnp.sum(d_power * (-0.5 * dx * dx), 1))
        g_out = g_out.at[:, 3].set(jnp.sum(d_power * (-dx * dy), 1))
        g_out = g_out.at[:, 4].set(jnp.sum(d_power * (-0.5 * dy * dy), 1))
        g_out = g_out.at[:, 5].set(d_op)
        g_out = g_out.at[:, 6].set(jnp.sum(w * g_pix[0:1, :], axis=1))
        g_out = g_out.at[:, 7].set(jnp.sum(w * g_pix[1:2, :], axis=1))
        g_out = g_out.at[:, 8].set(jnp.sum(w * g_pix[2:3, :], axis=1))
        gbuf[0] = g_out
        wdma = pltpu.make_async_copy(gbuf.at[0],
                                     grads_hbm.at[pl.ds(src, chunk), :],
                                     gsem)
        wdma.start()

        T_back = T_back * jnp.exp(-seg_total)
        S = jnp.concatenate([S[0:1, :] + tot[0:1, :],
                             S[1:2, :] + tot[1:2, :],
                             S[2:3, :] + tot[2:3, :]], axis=0)
        wdma.wait()
        return kk, T_back, S

    def cond(state):
        return state[0] > 0

    jax.lax.while_loop(cond, body,
                       (num_chunks, Tf, jnp.zeros((3, PIX), jnp.float32)))


def _backward(pair_data, seg_start, seg_end, fin, grid_x: int, grid_y: int,
              chunk: int, power_cutoff: float, interpret: bool):
    num_tiles = grid_x * grid_y
    cap = pair_data.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(num_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec((1, 8, PIX), lambda t, *_: (t, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        scratch_shapes=[pltpu.VMEM((2, chunk, ROW), jnp.float32),
                        pltpu.VMEM((1, chunk, ROW), jnp.float32),
                        pltpu.SemaphoreType.DMA((2,)),
                        pltpu.SemaphoreType.DMA(())],
    )
    kernel = functools.partial(_bwd_kernel, grid_x=grid_x, chunk=chunk,
                               power_cutoff=power_cutoff, cap=cap)
    grads = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((cap, ROW), jnp.float32)],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(seg_start, seg_end, pair_data, fin)[0]
    # Rows never covered by any tile's chunks are uninitialized: zero them.
    covered = jnp.zeros(cap, bool)
    num_chunks = pl.cdiv(jnp.maximum(seg_end - seg_start, 0), chunk)
    # Build coverage from aligned segments: rows in
    # [seg_start[t], seg_start[t] + num_chunks[t]*chunk).
    row = jnp.arange(cap, dtype=jnp.int32)
    # Segments are sorted and disjoint; use searchsorted on starts.
    idx = jnp.clip(jnp.searchsorted(seg_start, row, side='right') - 1,
                   0, seg_start.shape[0] - 1)
    within = (row >= seg_start[idx]) & \
             (row < seg_start[idx] + num_chunks[idx] * chunk)
    del covered
    return jnp.where(within[:, None], grads, 0.0)


# --------------------------------------------------------------- public API

@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def blend_pallas(pair_data, seg_start, seg_end, grid_x, grid_y, chunk,
                 power_cutoff, interpret):
    """Differentiable Pallas blend over a chunk-aligned pair list.

    Returns (tile_color [T,PIX,3], final_T [T,PIX], n_contrib [T,PIX] i32).
    """
    out, nc = _forward(pair_data, seg_start, seg_end, grid_x, grid_y, chunk,
                       power_cutoff, interpret)
    return jnp.moveaxis(out[:, 0:3, :], 1, 2), out[:, 3, :], nc[:, 0, :]


def _blend_pallas_fwd(pair_data, seg_start, seg_end, grid_x, grid_y, chunk,
                      power_cutoff, interpret):
    out, nc = _forward(pair_data, seg_start, seg_end, grid_x, grid_y, chunk,
                       power_cutoff, interpret)
    res = (pair_data, seg_start, seg_end, out[:, 3, :], nc[:, 0, :])
    return (jnp.moveaxis(out[:, 0:3, :], 1, 2), out[:, 3, :],
            nc[:, 0, :]), res


def _blend_pallas_bwd(grid_x, grid_y, chunk, power_cutoff, interpret, res, g):
    pair_data, seg_start, seg_end, final_T, n_contrib = res
    g_color, g_T, _ = g
    num_tiles = grid_x * grid_y
    fin = jnp.zeros((num_tiles, 8, PIX), jnp.float32)
    fin = fin.at[:, 0:3, :].set(jnp.moveaxis(g_color, 2, 1))
    fin = fin.at[:, 3, :].set(g_T)
    fin = fin.at[:, 4, :].set(final_T)
    fin = fin.at[:, 5, :].set(n_contrib.astype(jnp.float32))
    grads = _backward(pair_data, seg_start, seg_end, fin, grid_x, grid_y,
                      chunk, power_cutoff, interpret)
    return grads, None, None


blend_pallas.defvjp(_blend_pallas_fwd, _blend_pallas_bwd)
