"""Pallas TPU stats-blend kernel: forward blend + per-pair statistics.

TPU counterpart of the reference's counting rasterizers' render loops
(N3/N4/N5/N9 — e.g. ..._pcheck_obb_sum/cuda_rasterizer/forward.cu:
364-435), which accumulate per-Gaussian statistics with atomics. Here the
kernel writes per-PAIR statistic rows to HBM (same unaligned
read-merge-write machinery as the gradient backward, blend_fwd) and the
caller segment-sums them by the gid payload the fused binning carried
through the tile sort — deterministic, no atomics.

Per-pair stat rows (SROWS = 8, CAP):
  0 w_sum   = sum over pixels of alpha*T (contributing pixels only)
  1 touched = number of contributing pixels
  2 w_max   = max over pixels of alpha*T
  3 geo_win = pixels passing the power window while not yet done
              (the _pcheck_obb_max gs_count semantics, N4 forward.cu:381)
  4-7 pad
Per-tile outputs: color+T (PIX, 4) like the forward, and a (PIX, 4)
block [best_lane, best_w, first_trig, pad]: best_lane/best_w are the
per-pixel argmax pair's GLOBAL lane + weight (ties: earlier chunk, then
lowest lane, matching stats.blend_stats' earlier-chunk rule
deterministically); first_trig is each pixel's saturation-trigger local
pair index (BIG if never) — stats.tile_fetch_counts turns it into the
reference's exact per-tile FETCHED count (256-round early exit,
forward.cu:348-361).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fovsplat.ops.pallas.blend_fwd import (ALPHA_MIN, ALPHA_MAX, PIX, ROW,
                                           T_EPS, _alpha_from_chunk,
                                           _pixel_coords, _triu_strict)

SROWS = 8


def _stats_kernel(seg_start_ref, seg_end_ref, pairs_hbm, out_ref, arg_ref,
                  stats_hbm, buf, sbuf, sem, ssem, *, grid_x: int,
                  chunk: int, power_cutoff: float, cap: int, batch: int,
                  width: int, height: int):
    tb = pl.program_id(0)
    triu = _triu_strict(chunk)

    def one_tile(b, carry):
        t = tb * batch + b
        start = seg_start_ref[t]
        end = seg_end_ref[t]
        px, py = _pixel_coords(t, grid_x)
        # done = !inside at init (forward.cu:326): padding pixels on edge
        # tiles start frozen and never blend or count.
        outside = jnp.where((px < jnp.float32(width))
                            & (py < jnp.float32(height)), 0.0, 1.0)
        base = pl.multiple_of((start // chunk) * chunk, chunk)
        num_chunks = pl.cdiv(end - base, chunk)

        def get_dma(slot, k):
            src = pl.multiple_of(jnp.minimum(base + k * chunk, cap - chunk),
                                 chunk)
            return pltpu.make_async_copy(pairs_hbm.at[:, pl.ds(src, chunk)],
                                         buf.at[slot], sem.at[slot])

        @pl.when(num_chunks > 0)
        def _():
            get_dma(0, 0).start()

        def body(state):
            (k, cont, T_pix, frozen, cr, cg, cb_, best_w, best_lane,
             ftrig) = state
            del cont
            get_dma(k % 2, k).wait()

            @pl.when(k + 1 < num_chunks)
            def _():
                get_dma((k + 1) % 2, k + 1).start()
            data = buf[k % 2]
            src = pl.multiple_of(jnp.minimum(base + k * chunk, cap - chunk),
                                 chunk)
            gid = src + jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1)
            in_seg = (gid >= start) & (gid < end)

            alpha, geo_ok, _, _, _ = _alpha_from_chunk(data, px, py,
                                                       power_cutoff)
            ok = geo_ok & (alpha >= ALPHA_MIN) & in_seg
            # frozen carried as f32 0/1: Mosaic cannot legalize i1
            # VECTOR while-loop carries (scf.yield layout error on
            # the real TPU; interpret mode hid it).
            a_eff = jnp.where(ok & (frozen < 0.5), alpha, 0.0)
            logs = jnp.log1p(-a_eff)
            excl = jnp.dot(logs, triu, preferred_element_type=jnp.float32)
            T_row = T_pix * jnp.exp(excl)
            incl = T_row * (1.0 - a_eff)
            trigger = (a_eff > 0) & (incl < T_EPS)
            done_before = jnp.dot(trigger.astype(jnp.float32), triu,
                                  preferred_element_type=jnp.float32) > 0
            contribute = (a_eff > 0) & ~trigger & ~done_before
            frozen_in = frozen          # pre-chunk carry: the trigger
            frozen = jnp.maximum(frozen, jnp.max(  # pair itself still counts
                trigger.astype(jnp.float32), axis=1, keepdims=True))
            weight = jnp.where(contribute, a_eff * T_row, 0.0)

            cr = cr + jnp.sum(weight * data[6:7, :], axis=1, keepdims=True)
            cg = cg + jnp.sum(weight * data[7:8, :], axis=1, keepdims=True)
            cb_ = cb_ + jnp.sum(weight * data[8:9, :], axis=1, keepdims=True)
            log_delta = jnp.sum(jnp.where(contribute, logs, 0.0), axis=1,
                                keepdims=True)
            T_pix = T_pix * jnp.exp(log_delta)

            # Per-pixel argmax carry: chunk max + lowest achieving lane;
            # strict > keeps the EARLIER chunk on ties (stats.blend_stats'
            # merge rule).
            rank = (gid - start).astype(jnp.float32)             # (1, chunk)
            ftrig = jnp.minimum(ftrig, jnp.min(
                jnp.where(trigger, rank, jnp.float32(1 << 30)),
                axis=1, keepdims=True))
            cmax = jnp.max(weight, axis=1, keepdims=True)        # (PIX, 1)
            ach = (weight >= cmax) & (weight > 0)
            clane = jnp.min(jnp.where(ach, gid.astype(jnp.float32),
                                      jnp.float32(cap)),
                            axis=1, keepdims=True)
            better = cmax > best_w
            best_lane = jnp.where(better, clane, best_lane)
            best_w = jnp.maximum(best_w, cmax)

            # Per-pair stat rows for this chunk (geo_win uses the PRE-chunk
            # frozen carry: the reference counts pairs up to AND including
            # each pixel's saturation trigger, N4 forward.cu:381).
            geo_win = (geo_ok & in_seg & (frozen_in < 0.5)
                       & jnp.logical_not(done_before))
            srow = jnp.concatenate([
                jnp.sum(weight, axis=0, keepdims=True),
                jnp.sum(contribute.astype(jnp.float32), axis=0,
                        keepdims=True),
                jnp.max(weight, axis=0, keepdims=True),
                jnp.sum(geo_win.astype(jnp.float32), axis=0, keepdims=True),
                jnp.zeros((SROWS - 4, chunk), jnp.float32)], axis=0)
            slot = k % 2
            lane_g = src + jax.lax.broadcasted_iota(jnp.int32,
                                                    (SROWS, chunk), 1)

            # Boundary chunk shared with EARLIER tiles: read-merge-write
            # (sequential grid + synchronous writes; see blend_fwd bwd).
            @pl.when((k == 0) & (base < start))
            def _():
                rdma = pltpu.make_async_copy(
                    stats_hbm.at[:, pl.ds(src, chunk)], sbuf.at[1 - slot],
                    ssem.at[1 - slot])
                rdma.start()
                rdma.wait()
                sbuf[slot] = jnp.where(lane_g < start, sbuf[1 - slot], srow)

            @pl.when(jnp.logical_not((k == 0) & (base < start)))
            def _():
                sbuf[slot] = srow
            wdma = pltpu.make_async_copy(sbuf.at[slot],
                                         stats_hbm.at[:, pl.ds(src, chunk)],
                                         ssem.at[slot])
            wdma.start()
            wdma.wait()

            # No early exit: every chunk's per-pair stat rows must reach
            # HBM (frozen pixels contribute zeros, exactly like the
            # XLA oracle's frozen mask).
            cont = k + 1 < num_chunks
            return (k + 1, cont, T_pix, frozen, cr, cg, cb_, best_w,
                    best_lane, ftrig)

        zc = jnp.zeros((PIX, 1), jnp.float32)
        init = (jnp.int32(0), num_chunks > 0, jnp.ones((PIX, 1), jnp.float32),
                outside,
                zc, zc, zc, zc, jnp.full((PIX, 1), jnp.float32(cap)),
                jnp.full((PIX, 1), jnp.float32(1 << 30)))
        st = jax.lax.while_loop(lambda s: s[1], body, init)
        kf, _, T_pix, _, cr, cg, cb_, best_w, best_lane, ftrig = st

        @pl.when(kf < num_chunks)
        def _():
            get_dma(kf % 2, kf).wait()

        out_ref[b] = jnp.concatenate([cr, cg, cb_, T_pix], axis=1)
        arg_ref[b] = jnp.concatenate([best_lane, best_w, ftrig, zc], axis=1)
        return carry

    jax.lax.fori_loop(0, batch, one_tile, 0)


@functools.partial(jax.jit, static_argnames=("grid_x", "grid_y", "chunk",
                                             "power_cutoff", "interpret",
                                             "batch", "width", "height"))
def blend_stats_pallas(pair_data, seg_start, seg_end, grid_x, grid_y,
                       chunk=256, power_cutoff=-4.5, interpret=False,
                       batch=8, width=1 << 30, height=1 << 30):
    """pair_data (ROW, CAP) f32 EXACT rows (train-mode fused binning
    layout: [mx, my, ca, cb, cc, op, r, g, b, gid, ...]); unaligned
    segments.

    Returns (tile_color (T, PIX, 3), final_T (T, PIX),
    pair_stats (SROWS, CAP) [w_sum, touched, w_max, geo_win] — rows
    outside any processed chunk are UNINITIALIZED, mask like
    blend_fwd._backward, arg (T, PIX, 4) [best_lane (f32, cap = none),
    best_w, first_trig, pad])."""
    num_tiles = grid_x * grid_y
    cap = pair_data.shape[1]
    t_pad = ((num_tiles + batch - 1) // batch) * batch
    if t_pad != num_tiles:
        pad = t_pad - num_tiles
        seg_start = jnp.concatenate([seg_start, jnp.zeros(pad, jnp.int32)])
        seg_end = jnp.concatenate([seg_end, jnp.zeros(pad, jnp.int32)])
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(t_pad // batch,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[
            pl.BlockSpec((batch, PIX, 4), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((batch, PIX, 4), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        scratch_shapes=[pltpu.VMEM((2, ROW, chunk), jnp.float32),
                        pltpu.VMEM((2, SROWS, chunk), jnp.float32),
                        pltpu.SemaphoreType.DMA((2,)),
                        pltpu.SemaphoreType.DMA((2,))],
    )
    kernel = functools.partial(_stats_kernel, grid_x=grid_x, chunk=chunk,
                               power_cutoff=power_cutoff, cap=cap,
                               batch=batch, width=width, height=height)
    out, arg, stats = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((t_pad, PIX, 4), jnp.float32),
                   jax.ShapeDtypeStruct((t_pad, PIX, 4), jnp.float32),
                   jax.ShapeDtypeStruct((SROWS, cap), jnp.float32)],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(seg_start, seg_end, pair_data)
    return (out[:num_tiles, :, 0:3], out[:num_tiles, :, 3], stats,
            arg[:num_tiles])
