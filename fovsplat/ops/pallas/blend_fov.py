"""Pallas TPU foveated blend kernel: two transmittance chains per pixel.

TPU counterpart of the reference's renderCUDA / renderCUDA_blending pair
(..._fov_pcheck_obb/cuda_rasterizer/forward.cu:262-604): both levels of a
blending tile are accumulated in ONE pass over the tile's pair segment with
a shared exp(power) evaluation; plain tiles mask the second chain off. The
smoothstep merge runs outside the kernel (cheap elementwise).

Pair SoA rows (FROW=8; 6 used + 2 zero pad rows for DMA sublane
alignment — HBM window copies need 8-row-aligned shapes):
  [mx, my, P_caca (ca_hi|ca_lo bf16 split), P_cbcc (cb|cc bf16),
   OPRG (op1_u8|op2_u8|r1_u8|g1_u8), BRGB (b1|r2|g2|b2 u8), pad, pad]
op2 == 0 encodes the L2 cull (a2 >= ALPHA_MIN rejects it for free).
Quantization bounds (all inference-only — the training kernel is
blend_fwd at f32): ca reconstructs within ~2^-17 relative; cb/cc bf16
bound the alpha error at < 1% relative; opacities quantize at step
1/255 == ALPHA_MIN; colors at step 2/255 on [0, 2] with blend weights
summing to <= 1 (one 8-bit display LSB). The 6 rows ride the tile sort
as 3 bit-packed i64 operands (foveated._bin_fov_fused).
Tile-pixel input block (1, PIX, 4): [l1_active, l2_active, pad, pad].
Output block (1, PIX, 8): [C1r, C1g, C1b, T1, C2r, C2g, C2b, T2].
Accepts unaligned segments (DMA windows floored to 128).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fovsplat.ops.pallas.blend_fwd import (ALPHA_MAX, ALPHA_MIN, PIX, T_EPS,
                                           _pixel_quad_feat, _power_mxu,
                                           _triu_strict)

FROW = 8

C_OP = 1.0 / 255.0    # u8 opacity step == ALPHA_MIN
C_COL = 2.0 / 255.0   # u8 color step on [0, 2]

_MASK_HI = -65536                     # 0xFFFF0000 (python int: literals
                                      # inline; jnp scalars become captured
                                      # constants inside pallas kernels)


def _hi(p):
    """High bf16 half of a packed lane, as f32."""
    return pltpu.bitcast(pltpu.bitcast(p, jnp.int32) & _MASK_HI, jnp.float32)


def _lo(p):
    """Low bf16 half of a packed lane, as f32."""
    return pltpu.bitcast(pltpu.bitcast(p, jnp.int32) << 16, jnp.float32)


def _u8(p, sh, scale):
    """8-bit field at bit offset `sh` of a packed lane, rescaled to f32."""
    i = jax.lax.shift_right_logical(pltpu.bitcast(p, jnp.int32), sh)
    return (i & 255).astype(jnp.float32) * scale


def pack2bf16_xla(a, b):
    """XLA-side counterpart of expand_fov._pack2_i32 (round-to-nearest
    bf16 pair packing) for payloads produced outside the expand kernel."""
    ua = (jax.lax.bitcast_convert_type(a, jnp.uint32)
          + jnp.uint32(0x8000)) & jnp.uint32(0xFFFF0000)
    ub = ((jax.lax.bitcast_convert_type(b, jnp.uint32)
           + jnp.uint32(0x8000)) & jnp.uint32(0xFFFF0000)) >> 16
    return jax.lax.bitcast_convert_type(ua | ub, jnp.float32)


def _fov_kernel(seg_start_ref, seg_end_ref, t0_ref, pairs_hbm, act_ref,
                out_ref, win, fbuf, wsem, fsem, *, grid_x: int, chunk: int,
                power_cutoff: float, cap: int, batch: int,
                prefix_mode: str, window: int, sub: int):
    """Window-streaming fov blend.

    Consecutive tiles own consecutive segments of the sorted pair list,
    so one grid program (a batch of `batch` tiles) consumes ONE
    contiguous HBM range. That range is streamed into a VMEM window of
    `window` lanes with ceil(range/sub) sub-DMAs of `sub` lanes each
    (static DMA shapes; only the COUNT is dynamic), double-buffered
    ACROSS programs: program p issues program p+1's sub-DMAs right after
    waiting its own, so the next window loads under this program's
    compute. This replaces the old per-chunk DMA streaming whose wait
    latency (~1.4 us x ~2 chunks x tile, plus a cold first chunk per
    tile) dominated the kernel at bench scale.

    Chunks that fall outside the window (batch range > window lanes —
    extreme segment skew) fall back to a direct, latency-exposed
    per-chunk DMA (fbuf); correctness never depends on the window size.

    CRITICAL DMA discipline: every started DMA is waited exactly once —
    program p starts exactly nsub(p+1) copies on slot (p+1)%2 (guarded
    by p+1 < num_programs) and program p+1 waits exactly nsub(p+1) on
    that slot; the sequential TPU grid makes the pairing total."""
    tb = pl.program_id(0)
    nprog = pl.num_programs(0)
    maxsub = window // sub

    def seg_base(p):
        # 128-aligned window base for program p (tiles [p*batch, ...)).
        t0 = jnp.minimum(p * batch, seg_start_ref.shape[0] - 1)
        return pl.multiple_of((seg_start_ref[t0] // 128) * 128, 128)

    def seg_nsub(p):
        # Sub-DMA count covering program p's full batch range — clamped
        # to the window AND to the pair buffer end, so every issued copy
        # reads exactly [base + j*sub, +sub) with NO source clamping
        # (a clamped source would fill the window with data from the
        # wrong address; chunks past ns*sub use the fallback path and
        # keep their own consistent clamp semantics).
        t0 = jnp.minimum(p * batch, seg_start_ref.shape[0] - 1)
        t1 = jnp.minimum((p + 1) * batch - 1, seg_end_ref.shape[0] - 1)
        base = (seg_start_ref[t0] // 128) * 128
        rng = seg_end_ref[t1] - base
        return jnp.clip(jnp.minimum(pl.cdiv(rng, sub),
                                    (cap - base) // sub), 0, maxsub)

    def start_window(p, slot):
        base = seg_base(p)
        ns = seg_nsub(p)

        def issue(j, _):
            @pl.when(j < ns)
            def _():
                src = pl.multiple_of(base + j * sub, 128)
                pltpu.make_async_copy(
                    pairs_hbm.at[:, pl.ds(src, sub)],
                    win.at[slot, :, pl.ds(j * sub, sub)],
                    wsem.at[slot]).start()
            return 0

        jax.lax.fori_loop(0, maxsub, issue, 0)

    def wait_window(p, slot):
        ns = seg_nsub(p)

        def drain(j, _):
            @pl.when(j < ns)
            def _():
                pltpu.make_async_copy(
                    pairs_hbm.at[:, pl.ds(0, sub)],
                    win.at[slot, :, pl.ds(0, sub)],
                    wsem.at[slot]).wait()
            return 0

        jax.lax.fori_loop(0, maxsub, drain, 0)

    slot = jax.lax.rem(tb, 2)

    @pl.when(tb == 0)
    def _():
        start_window(0, 0)

    wait_window(tb, slot)

    @pl.when(tb + 1 < nprog)
    def _():
        start_window(tb + 1, 1 - slot)

    win_base = seg_base(tb)
    win_loaded = seg_nsub(tb) * sub      # lanes actually present in win

    # ---------------- TRANSPOSED compute orientation -----------------
    # Everything per-pixel rides with PIX on LANES: per-tile state vectors
    # are (1, PIX) (2 vregs) instead of (PIX, 1) (32 vregs at 1/128 lane
    # use), the output block is (8, PIX), and the pair-pixel middle runs
    # (chunk, PIX). Measured: the old orientation spent ~3.9 us/tile of
    # pure state/write overhead (15.9 ms/frame at 4056 tiles with EMPTY
    # segments); the transposed probe does the same bookkeeping in
    # ~0.4 us/tile (scripts/probe_tile_overhead.py).
    def _color_acc(weight, cr, cg, cb_, col_r, col_g, col_b):
        # Color accumulation on the MXU: (8, chunk) x (chunk, PIX).
        cols = jnp.concatenate(
            [col_r, col_g, col_b,
             jnp.zeros((5, col_r.shape[1]), jnp.float32)],
            axis=0).astype(jnp.bfloat16)                       # (8, chunk)
        acc = jax.lax.dot_general(
            cols, weight.astype(jnp.bfloat16),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)                # (8, PIX)
        return cr + acc[0:1, :], cg + acc[1:2, :], cb_ + acc[2:3, :]

    def chain_logmm(a_eff, T_pix, cr, cg, cb_, col_r, col_g, col_b, ltri):
        # Relaxed termination (inference): the reference's T<1e-4 freeze is
        # a GPU performance trick; skipping the freeze changes pixels by at
        # most T_EPS (< half an 8-bit LSB). bf16 MXU log-space prefix —
        # <=2^-9 relative per term (inference-only; training stays f32).
        logs = jnp.log1p(-a_eff)                               # (chunk, PIX)
        excl = jnp.dot(ltri, logs.astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32)
        weight = a_eff * (T_pix * jnp.exp(excl))
        cr, cg, cb_ = _color_acc(weight, cr, cg, cb_, col_r, col_g, col_b)
        delta = jnp.sum(logs, axis=0, keepdims=True)           # (1, PIX)
        return T_pix * jnp.exp(delta), cr, cg, cb_

    def chain_scan(a_eff, T_pix, cr, cg, cb_, col_r, col_g, col_b, ltri):
        # Hillis-Steele prefix PRODUCT of (1 - a) along the chunk sublanes
        # — exact f32, no transcendentals.
        del ltri
        om = 1.0 - a_eff                                       # (chunk, PIX)
        row = jax.lax.broadcasted_iota(jnp.int32, om.shape, 0)
        pinc = om
        st = 1
        while st < chunk:
            pinc = pinc * jnp.where(row >= st, pltpu.roll(pinc, st, 0), 1.0)
            st *= 2
        excl = jnp.where(row >= 1, pltpu.roll(pinc, 1, 0), 1.0)
        weight = a_eff * (T_pix * excl)
        cr, cg, cb_ = _color_acc(weight, cr, cg, cb_, col_r, col_g, col_b)
        return T_pix * pinc[chunk - 1:chunk, :], cr, cg, cb_

    chain = chain_logmm if prefix_mode == "logmm" else chain_scan

    # Loop-invariant blocks, built once per program: strictly-LOWER
    # triangular prefix matrix (excl[i] = sum_{j<i} logs[j]), the pixel
    # quadratic-feature block (power as ONE transposed bf16 MXU pass with
    # an exact hi/lo pair-feature split), and the bf16 identity used to
    # transpose (1, chunk) integer rows into (chunk, 1) columns on the MXU
    # (a one-hot matmul of 8-bit integers is exact; Mosaic vector
    # transposes of 1-row blocks are not reliably cheap).
    ltri_bf = (jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 1)
               < jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 0)
               ).astype(jnp.bfloat16)
    pfeat = _pixel_quad_feat()                                  # (PIX, 16)
    eye_bf = (jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 0)
              == jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 1)
              ).astype(jnp.bfloat16)

    def _to_cols(rows_f32):
        # (R, chunk) f32 with bf16-exact values -> (chunk, R_pad) f32.
        # R pads to 8: Mosaic rejects matmuls with a size-1 output dim.
        r = rows_f32.shape[0]
        rows = jnp.concatenate(
            [rows_f32, jnp.zeros((8 - r, rows_f32.shape[1]), jnp.float32)],
            axis=0)
        return jax.lax.dot_general(
            eye_bf, rows.astype(jnp.bfloat16),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)

    def per_tile(b, _):
        t = tb * batch + b
        start = seg_start_ref[t]
        end = seg_end_ref[t]
        # Pixel coords use the GLOBAL tile id: t0_ref holds the id of
        # this call's first tile (nonzero when a tile-sharded owner
        # blends only its own subrange — parallel/fov_shard).
        tg = t0_ref[0] + t
        tx0 = (tg % grid_x).astype(jnp.float32) * 16.0
        ty0 = (tg // grid_x).astype(jnp.float32) * 16.0
        base = pl.multiple_of((start // 128) * 128, 128)
        num_chunks = pl.cdiv(end - base, chunk)

        l1_active = act_ref[b, 0:1, :] > 0     # (1, PIX)
        l2_active = act_ref[b, 1:2, :] > 0
        # Per-tile specialization (the reference's renderCUDA vs
        # renderCUDA_blending split, rasterizer_impl.cu:897,922): plain
        # tiles run a single-chain loop — the second transmittance chain
        # is the bulk of the work.
        is_blend = jnp.max(act_ref[b, 1, :]) > 0

        def chunk_geo(k):
            src = pl.multiple_of(jnp.minimum(base + k * chunk, cap - chunk),
                                 128)
            woff = src - win_base
            in_win = (woff >= 0) & (woff + chunk <= win_loaded)

            @pl.when(jnp.logical_not(in_win))
            def _():
                # Fallback: batch range exceeded the window (segment
                # skew); direct latency-exposed chunk DMA.
                dma = pltpu.make_async_copy(
                    pairs_hbm.at[:, pl.ds(src, chunk)], fbuf, fsem)
                dma.start()
                dma.wait()

            wdata = win[slot, :, pl.ds(
                pl.multiple_of(jnp.clip(woff, 0, window - chunk), 128),
                chunk)]
            # Vector-shaped predicate: Mosaic cannot legalize a scalar-
            # condition select over vector operands (see expand_fov).
            sel = jnp.full((FROW, chunk), in_win)
            data = jnp.where(sel, wdata, fbuf[...])
            gid_col = src + jax.lax.broadcasted_iota(jnp.int32, (chunk, 1), 0)
            in_seg = (gid_col >= start) & (gid_col < end)       # (chunk, 1)
            # Pair quadratic features in tile-local coords; power_T =
            # featT^T @ pfeatT on the MXU with an exact hi/lo split.
            mxl = data[0:1, :] - tx0
            myl = data[1:2, :] - ty0
            ca = _hi(data[2:3, :]) + _lo(data[2:3, :])
            cb = _hi(data[3:4, :])
            cc = _lo(data[3:4, :])
            feat = jnp.concatenate(
                [-0.5 * (ca * mxl * mxl + cc * myl * myl) - cb * mxl * myl,
                 ca * mxl + cb * myl,
                 cc * myl + cb * mxl,
                 -0.5 * ca, -0.5 * cc, -cb,
                 jnp.zeros((2, chunk), jnp.float32)], axis=0)   # (8, chunk)
            fhi_f = pltpu.bitcast(pltpu.bitcast(feat, jnp.int32) & _MASK_HI,
                                  jnp.float32)
            feat2 = jnp.concatenate([fhi_f.astype(jnp.bfloat16),
                                     (feat - fhi_f).astype(jnp.bfloat16)],
                                    axis=0)                     # (16, chunk)
            power = jax.lax.dot_general(
                feat2, pfeat, (((0,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)             # (chunk, PIX)
            G = jnp.exp(jnp.minimum(power, 0.0))
            # <= 3e-3, not <= 0: MXU roundoff near a Gaussian's center
            # (power ~ 0) must not drop a full-opacity contribution
            # (see blend_fwd); G clamps at 1.
            geo_ok = (power <= 3e-3) & (power >= power_cutoff) & in_seg
            return data, G, geo_ok

        def unpack_cols(data):
            # u8 opacity fields -> (chunk, 1) columns via the exact
            # eye-matmul transpose (integers <= 255 are bf16-exact; the
            # C_OP scale applies after).
            bits = pltpu.bitcast(data[4:5, :], jnp.int32)
            q1 = (jax.lax.shift_right_logical(bits, 24) & 255).astype(
                jnp.float32)
            q2 = (jax.lax.shift_right_logical(bits, 16) & 255).astype(
                jnp.float32)
            cols = _to_cols(jnp.concatenate([q1, q2], axis=0))
            return cols[:, 0:1] * C_OP, cols[:, 1:2] * C_OP

        def body_dual(state):
            k, cont, T1, c1r, c1g, c1b, T2, c2r, c2g, c2b = state
            del cont
            data, G, geo_ok = chunk_geo(k)
            op1_col, op2_col = unpack_cols(data)

            a1 = jnp.minimum(ALPHA_MAX, op1_col * G)
            ok1 = geo_ok & (a1 >= ALPHA_MIN) & l1_active
            T1, c1r, c1g, c1b = chain(jnp.where(ok1, a1, 0.0), T1, c1r, c1g,
                                      c1b, _u8(data[4:5, :], 8, C_COL),
                                      _u8(data[4:5, :], 0, C_COL),
                                      _u8(data[5:6, :], 24, C_COL), ltri_bf)

            # op2 == 0 on L2-culled pairs -> a2 = 0 fails the ALPHA_MIN test.
            a2 = jnp.minimum(ALPHA_MAX, op2_col * G)
            ok2 = geo_ok & (a2 >= ALPHA_MIN) & l2_active
            T2, c2r, c2g, c2b = chain(jnp.where(ok2, a2, 0.0), T2, c2r, c2g,
                                      c2b, _u8(data[5:6, :], 16, C_COL),
                                      _u8(data[5:6, :], 8, C_COL),
                                      _u8(data[5:6, :], 0, C_COL), ltri_bf)

            alive1 = jnp.max(jnp.where(l1_active, T1, 0.0)) >= T_EPS
            alive2 = jnp.max(jnp.where(l2_active, T2, 0.0)) >= T_EPS
            cont = (k + 1 < num_chunks) & (alive1 | alive2)
            return k + 1, cont, T1, c1r, c1g, c1b, T2, c2r, c2g, c2b

        def body_single(state):
            k, cont, T1, c1r, c1g, c1b = state
            del cont
            data, G, geo_ok = chunk_geo(k)
            op1_col, _ = unpack_cols(data)

            a1 = jnp.minimum(ALPHA_MAX, op1_col * G)
            ok1 = geo_ok & (a1 >= ALPHA_MIN)
            T1, c1r, c1g, c1b = chain(jnp.where(ok1, a1, 0.0), T1, c1r, c1g,
                                      c1b, _u8(data[4:5, :], 8, C_COL),
                                      _u8(data[4:5, :], 0, C_COL),
                                      _u8(data[5:6, :], 24, C_COL), ltri_bf)

            cont = (k + 1 < num_chunks) & (jnp.max(T1) >= T_EPS)
            return k + 1, cont, T1, c1r, c1g, c1b

        zc = jnp.zeros((1, PIX), jnp.float32)
        one = jnp.ones((1, PIX), jnp.float32)

        @pl.when(is_blend)
        def _():
            st = jax.lax.while_loop(
                lambda s: s[1], body_dual,
                (jnp.int32(0), num_chunks > 0, one, zc, zc, zc, one, zc, zc,
                 zc))
            _, _, T1, c1r, c1g, c1b, T2, c2r, c2g, c2b = st
            out_ref[b] = jnp.concatenate(
                [c1r, c1g, c1b, T1, c2r, c2g, c2b, T2], axis=0)

        @pl.when(jnp.logical_not(is_blend))
        def _():
            st = jax.lax.while_loop(
                lambda s: s[1], body_single,
                (jnp.int32(0), num_chunks > 0, one, zc, zc, zc))
            _, _, T1, c1r, c1g, c1b = st
            out_ref[b] = jnp.concatenate(
                [c1r, c1g, c1b, T1, zc, zc, zc, one], axis=0)

        return 0

    # Unrolled per-tile loop (b STATIC): measured 10.67 ms vs 10.90 ms for
    # the fori form at batch 8 on the proxy workload (fori pays dynamic
    # first-dim block indexing; unroll pays code size — a wash, slight
    # edge to unroll at batch 8).
    for b in range(batch):
        per_tile(b, 0)


@functools.partial(jax.jit, static_argnames=("grid_x", "grid_y", "chunk",
                                             "power_cutoff", "interpret",
                                             "batch", "prefix_mode",
                                             "window", "sub", "n_tiles"))
def blend_fov_pallas(pair_data, seg_start, seg_end, tile_act,
                     grid_x, grid_y, chunk=256, power_cutoff=-4.5,
                     interpret=False, batch=8, prefix_mode="logmm",
                     window=32768, sub=2048, tile0=None, n_tiles=None):
    """pair_data (FROW, CAP); tile_act (T, PIX, 4).

    window/sub: VMEM streaming window in lanes and its sub-DMA quantum
    (see _fov_kernel docstring). window covers a whole tile-batch's pair
    range in the common case; overflow chunks fall back to direct DMA.

    tile0/n_tiles: blend only the n_tiles tiles starting at GLOBAL tile
    id tile0 (a traced scalar — tile-sharded owners pass their own
    range; parallel/fov_shard). seg_start/seg_end/tile_act are then
    LOCAL (n_tiles rows); pixel coordinates stay global.

    Returns (C1 [T,PIX,3], T1 [T,PIX], C2 [T,PIX,3], T2 [T,PIX])."""
    num_tiles = n_tiles if n_tiles is not None else grid_x * grid_y
    cap = pair_data.shape[1]
    assert window % sub == 0 and chunk % 128 == 0 and sub % 128 == 0
    assert cap >= 128, cap                      # binning pads to chunk mult
    sub = min(sub, (cap // 128) * 128)          # tiny caps (CPU tests)
    window = max(sub, min(window, (cap // sub) * sub))
    assert window >= chunk, (window, chunk)
    t_pad = ((num_tiles + batch - 1) // batch) * batch
    tile_act = tile_act.transpose(0, 2, 1)      # (T, 4, PIX) lane-major
    if t_pad != num_tiles:
        # Pad with the last real seg_end (empty segments AT the real range's
        # end) — zero-padded segs would drag the final batch's streaming
        # window to lane 0, forcing every real tile in it onto the
        # latency-exposed per-chunk fallback DMA (ADVICE r2).
        pad = t_pad - num_tiles
        tail = jnp.broadcast_to(seg_end[-1], (pad,)).astype(jnp.int32)
        seg_start = jnp.concatenate([seg_start, tail])
        seg_end = jnp.concatenate([seg_end, tail])
        tile_act = jnp.concatenate(
            [tile_act, jnp.zeros((pad, 4, PIX), jnp.float32)], axis=0)
    t0_arr = jnp.zeros((1,), jnp.int32) if tile0 is None \
        else jnp.asarray(tile0, jnp.int32)[None]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(t_pad // batch,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec((batch, 4, PIX), lambda t, *_: (t, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec((batch, 8, PIX), lambda t, *_: (t, 0, 0),
                                memory_space=pltpu.VMEM)],
        scratch_shapes=[pltpu.VMEM((2, FROW, window), jnp.float32),
                        pltpu.VMEM((FROW, chunk), jnp.float32),
                        pltpu.SemaphoreType.DMA((2,)),
                        pltpu.SemaphoreType.DMA(())],
    )
    kernel = functools.partial(_fov_kernel, grid_x=grid_x, chunk=chunk,
                               power_cutoff=power_cutoff, cap=cap,
                               batch=batch, prefix_mode=prefix_mode,
                               window=window, sub=sub)
    out = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((t_pad, 8, PIX), jnp.float32)],
        interpret=interpret,
    )(seg_start, seg_end, t0_arr, pair_data, tile_act)[0]
    out = out[:num_tiles]
    # Back to pixel-major for the consumers (one cheap XLA transpose).
    return (out[:, 0:3, :].transpose(0, 2, 1), out[:, 3, :],
            out[:, 4:7, :].transpose(0, 2, 1), out[:, 7, :])
