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


def _fov_kernel(seg_start_ref, seg_end_ref, pairs_hbm, act_ref, out_ref,
                buf, sem, *, grid_x: int, chunk: int, power_cutoff: float,
                cap: int, batch: int, prefix_mode: str):
    tb = pl.program_id(0)

    # CRITICAL: a prefetch may only be started if it is guaranteed to be
    # waited on. The loop therefore decides continuation BEFORE issuing the
    # next DMA — an exited loop with a dangling started DMA corrupts
    # semaphore state across grid programs and halts the device.
    def _color_acc(weight, cr, cg, cb_, col_r, col_g, col_b):
        # Color accumulation on the MXU: one (PIX,chunk)x(chunk,8) matmul
        # replaces three multiply+lane-reduction passes on the VPU (the
        # kernel is VPU-bound; colors/weights are bf16-precision already).
        cols = jnp.concatenate(
            [col_r, col_g, col_b,
             jnp.zeros((5, col_r.shape[1]), jnp.float32)],
            axis=0).astype(jnp.bfloat16)                       # (8, chunk)
        acc = jax.lax.dot_general(
            weight.astype(jnp.bfloat16), cols,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)                # (PIX, 8)
        return cr + acc[:, 0:1], cg + acc[:, 1:2], cb_ + acc[:, 2:3]

    def chain_logmm(a_eff, T_pix, cr, cg, cb_, col_r, col_g, col_b, triu):
        # Relaxed termination (inference): the reference's T<1e-4 freeze is
        # a GPU performance trick; skipping the freeze changes pixels by at
        # most T_EPS (< half an 8-bit LSB). This halves the MXU prefix work.
        logs = jnp.log1p(-a_eff)
        # bf16 MXU prefix (f32 accumulate): each log term carries <=2^-9
        # relative error, so the exclusive sum deviates by <=0.002*sum(a)
        # in log space — under half a percent of transmittance at any pixel
        # still visibly accumulating. Inference-only; the training kernel
        # (blend_fwd) stays f32.
        excl = jnp.dot(logs.astype(jnp.bfloat16), triu,
                       preferred_element_type=jnp.float32)
        weight = a_eff * (T_pix * jnp.exp(excl))
        cr, cg, cb_ = _color_acc(weight, cr, cg, cb_, col_r, col_g, col_b)
        delta = jnp.sum(logs, axis=1, keepdims=True)
        return T_pix * jnp.exp(delta), cr, cg, cb_

    def chain_scan(a_eff, T_pix, cr, cg, cb_, col_r, col_g, col_b, triu):
        # Hillis-Steele prefix PRODUCT of (1 - a) along the chunk lanes:
        # log2(chunk)+1 roll+select+multiply rounds replace the per-lane
        # log1p + exp transcendental pair of chain_logmm (and run exact
        # f32 instead of bf16 log-space). pltpu.roll(x, s, 1) rotates
        # right: lane j reads lane j-s; the wrapped lanes are masked to 1.
        del triu
        om = 1.0 - a_eff                                       # (PIX, chunk)
        lane = jax.lax.broadcasted_iota(jnp.int32, om.shape, 1)
        pinc = om
        s = 1
        while s < chunk:
            pinc = pinc * jnp.where(lane >= s, pltpu.roll(pinc, s, 1), 1.0)
            s *= 2
        excl = jnp.where(lane >= 1, pltpu.roll(pinc, 1, 1), 1.0)
        weight = a_eff * (T_pix * excl)
        cr, cg, cb_ = _color_acc(weight, cr, cg, cb_, col_r, col_g, col_b)
        return T_pix * pinc[:, chunk - 1:chunk], cr, cg, cb_

    chain = chain_logmm if prefix_mode == "logmm" else chain_scan

    # Loop-invariant blocks, built once per program: the strict-upper
    # prefix matrix and the pixel quadratic-feature block. Pixel features
    # use LOCAL (in-tile) coordinates, so they are tile-independent:
    # power(p, j) = -0.5 ca dx^2 - 0.5 cc dy^2 - cb dx dy is a bilinear
    # form pixel_feat x pair_feat evaluated in ONE bf16 MXU pass with an
    # exact hi/lo pair-feature split (blend_fwd._power_mxu), replacing ~10
    # VPU ops per pair-pixel.
    triu_bf = _triu_strict(chunk).astype(jnp.bfloat16)
    pfeat = _pixel_quad_feat()                                  # (PIX, 16)

    # batch consecutive tiles per grid program: per-program launch overhead
    # (~9 us) dwarfs one tile's compute (~2 us), so amortize it.
    def per_tile(b, _):
        t = tb * batch + b
        start = seg_start_ref[t]
        end = seg_end_ref[t]
        tx0 = (t % grid_x).astype(jnp.float32) * 16.0
        ty0 = (t // grid_x).astype(jnp.float32) * 16.0
        base = pl.multiple_of((start // 128) * 128, 128)
        num_chunks = pl.cdiv(end - base, chunk)

        act = act_ref[b]                       # (PIX, 4)
        l1_active = act[:, 0:1] > 0            # (PIX, 1)
        l2_active = act[:, 1:2] > 0
        # Per-tile specialization (the reference's renderCUDA vs
        # renderCUDA_blending split, rasterizer_impl.cu:897,922): plain
        # tiles run a single-chain loop — the second transmittance chain
        # (log/exp/matmul per pair-pixel) is the bulk of the VPU work.
        is_blend = jnp.max(act[:, 1]) > 0

        def get_dma(slot, k):
            src = pl.multiple_of(jnp.minimum(base + k * chunk, cap - chunk),
                                 128)
            return pltpu.make_async_copy(pairs_hbm.at[:, pl.ds(src, chunk)],
                                         buf.at[slot], sem.at[slot])

        @pl.when(num_chunks > 0)
        def _():
            get_dma(0, 0).start()

        def chunk_geo(k):
            data = buf[k % 2]
            src = pl.multiple_of(jnp.minimum(base + k * chunk, cap - chunk),
                                 128)
            gid = src + jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1)
            in_seg = (gid >= start) & (gid < end)
            # Pair quadratic features in tile-local coords (1, chunk) each;
            # power = pfeat @ feat on the MXU (see per-program comment).
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
            power = _power_mxu(pfeat, feat)                     # (PIX, chunk)
            G = jnp.exp(jnp.minimum(power, 0.0))
            # <= 3e-3, not <= 0: MXU roundoff near a Gaussian's center
            # (power ~ 0) must not drop a full-opacity contribution
            # (see blend_fwd); G clamps at 1.
            geo_ok = (power <= 3e-3) & (power >= power_cutoff) & in_seg
            return data, G, geo_ok

        def body_dual(state):
            k, cont, T1, c1r, c1g, c1b, T2, c2r, c2g, c2b = state
            del cont
            get_dma(k % 2, k).wait()
            # Speculative prefetch BEFORE compute (the kernel is otherwise
            # DMA-latency bound: ~1.4 us exposed per chunk). The source
            # address is clamped, so the read is always safe; if the loop
            # exits after this chunk (saturation or end), the drain step
            # below waits the in-flight copy — every started DMA is waited.
            @pl.when(k + 1 < num_chunks)
            def _():
                get_dma((k + 1) % 2, k + 1).start()
            data, G, geo_ok = chunk_geo(k)

            a1 = jnp.minimum(ALPHA_MAX, _u8(data[4:5, :], 24, C_OP) * G)
            ok1 = geo_ok & (a1 >= ALPHA_MIN) & l1_active
            T1, c1r, c1g, c1b = chain(jnp.where(ok1, a1, 0.0), T1, c1r, c1g,
                                      c1b, _u8(data[4:5, :], 8, C_COL),
                                      _u8(data[4:5, :], 0, C_COL),
                                      _u8(data[5:6, :], 24, C_COL), triu_bf)

            # op2 == 0 on L2-culled pairs -> a2 = 0 fails the ALPHA_MIN test.
            a2 = jnp.minimum(ALPHA_MAX, _u8(data[4:5, :], 16, C_OP) * G)
            ok2 = geo_ok & (a2 >= ALPHA_MIN) & l2_active
            T2, c2r, c2g, c2b = chain(jnp.where(ok2, a2, 0.0), T2, c2r, c2g,
                                      c2b, _u8(data[5:6, :], 16, C_COL),
                                      _u8(data[5:6, :], 8, C_COL),
                                      _u8(data[5:6, :], 0, C_COL), triu_bf)

            alive1 = jnp.max(jnp.where(l1_active, T1, 0.0)) >= T_EPS
            alive2 = jnp.max(jnp.where(l2_active, T2, 0.0)) >= T_EPS
            cont = (k + 1 < num_chunks) & (alive1 | alive2)
            return k + 1, cont, T1, c1r, c1g, c1b, T2, c2r, c2g, c2b

        def body_single(state):
            k, cont, T1, c1r, c1g, c1b = state
            del cont
            get_dma(k % 2, k).wait()
            # Speculative prefetch before compute — see body_dual.
            @pl.when(k + 1 < num_chunks)
            def _():
                get_dma((k + 1) % 2, k + 1).start()
            data, G, geo_ok = chunk_geo(k)

            a1 = jnp.minimum(ALPHA_MAX, _u8(data[4:5, :], 24, C_OP) * G)
            ok1 = geo_ok & (a1 >= ALPHA_MIN)
            T1, c1r, c1g, c1b = chain(jnp.where(ok1, a1, 0.0), T1, c1r, c1g,
                                      c1b, _u8(data[4:5, :], 8, C_COL),
                                      _u8(data[4:5, :], 0, C_COL),
                                      _u8(data[5:6, :], 24, C_COL), triu_bf)

            cont = (k + 1 < num_chunks) & (jnp.max(T1) >= T_EPS)
            return k + 1, cont, T1, c1r, c1g, c1b

        zc = jnp.zeros((PIX, 1), jnp.float32)
        one = jnp.ones((PIX, 1), jnp.float32)

        def drain(kf):
            # A loop that stopped early (saturation) or ended left chunk
            # kf's speculative DMA in flight — wait it so semaphore state
            # stays clean across grid programs.
            @pl.when(kf < num_chunks)
            def _():
                get_dma(kf % 2, kf).wait()

        @pl.when(is_blend)
        def _():
            st = jax.lax.while_loop(
                lambda s: s[1], body_dual,
                (jnp.int32(0), num_chunks > 0, one, zc, zc, zc, one, zc, zc,
                 zc))
            kf, _, T1, c1r, c1g, c1b, T2, c2r, c2g, c2b = st
            drain(kf)
            out_ref[b] = jnp.concatenate(
                [c1r, c1g, c1b, T1, c2r, c2g, c2b, T2], axis=1)

        @pl.when(jnp.logical_not(is_blend))
        def _():
            st = jax.lax.while_loop(
                lambda s: s[1], body_single,
                (jnp.int32(0), num_chunks > 0, one, zc, zc, zc))
            kf, _, T1, c1r, c1g, c1b = st
            drain(kf)
            out_ref[b] = jnp.concatenate(
                [c1r, c1g, c1b, T1, zc, zc, zc, one], axis=1)

        return 0

    jax.lax.fori_loop(0, batch, per_tile, 0)


@functools.partial(jax.jit, static_argnames=("grid_x", "grid_y", "chunk",
                                             "power_cutoff", "interpret",
                                             "batch", "prefix_mode"))
def blend_fov_pallas(pair_data, seg_start, seg_end, tile_act,
                     grid_x, grid_y, chunk=256, power_cutoff=-4.5,
                     interpret=False, batch=8, prefix_mode="logmm"):
    """pair_data (FROW, CAP); tile_act (T, PIX, 4).

    Returns (C1 [T,PIX,3], T1 [T,PIX], C2 [T,PIX,3], T2 [T,PIX])."""
    num_tiles = grid_x * grid_y
    cap = pair_data.shape[1]
    t_pad = ((num_tiles + batch - 1) // batch) * batch
    if t_pad != num_tiles:
        pad = t_pad - num_tiles
        seg_start = jnp.concatenate([seg_start, jnp.zeros(pad, jnp.int32)])
        seg_end = jnp.concatenate([seg_end, jnp.zeros(pad, jnp.int32)])
        tile_act = jnp.concatenate(
            [tile_act, jnp.zeros((pad, PIX, 4), jnp.float32)], axis=0)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(t_pad // batch,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec((batch, PIX, 4), lambda t, *_: (t, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec((batch, PIX, 8), lambda t, *_: (t, 0, 0),
                                memory_space=pltpu.VMEM)],
        scratch_shapes=[pltpu.VMEM((2, FROW, chunk), jnp.float32),
                        pltpu.SemaphoreType.DMA((2,))],
    )
    kernel = functools.partial(_fov_kernel, grid_x=grid_x, chunk=chunk,
                               power_cutoff=power_cutoff, cap=cap,
                               batch=batch, prefix_mode=prefix_mode)
    out = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((t_pad, PIX, 8), jnp.float32)],
        interpret=interpret,
    )(seg_start, seg_end, pair_data, tile_act)[0]
    out = out[:num_tiles]
    return out[:, :, 0:3], out[:, :, 3], out[:, :, 4:7], out[:, :, 7]
