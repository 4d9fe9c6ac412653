"""Pallas TPU blend kernels (forward + backward) with custom VJP.

TPU counterpart of the reference renderCUDA forward
(..._pcheck_obb_sum/cuda_rasterizer/forward.cu:298-426) and backward
(backward.cu:400-557). One grid program per 16x16 tile:

  * pair attributes are stored attribute-major (ROW=16, CAP) so each chunk
    is one lane-aligned HBM slice; chunks stream HBM->VMEM with
    double-buffered async DMA; segments may be UNALIGNED — the forward
    floors windows to 128 and masks, and the backward floors to the chunk
    and read-merge-writes the boundary chunk shared with earlier tiles
    (race-free: the grid is sequential and every gradient write completes
    synchronously),
  * compute runs in (PIX, chunk) orientation: pixels on sublanes, pairs on
    lanes; the sequential early-exit semantics are applied in closed form
    with upper-triangular matmul prefix sums on the MXU (cumsum/cumprod are
    not lowered by Mosaic; measured faster than log-step VPU rolls),
  * the forward loop exits once every pixel saturates (T < 1e-4) — the CUDA
    block-vote break; the backward walks chunks back-to-front starting at
    the deepest contributing chunk (from the saved per-pixel n_contrib),
    recovering T by division from the saved final_T (backward.cu:503).

Row layout: [mx, my, ca, cb, cc, op, r, g, b, pad...]. Gradients come back
in the same SoA layout and are unpacked/segment-summed by the caller's
autodiff.
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
ROW = 16          # packed attributes per pair

_MASK_HI = -65536                     # 0xFFFF0000


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


C_OP = 1.0 / 255.0    # u8 opacity step == ALPHA_MIN
C_COL = 2.0 / 255.0   # u8 color step on [0, 2]


def pack_pairs(mean2d, conic, opacity, color):
    """(CAP,2),(CAP,3),(CAP,),(CAP,3) -> (ROW, CAP) f32 attribute-major."""
    cap = mean2d.shape[0]
    zeros = jnp.zeros(cap, jnp.float32)
    return jnp.stack([
        mean2d[:, 0], mean2d[:, 1],
        conic[:, 0], conic[:, 1], conic[:, 2],
        opacity,
        color[:, 0], color[:, 1], color[:, 2],
        zeros, zeros, zeros, zeros, zeros, zeros, zeros,
    ], axis=0)


def unpack_grads(g):
    """(ROW, CAP) -> (d_mean2d (CAP,2), d_conic (CAP,3), d_opacity (CAP,),
    d_color (CAP,3))."""
    return (jnp.stack([g[0], g[1]], -1), jnp.stack([g[2], g[3], g[4]], -1),
            g[5], jnp.stack([g[6], g[7], g[8]], -1))


def _prefix_lanes_incl(x):
    """Inclusive prefix sum along the lane axis (axis 1) via log-step rolls
    — exact f32 on the VPU."""
    n = x.shape[1]
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    s = 1
    while s < n:
        shifted = pltpu.roll(x, s, 1)
        x = x + jnp.where(lane >= s, shifted, 0.0)
        s *= 2
    return x


def _triu_strict(chunk):
    """M[k, j] = 1 if k < j  (x @ M = exclusive prefix along lanes)."""
    return (jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 0)
            < jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 1)
            ).astype(jnp.float32)


def _triu_incl(chunk):
    return (jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 0)
            <= jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 1)
            ).astype(jnp.float32)


def _pixel_coords(t, grid_x):
    pix_i = jax.lax.broadcasted_iota(jnp.int32, (PIX, 1), 0)
    lx = (pix_i % TILE).astype(jnp.float32)
    ly = (pix_i // TILE).astype(jnp.float32)
    px = (t % grid_x).astype(jnp.float32) * TILE + lx       # (PIX, 1)
    py = (t // grid_x).astype(jnp.float32) * TILE + ly
    return px, py


def _alpha_from_chunk(data, px, py, power_cutoff):
    """data (ROW, chunk); px/py (PIX, 1). Returns (PIX, chunk) arrays."""
    mx = data[0:1, :]
    my = data[1:2, :]
    ca = data[2:3, :]
    cb = data[3:4, :]
    cc = data[4:5, :]
    op = data[5:6, :]
    dx = mx - px                       # (PIX, chunk)
    dy = my - py
    power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
    G = jnp.exp(jnp.minimum(power, 0.0))
    alpha = jnp.minimum(ALPHA_MAX, op * G)
    geo_ok = (power <= 0.0) & (power >= power_cutoff)
    return alpha, geo_ok, G, dx, dy


# --------------------------------------------------------------- forward

def _pixel_quad_feat():
    """(PIX, 16) tile-independent pixel quadratic features in LOCAL coords,
    duplicated along K for the bf16x2 pair-feature split: power(p, j) =
    pfeat(p) @ [hi(feat); lo(feat)](j) in ONE bf16 MXU pass. The pixel
    features are small integers (<= 225), hence bf16-EXACT; splitting the
    pair features hi/lo gives ~2^-17 relative error — with tile-local
    coords every |term| is O(10) under the OBB cull, so absolute power
    error ~2e-4 (invisible after exp). Mosaic has no Precision.HIGH."""
    pix_i = jax.lax.broadcasted_iota(jnp.int32, (PIX, 1), 0)
    lx = (pix_i % TILE).astype(jnp.float32)
    ly = (pix_i // TILE).astype(jnp.float32)
    pf = jnp.concatenate(
        [jnp.ones((PIX, 1), jnp.float32), lx, ly, lx * lx, ly * ly,
         lx * ly, jnp.zeros((PIX, 2), jnp.float32)], axis=1)
    return jnp.concatenate([pf, pf], axis=1).astype(jnp.bfloat16)


def _power_mxu(pfeat2, feat):
    """feat (8, chunk) f32 pair features -> power (PIX, chunk) f32 via one
    bf16 MXU pass with an exact hi/lo operand split (see _pixel_quad_feat)."""
    # Masked truncation, not astype(bf16).astype(f32): XLA's
    # excess-precision fold can elide a convert pair (foveated._trunc_bf16)
    # and zero the lo operand; the masked form cannot regress.
    fhi_f = pltpu.bitcast(pltpu.bitcast(feat, jnp.int32) & -65536,
                          jnp.float32)
    fhi = fhi_f.astype(jnp.bfloat16)
    flo = (feat - fhi_f).astype(jnp.bfloat16)
    feat2 = jnp.concatenate([fhi, flo], axis=0)          # (16, chunk)
    return jax.lax.dot_general(
        pfeat2, feat2, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def _fwd_kernel(seg_start_ref, seg_end_ref, pairs_hbm, out_ref, nc_ref,
                buf, sem, *, grid_x: int, chunk: int, power_cutoff: float,
                cap: int, batch: int, mxu_power: bool):
    tb = pl.program_id(0)
    # Loop-invariant blocks, built once per program.
    triu = _triu_strict(chunk)
    pfeat = _pixel_quad_feat() if mxu_power else None
    # batch consecutive tiles per grid program: per-program launch overhead
    # (~9 us) dwarfs one tile's compute (~2 us), so amortize it.
    jax.lax.fori_loop(
        0, batch,
        functools.partial(_fwd_one_tile, tb=tb, seg_start_ref=seg_start_ref,
                          seg_end_ref=seg_end_ref, pairs_hbm=pairs_hbm,
                          out_ref=out_ref, nc_ref=nc_ref, buf=buf, sem=sem,
                          grid_x=grid_x, chunk=chunk, triu=triu,
                          pfeat=pfeat,
                          power_cutoff=power_cutoff, cap=cap, batch=batch),
        0)


def _fwd_one_tile(b, carry, *, tb, seg_start_ref, seg_end_ref, pairs_hbm,
                  out_ref, nc_ref, buf, sem, grid_x: int, chunk: int,
                  triu, pfeat, power_cutoff: float, cap: int, batch: int):
    t = tb * batch + b
    start = seg_start_ref[t]
    end = seg_end_ref[t]
    px, py = _pixel_coords(t, grid_x)
    tx0 = (t % grid_x).astype(jnp.float32) * TILE
    ty0 = (t // grid_x).astype(jnp.float32) * TILE
    # DMA windows start at the 128-aligned floor of the segment start, so
    # the kernel accepts UNALIGNED segments too (inference path skips
    # binning.align_segments); masking by [start, end) handles the head.
    base = pl.multiple_of((start // 128) * 128, 128)
    num_chunks = pl.cdiv(end - base, chunk)

    def get_dma(slot, k):
        src = pl.multiple_of(jnp.minimum(base + k * chunk, cap - chunk), 128)
        return pltpu.make_async_copy(pairs_hbm.at[:, pl.ds(src, chunk)],
                                     buf.at[slot], sem.at[slot])

    @pl.when(num_chunks > 0)
    def _():
        get_dma(0, 0).start()

    def body(state):
        k, cont, T_pix, frozen, cr, cg, cb_, nc = state
        del cont
        get_dma(k % 2, k).wait()
        # Speculative prefetch BEFORE compute (the kernel is otherwise
        # DMA-latency bound, ~1.4 us exposed per chunk). The address is
        # clamped so the read is always safe; the drain step after the loop
        # waits any in-flight copy — every started DMA is waited.
        @pl.when(k + 1 < num_chunks)
        def _():
            get_dma((k + 1) % 2, k + 1).start()
        data = buf[k % 2]
        src = pl.multiple_of(jnp.minimum(base + k * chunk, cap - chunk), 128)
        gid = src + jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1)
        in_seg = (gid >= start) & (gid < end)

        if pfeat is not None:
            # Inference path: quantized pair rows (expand_ps1_pallas
            # layout: [mx, my, P_caca, P_cbcc, OPRGB]) and power as a
            # bilinear form on the MXU in tile-local coords (see
            # blend_fov); |terms| <= O(10) under the OBB cull, so HIGH
            # precision is ~2e-4 absolute in power. The training path
            # keeps f32 rows and the elementwise form — its backward
            # recomputes alpha elementwise and must match bitwise.
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
                 jnp.zeros((2, chunk), jnp.float32)], axis=0)
            power = _power_mxu(pfeat, feat)
            G = jnp.exp(jnp.minimum(power, 0.0))
            alpha = jnp.minimum(ALPHA_MAX, _u8(data[4:5, :], 24, C_OP) * G)
            col_r = _u8(data[4:5, :], 16, C_COL)
            col_g = _u8(data[4:5, :], 8, C_COL)
            col_b = _u8(data[4:5, :], 0, C_COL)
            # power is analytically <= 0; the exact-path <=0 test only
            # guards numerical noise. MXU roundoff (~2e-4) near a
            # Gaussian's CENTER (power ~ 0) must not drop a full-opacity
            # contribution -> small positive tolerance (G clamps at 1).
            geo_ok = (power <= 3e-3) & (power >= power_cutoff)
        else:
            alpha, geo_ok, _, _, _ = _alpha_from_chunk(data, px, py,
                                                       power_cutoff)
            col_r = data[6:7, :]
            col_g = data[7:8, :]
            col_b = data[8:9, :]
        ok = geo_ok & (alpha >= ALPHA_MIN) & in_seg
        a_eff = jnp.where(ok, alpha, 0.0)

        # Cross-chunk pixel freeze (the CUDA per-pixel 'done' flag,
        # forward.cu:380-426): a pixel that triggered T < T_EPS in an
        # EARLIER chunk must not resume accumulating here even though its
        # carried T_pix still sits above the threshold. Carried as f32
        # 0/1: Mosaic cannot legalize i1 VECTOR while-loop carries
        # (scf.yield layout error on the real TPU; interpret mode hid it).
        a_eff = jnp.where(frozen > 0.0, 0.0, a_eff)
        one_minus = 1.0 - a_eff
        logs = jnp.log1p(-a_eff)
        # Prefix sums as one fused upper-triangular matmul on the MXU
        # (measured faster than log-step rolls on the VPU).
        excl = jnp.dot(logs, triu, preferred_element_type=jnp.float32)
        T_row = T_pix * jnp.exp(excl)                        # T before j
        incl = T_row * one_minus
        trigger = (a_eff > 0) & (incl < T_EPS)
        done_before = jnp.dot(trigger.astype(jnp.float32), triu,
                              preferred_element_type=jnp.float32) > 0
        contribute = (a_eff > 0) & ~trigger & ~done_before
        frozen = jnp.maximum(frozen,
                             jnp.max(trigger.astype(jnp.float32), axis=1,
                                     keepdims=True))
        weight = jnp.where(contribute, a_eff * T_row, 0.0)   # (PIX, chunk)

        cr = cr + jnp.sum(weight * col_r, axis=1, keepdims=True)
        cg = cg + jnp.sum(weight * col_g, axis=1, keepdims=True)
        cb_ = cb_ + jnp.sum(weight * col_b, axis=1, keepdims=True)

        log_delta = jnp.sum(jnp.where(contribute, logs, 0.0), axis=1,
                            keepdims=True)                   # (PIX, 1)
        T_pix = T_pix * jnp.exp(log_delta)

        rank = (gid - start + 1).astype(jnp.float32)         # (1, chunk)
        nc = jnp.maximum(nc, jnp.max(jnp.where(contribute, rank, 0.0),
                                     axis=1, keepdims=True))

        alive = jnp.where(frozen > 0.0, 0.0,
                          (T_pix >= T_EPS).astype(jnp.float32))
        cont = (k + 1 < num_chunks) & (jnp.max(alive) > 0)
        return k + 1, cont, T_pix, frozen, cr, cg, cb_, nc

    def cond(state):
        return state[1]

    init = (jnp.int32(0), num_chunks > 0, jnp.ones((PIX, 1), jnp.float32),
            jnp.zeros((PIX, 1), jnp.float32),
            jnp.zeros((PIX, 1), jnp.float32), jnp.zeros((PIX, 1), jnp.float32),
            jnp.zeros((PIX, 1), jnp.float32), jnp.zeros((PIX, 1), jnp.float32))
    kf, _, T_pix, _, cr, cg, cb_, nc = jax.lax.while_loop(cond, body, init)

    # Drain: an early (saturation) exit left chunk kf's speculative DMA in
    # flight — wait it so semaphore state stays clean for the next tile.
    @pl.when(kf < num_chunks)
    def _():
        get_dma(kf % 2, kf).wait()

    out_ref[b] = jnp.concatenate([cr, cg, cb_, T_pix], axis=1)  # (PIX, 4)
    nc_ref[b] = nc.astype(jnp.int32)
    return carry


def _forward(pair_data, seg_start, seg_end, grid_x: int, grid_y: int,
             chunk: int, power_cutoff: float, interpret: bool,
             batch: int = 8, mxu_power: bool = False):
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
            pl.BlockSpec((batch, PIX, 1), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[pltpu.VMEM((2, ROW, chunk), jnp.float32),
                        pltpu.SemaphoreType.DMA((2,))],
    )
    kernel = functools.partial(_fwd_kernel, grid_x=grid_x, chunk=chunk,
                               power_cutoff=power_cutoff, cap=cap,
                               batch=batch, mxu_power=mxu_power)
    out, nc = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((t_pad, PIX, 4), jnp.float32),
                   jax.ShapeDtypeStruct((t_pad, PIX, 1), jnp.int32)],
        interpret=interpret,
    )(seg_start, seg_end, pair_data)
    return out[:num_tiles], nc[:num_tiles]


# --------------------------------------------------------------- backward

def _bwd_kernel(seg_start_ref, seg_end_ref, pairs_hbm, fin_ref, grads_hbm,
                buf, gbuf, sem, gsem, *, grid_x: int, chunk: int,
                power_cutoff: float, cap: int, batch: int):
    """fin_ref: blocked (batch, PIX, 8) = [g_r, g_g, g_b, g_T, final_T,
    n_contrib, pad, pad] along the last axis. grads_hbm: (ROW, CAP) output.

    Only chunks up to the deepest contributing pair (max n_contrib) are
    processed; the caller zero-masks the rest. batch consecutive tiles per
    grid program (amortizes per-program launch overhead)."""
    tb = pl.program_id(0)
    jax.lax.fori_loop(
        0, batch,
        functools.partial(_bwd_one_tile, tb=tb, seg_start_ref=seg_start_ref,
                          seg_end_ref=seg_end_ref, pairs_hbm=pairs_hbm,
                          fin_ref=fin_ref, grads_hbm=grads_hbm, buf=buf,
                          gbuf=gbuf, sem=sem, gsem=gsem, grid_x=grid_x,
                          chunk=chunk, power_cutoff=power_cutoff, cap=cap,
                          batch=batch),
        0)


def _bwd_one_tile(b, carry, *, tb, seg_start_ref, seg_end_ref, pairs_hbm,
                  fin_ref, grads_hbm, buf, gbuf, sem, gsem, grid_x: int,
                  chunk: int, power_cutoff: float, cap: int, batch: int):
    t = tb * batch + b
    start = seg_start_ref[t]
    end = seg_end_ref[t]
    n = end - start
    px, py = _pixel_coords(t, grid_x)

    fin = fin_ref[b]                         # (PIX, 8)
    g_r = fin[:, 0:1]                        # (PIX, 1)
    g_g = fin[:, 1:2]
    g_b = fin[:, 2:3]
    gT = fin[:, 3:4]
    Tf = fin[:, 4:5]
    nc = fin[:, 5:6]
    max_nc = jnp.max(nc)
    # UNALIGNED segments: chunk windows start at the chunk-floor of the
    # segment start; [start, end) masking handles the head, and the
    # boundary chunk shared with earlier tiles is read-merge-written (see
    # the write step below). Walk only to the deepest contributing pair.
    base = pl.multiple_of((start // chunk) * chunk, chunk)
    deepest = jnp.minimum(end, start + max_nc.astype(jnp.int32))
    num_chunks = pl.cdiv(deepest - base, chunk)

    def get_dma(slot, k):
        src = pl.multiple_of(jnp.minimum(base + k * chunk, cap - chunk),
                             chunk)
        return pltpu.make_async_copy(pairs_hbm.at[:, pl.ds(src, chunk)],
                                     buf.at[slot], sem.at[slot])

    @pl.when(num_chunks > 0)
    def _():
        get_dma((num_chunks - 1) % 2, num_chunks - 1).start()

    def body(state):
        k, T_back, S_r, S_g, S_b = state     # k counts down num_chunks..1
        kk = k - 1

        @pl.when(kk > 0)
        def _():
            get_dma((kk - 1) % 2, kk - 1).start()

        get_dma(kk % 2, kk).wait()
        data = buf[kk % 2]
        src = pl.multiple_of(jnp.minimum(base + kk * chunk, cap - chunk),
                             chunk)
        gid = src + jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1)
        in_seg = (gid >= start) & (gid < end)
        rank = (gid - start).astype(jnp.float32)             # (1, chunk)

        alpha, geo_ok, G, dx, dy = _alpha_from_chunk(data, px, py,
                                                     power_cutoff)
        contribute = geo_ok & (alpha >= ALPHA_MIN) & in_seg & (rank < nc)
        a_eff = jnp.where(contribute, alpha, 0.0)
        logs = jnp.log1p(-a_eff)                             # (PIX, chunk)

        triu_i = _triu_incl(chunk)
        inc = jnp.dot(logs, triu_i, preferred_element_type=jnp.float32)
        seg_total = jnp.sum(logs, axis=1, keepdims=True)     # (PIX, 1)
        T_j = T_back * jnp.exp(-(seg_total - inc + logs))
        w = a_eff * T_j                                      # (PIX, chunk)

        wr = w * data[6:7, :]
        wg = w * data[7:8, :]
        wb = w * data[8:9, :]
        Winc_r = jnp.dot(wr, triu_i, preferred_element_type=jnp.float32)
        Winc_g = jnp.dot(wg, triu_i, preferred_element_type=jnp.float32)
        Winc_b = jnp.dot(wb, triu_i, preferred_element_type=jnp.float32)
        tot_r = jnp.sum(wr, axis=1, keepdims=True)
        tot_g = jnp.sum(wg, axis=1, keepdims=True)
        tot_b = jnp.sum(wb, axis=1, keepdims=True)
        Sr_j = S_r + (tot_r - Winc_r)
        Sg_j = S_g + (tot_g - Winc_g)
        Sb_j = S_b + (tot_b - Winc_b)

        gc_dot_col = (g_r * data[6:7, :] + g_g * data[7:8, :]
                      + g_b * data[8:9, :])
        gc_dot_S = g_r * Sr_j + g_g * Sg_j + g_b * Sb_j
        inv_om = 1.0 / (1.0 - a_eff)
        dL_da = jnp.where(contribute,
                          gc_dot_col * T_j - (gc_dot_S + gT * Tf) * inv_om,
                          0.0)

        d_op = jnp.sum(G * dL_da, axis=0, keepdims=True)     # (1, chunk)
        d_power = alpha * dL_da
        ca = data[2:3, :]
        cb = data[3:4, :]
        cc = data[4:5, :]
        d_dx = d_power * (-(ca * dx + cb * dy))
        d_dy = d_power * (-(cc * dy + cb * dx))

        zero = jnp.zeros((1, chunk), jnp.float32)
        g_out = jnp.concatenate([
            jnp.sum(d_dx, axis=0, keepdims=True),
            jnp.sum(d_dy, axis=0, keepdims=True),
            jnp.sum(d_power * (-0.5 * dx * dx), axis=0, keepdims=True),
            jnp.sum(d_power * (-dx * dy), axis=0, keepdims=True),
            jnp.sum(d_power * (-0.5 * dy * dy), axis=0, keepdims=True),
            d_op,
            jnp.sum(w * g_r, axis=0, keepdims=True),
            jnp.sum(w * g_g, axis=0, keepdims=True),
            jnp.sum(w * g_b, axis=0, keepdims=True),
            zero, zero, zero, zero, zero, zero, zero,
        ], axis=0)                                           # (ROW, chunk)
        slot = kk % 2
        # Boundary chunk shared with EARLIER tiles (lanes < start): their
        # gradient rows are already in HBM (the grid is sequential and
        # every write below completes synchronously), so read-merge-write
        # keeps them. Lanes >= end carry zeros here and are merged over by
        # the LATER tile that owns them, in its own boundary pass.
        @pl.when((kk == 0) & (base < start))
        def _():
            rdma = pltpu.make_async_copy(
                grads_hbm.at[:, pl.ds(src, chunk)], gbuf.at[1 - slot],
                gsem.at[1 - slot])
            rdma.start()
            rdma.wait()
            lane_g = src + jax.lax.broadcasted_iota(
                jnp.int32, (ROW, chunk), 1)
            gbuf[slot] = jnp.where(lane_g < start, gbuf[1 - slot], g_out)

        @pl.when(jnp.logical_not((kk == 0) & (base < start)))
        def _():
            gbuf[slot] = g_out
        wdma = pltpu.make_async_copy(gbuf.at[slot],
                                     grads_hbm.at[:, pl.ds(src, chunk)],
                                     gsem.at[slot])
        wdma.start()
        wdma.wait()

        T_back = T_back * jnp.exp(-seg_total)
        S_r = S_r + tot_r
        S_g = S_g + tot_g
        S_b = S_b + tot_b
        return kk, T_back, S_r, S_g, S_b

    def cond(state):
        return state[0] > 0

    zero_col = jnp.zeros((PIX, 1), jnp.float32)
    jax.lax.while_loop(cond, body, (num_chunks, Tf, zero_col, zero_col,
                                    zero_col))
    return carry


def _backward(pair_data, seg_start, seg_end, fin, n_contrib_max,
              grid_x: int, grid_y: int, chunk: int, power_cutoff: float,
              interpret: bool, batch: int = 8):
    num_tiles = grid_x * grid_y
    cap = pair_data.shape[1]
    seg_start0, seg_end0 = seg_start, seg_end
    t_pad = ((num_tiles + batch - 1) // batch) * batch
    if t_pad != num_tiles:
        pad = t_pad - num_tiles
        seg_start = jnp.concatenate([seg_start, jnp.zeros(pad, jnp.int32)])
        seg_end = jnp.concatenate([seg_end, jnp.zeros(pad, jnp.int32)])
        fin = jnp.concatenate(
            [fin, jnp.zeros((pad, PIX, 8), jnp.float32)], axis=0)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(t_pad // batch,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec((batch, PIX, 8), lambda t, *_: (t, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        scratch_shapes=[pltpu.VMEM((2, ROW, chunk), jnp.float32),
                        pltpu.VMEM((2, ROW, chunk), jnp.float32),
                        pltpu.SemaphoreType.DMA((2,)),
                        pltpu.SemaphoreType.DMA((2,))],
    )
    kernel = functools.partial(_bwd_kernel, grid_x=grid_x, chunk=chunk,
                               power_cutoff=power_cutoff, cap=cap,
                               batch=batch)
    grads = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((ROW, cap), jnp.float32)],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(seg_start, seg_end, pair_data, fin)[0]
    # Rows whose chunk was never processed (beyond the deepest contributor,
    # or outside any segment) are uninitialized: zero them. The kernel's
    # chunk windows start at the chunk-floor of each (unaligned) segment
    # start, so tile t's written rows cover [start_t, min(end_t,
    # floor(start_t) + nchunks_t * chunk)). Row->tile lookup via
    # boundary-scatter + cumsum (searchsorted over millions of rows is
    # very slow on TPU).
    base_t = (seg_start0 // chunk) * chunk
    deepest_t = jnp.minimum(seg_end0, seg_start0 + n_contrib_max)
    nchunks_t = (jnp.maximum(deepest_t - base_t, 0) + chunk - 1) // chunk
    cover_end = jnp.minimum(seg_end0, base_t + nchunks_t * chunk)
    marks = jnp.zeros(cap, jnp.int32).at[seg_start0[1:]].add(1, mode='drop')
    idx = jnp.cumsum(marks)                                  # tile per row
    row = jnp.arange(cap, dtype=jnp.int32)
    within = (row >= jnp.take(seg_start0, idx)) & \
             (row < jnp.take(cover_end, idx))
    return jnp.where(within[None, :], grads, 0.0)


# --------------------------------------------------------------- public API

@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def blend_pallas(pair_data, seg_start, seg_end, grid_x, grid_y, chunk,
                 power_cutoff, interpret):
    """Differentiable Pallas blend over a chunk-aligned SoA pair list.

    pair_data: (ROW, CAP) f32. Returns (tile_color [T,PIX,3],
    final_T [T,PIX], n_contrib [T,PIX] i32).
    """
    out, nc = _forward(pair_data, seg_start, seg_end, grid_x, grid_y, chunk,
                       power_cutoff, interpret)
    return out[:, :, 0:3], out[:, :, 3], nc[:, :, 0]


def _blend_pallas_fwd(pair_data, seg_start, seg_end, grid_x, grid_y, chunk,
                      power_cutoff, interpret):
    out, nc = _forward(pair_data, seg_start, seg_end, grid_x, grid_y, chunk,
                       power_cutoff, interpret)
    res = (pair_data, seg_start, seg_end, out[:, :, 3], nc[:, :, 0])
    return (out[:, :, 0:3], out[:, :, 3], nc[:, :, 0]), res


def _blend_pallas_bwd(grid_x, grid_y, chunk, power_cutoff, interpret, res, g):
    pair_data, seg_start, seg_end, final_T, n_contrib = res
    g_color, g_T, _ = g
    num_tiles = grid_x * grid_y
    fin = jnp.zeros((num_tiles, PIX, 8), jnp.float32)
    fin = fin.at[:, :, 0:3].set(g_color)
    fin = fin.at[:, :, 3].set(g_T)
    fin = fin.at[:, :, 4].set(final_T)
    fin = fin.at[:, :, 5].set(n_contrib.astype(jnp.float32))
    nc_max = jnp.max(n_contrib, axis=1)
    grads = _backward(pair_data, seg_start, seg_end, fin, nc_max,
                      grid_x, grid_y, chunk, power_cutoff, interpret)
    return grads, None, None


blend_pallas.defvjp(_blend_pallas_fwd, _blend_pallas_bwd)


@functools.partial(jax.jit, static_argnames=("grid_x", "grid_y", "chunk",
                                             "power_cutoff", "interpret",
                                             "batch"))
def blend_pallas_fwd_only(pair_data, seg_start, seg_end, grid_x, grid_y,
                          chunk=256, power_cutoff=-4.5, interpret=False,
                          batch=8):
    """Forward-only blend over an UNALIGNED tile-sorted pair list (the
    inference path: no binning.align_segments needed — the kernel floors
    DMA windows to 128 and masks). Not differentiable; training uses
    blend_pallas on a chunk-aligned layout."""
    out, nc = _forward(pair_data, seg_start, seg_end, grid_x, grid_y, chunk,
                       power_cutoff, interpret, batch=batch, mxu_power=True)
    return out[:, :, 0:3], out[:, :, 3], nc[:, :, 0]
