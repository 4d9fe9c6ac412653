"""Pallas TPU blend kernels (forward + backward) with custom VJP.

TPU counterpart of the reference renderCUDA forward
(..._pcheck_obb_sum/cuda_rasterizer/forward.cu:298-426) and backward
(backward.cu:400-557). One grid program per BATCH of consecutive 16x16
tiles:

  * pair attributes are stored attribute-major (ROW=16, CAP) so each chunk
    is one lane-aligned HBM slice; a program's whole batch range streams
    into a VMEM window with sub-DMAs double-buffered ACROSS programs (the
    blend_fov discipline); out-of-window chunks fall back to a direct DMA.
    Segments may be UNALIGNED — the forward floors windows to 128 and
    masks, the backward floors to the chunk and read-merge-writes the
    boundary chunk shared with earlier tiles (race-free: the grid is
    sequential and every gradient write completes synchronously),
  * the FORWARD runs the transposed orientation (PIX on lanes: per-tile
    state (1, PIX), pair-pixel matrices (chunk, PIX), output (8, PIX)
    blocks) with an exact f32 Hillis-Steele transmittance product scan —
    see _fwd_kernel for the closed-form early-termination semantics. The
    train path transposes pair rows to columns losslessly
    (_rows_to_cols_exact) and keeps alpha math bit-identical to the
    backward's recompute,
  * the BACKWARD keeps pixels on sublanes (its outputs are per-PAIR rows
    = sublane reductions) and recovers T by DIVISION from the running
    suffix product of (1 - alpha) — overflow-safe where the round-2
    exp(-log-suffix) form was not — walking chunks back-to-front from the
    deepest contributing pair (saved per-pixel n_contrib, backward.cu:503).

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

def _rows_to_cols_exact(rows, chunk: int, eye_bf):
    """(R, chunk) f32 -> (chunk, R) EXACTLY, via a bf16 x3 split one-hot
    matmul (each split part is bf16-exact, the identity passes values
    through losslessly, and the f32 accumulator adds three exact terms).
    Mosaic has no cheap vector transpose for row blocks; an MXU identity
    pass is ~free next to the blend math. R must be <= 16."""
    r = rows.shape[0]
    hi = pltpu.bitcast(pltpu.bitcast(rows, jnp.int32) & _MASK_HI,
                       jnp.float32)
    rem = rows - hi
    mid = pltpu.bitcast(pltpu.bitcast(rem, jnp.int32) & _MASK_HI,
                        jnp.float32)
    lo = rem - mid
    parts = jnp.concatenate([hi, mid, lo], axis=0).astype(jnp.bfloat16)
    out = jax.lax.dot_general(
        eye_bf, parts, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)      # (chunk, 3R)
    return out[:, 0:r] + out[:, r:2 * r] + out[:, 2 * r:3 * r]


def _prefix_prod_excl(om, chunk: int):
    """(chunk, PIX) exclusive cumprod along sublanes via log-step rolls —
    exact f32 (the train path must not round transmittances).
    Returns (excl, incl)."""
    row = jax.lax.broadcasted_iota(jnp.int32, om.shape, 0)
    pinc = om
    s = 1
    while s < chunk:
        pinc = pinc * jnp.where(row >= s, pltpu.roll(pinc, s, 0), 1.0)
        s *= 2
    excl = jnp.where(row >= 1, pltpu.roll(pinc, 1, 0), 1.0)
    return excl, pinc


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


def _fwd_kernel(seg_start_ref, seg_end_ref, pairs_hbm, out_ref,
                win, fbuf, wsem, fsem, *, grid_x: int, chunk: int,
                power_cutoff: float, cap: int, batch: int, mxu_power: bool,
                window: int, sub: int):
    """Transposed, window-streamed blend forward (the round-3 port of the
    blend_fov orientation to the train path).

    Orientation: PIX on LANES — per-tile state vectors are (1, PIX)
    (2 vregs vs 32 for the old (PIX, 1) layout), pair-pixel matrices run
    (chunk, PIX), the output block is (8, PIX). One grid program consumes
    a batch of consecutive tiles from ONE contiguous HBM range streamed
    into a VMEM window with sub-DMAs double-buffered ACROSS programs (see
    blend_fov._fov_kernel for the DMA discipline; out-of-window chunks
    fall back to a direct DMA).

    The exact train path (mxu_power=False) transposes each chunk's 9 f32
    attribute rows to (chunk, 16) columns with a bf16 x3 split identity
    matmul (lossless — see _rows_to_cols_exact) and keeps the elementwise
    power/alpha math bit-identical to the backward's recompute.
    Transmittance runs as an EXACT f32 Hillis-Steele product scan — no
    transcendentals, and the early-termination comparisons reduce to
    threshold tests because the inclusive product is non-increasing:
      T_row[j]  = T_pix * prod_{i<j}(1-a_i)        (exclusive)
      incl_T[j] = T_row[j] * (1-a_j)
      done_before[j] = T_row[j]  < T_EPS           (a trigger precedes j)
      trigger[j]     = a_j > 0 and incl_T[j] < T_EPS and not done_before
      contribute[j]  = a_j > 0 and T_row >= T_EPS and incl_T >= T_EPS
    which reproduces the reference's per-pixel done-flag semantics
    (forward.cu:380-426) without prefix-OR scans."""
    tb = pl.program_id(0)
    nprog = pl.num_programs(0)
    maxsub = window // sub

    def seg_base(p):
        t0 = jnp.minimum(p * batch, seg_start_ref.shape[0] - 1)
        return pl.multiple_of((seg_start_ref[t0] // 128) * 128, 128)

    def seg_nsub(p):
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
    win_loaded = seg_nsub(tb) * sub

    # Loop-invariant blocks, built once per program.
    pfeat = _pixel_quad_feat() if mxu_power else None
    eye_bf = (jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 0)
              == jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 1)
              ).astype(jnp.bfloat16)
    pix_i = jax.lax.broadcasted_iota(jnp.int32, (1, PIX), 1)
    lx = (pix_i % TILE).astype(jnp.float32)
    ly = (pix_i // TILE).astype(jnp.float32)

    def per_tile(b):
        t = tb * batch + b
        start = seg_start_ref[t]
        end = seg_end_ref[t]
        tx0 = (t % grid_x).astype(jnp.float32) * TILE
        ty0 = (t // grid_x).astype(jnp.float32) * TILE
        px_l = tx0 + lx                                      # (1, PIX)
        py_l = ty0 + ly
        base = pl.multiple_of((start // 128) * 128, 128)
        num_chunks = pl.cdiv(end - base, chunk)

        def read_chunk(k):
            src = pl.multiple_of(jnp.minimum(base + k * chunk, cap - chunk),
                                 128)
            woff = src - win_base
            in_win = (woff >= 0) & (woff + chunk <= win_loaded)

            @pl.when(jnp.logical_not(in_win))
            def _():
                dma = pltpu.make_async_copy(
                    pairs_hbm.at[:, pl.ds(src, chunk)], fbuf, fsem)
                dma.start()
                dma.wait()

            wdata = win[slot, :, pl.ds(
                pl.multiple_of(jnp.clip(woff, 0, window - chunk), 128),
                chunk)]
            sel = jnp.full((ROW, chunk), in_win)
            data = jnp.where(sel, wdata, fbuf[...])
            return data, src

        def chunk_alpha(data, src):
            gid_col = src + jax.lax.broadcasted_iota(
                jnp.int32, (chunk, 1), 0)
            in_seg = (gid_col >= start) & (gid_col < end)     # (chunk, 1)
            if mxu_power:
                # Inference: quantized rows [mx, my, P_caca, P_cbcc,
                # OPRGB], power as the bf16x2 bilinear MXU form in
                # tile-local coords (see blend_fov; ~2e-4 absolute).
                mxl = data[0:1, :] - tx0
                myl = data[1:2, :] - ty0
                ca = _hi(data[2:3, :]) + _lo(data[2:3, :])
                cb = _hi(data[3:4, :])
                cc = _lo(data[3:4, :])
                feat = jnp.concatenate(
                    [-0.5 * (ca * mxl * mxl + cc * myl * myl)
                     - cb * mxl * myl,
                     ca * mxl + cb * myl,
                     cc * myl + cb * mxl,
                     -0.5 * ca, -0.5 * cc, -cb,
                     jnp.zeros((2, chunk), jnp.float32)], axis=0)
                power = jax.lax.dot_general(
                    _power_split(feat), pfeat, (((0,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)       # (chunk, PIX)
                G = jnp.exp(jnp.minimum(power, 0.0))
                bits = pltpu.bitcast(data[4:5, :], jnp.int32)
                q = lambda sh: (jax.lax.shift_right_logical(bits, sh)
                                & 255).astype(jnp.float32)
                ucols = _to_cols_u8(
                    jnp.concatenate([q(24), q(16), q(8), q(0)], axis=0),
                    eye_bf)                                   # (chunk, 8)
                alpha = jnp.minimum(ALPHA_MAX, ucols[:, 0:1] * C_OP * G)
                cols_rgb = ucols[:, 1:4] * C_COL              # (chunk, 3)
                geo_ok = (power <= 3e-3) & (power >= power_cutoff) & in_seg
            else:
                cols = _rows_to_cols_exact(data[0:9], chunk, eye_bf)
                dx = cols[:, 0:1] - px_l                      # (chunk, PIX)
                dy = cols[:, 1:2] - py_l
                ca_c, cb_c, cc_c = cols[:, 2:3], cols[:, 3:4], cols[:, 4:5]
                power = (-0.5 * (ca_c * dx * dx + cc_c * dy * dy)
                         - cb_c * dx * dy)
                G = jnp.exp(jnp.minimum(power, 0.0))
                alpha = jnp.minimum(ALPHA_MAX, cols[:, 5:6] * G)
                cols_rgb = cols[:, 6:9]                       # (chunk, 3)
                geo_ok = (power <= 0.0) & (power >= power_cutoff) & in_seg
            rank = (gid_col - start + 1).astype(jnp.float32)  # (chunk, 1)
            return alpha, geo_ok, cols_rgb, rank

        def body(state):
            k, cont, T_pix, frozen, cr, cg, cb_, nc = state
            del cont
            data, src = read_chunk(k)
            alpha, geo_ok, cols_rgb, rank = chunk_alpha(data, src)

            ok = geo_ok & (alpha >= ALPHA_MIN) & (frozen < 0.5)
            a_eff = jnp.where(ok, alpha, 0.0)
            om = 1.0 - a_eff
            excl, pinc = _prefix_prod_excl(om, chunk)
            T_row = T_pix * excl                              # (chunk, PIX)
            incl_T = T_pix * pinc
            alive_row = T_row >= T_EPS
            contribute = (a_eff > 0) & alive_row & (incl_T >= T_EPS)
            trigger = (a_eff > 0) & alive_row & (incl_T < T_EPS)
            weight = jnp.where(contribute, a_eff * T_row, 0.0)

            # Color accumulation: (8, chunk) x (chunk, PIX) on the MXU
            # would round weights to bf16; colors are per-PAIR constants,
            # so sublane reductions stay exact f32 and cheap.
            wr = weight * cols_rgb[:, 0:1]
            wg = weight * cols_rgb[:, 1:2]
            wb = weight * cols_rgb[:, 2:3]
            cr = cr + jnp.sum(wr, axis=0, keepdims=True)
            cg = cg + jnp.sum(wg, axis=0, keepdims=True)
            cb_ = cb_ + jnp.sum(wb, axis=0, keepdims=True)

            # T after the chunk = incl_T at the LAST contributing pair
            # (incl_T is non-increasing, so a min-reduce reads the scan's
            # own exact product — no second scan, no reduce-multiply).
            T_pix = jnp.min(
                jnp.where(contribute, incl_T,
                          jnp.broadcast_to(T_pix, incl_T.shape)),
                axis=0, keepdims=True)
            frozen = jnp.maximum(
                frozen, jnp.max(trigger.astype(jnp.float32), axis=0,
                                keepdims=True))
            nc = jnp.maximum(nc, jnp.max(jnp.where(contribute, rank, 0.0),
                                         axis=0, keepdims=True))

            alive = jnp.where(frozen > 0.0, 0.0,
                              (T_pix >= T_EPS).astype(jnp.float32))
            cont = (k + 1 < num_chunks) & (jnp.max(alive) > 0)
            return k + 1, cont, T_pix, frozen, cr, cg, cb_, nc

        zc = jnp.zeros((1, PIX), jnp.float32)
        one = jnp.ones((1, PIX), jnp.float32)
        st = jax.lax.while_loop(
            lambda s: s[1], body,
            (jnp.int32(0), num_chunks > 0, one, zc, zc, zc, zc, zc))
        _, _, T_pix, _, cr, cg, cb_, nc = st
        out_ref[b] = jnp.concatenate(
            [cr, cg, cb_, T_pix, nc, zc, zc, zc], axis=0)     # (8, PIX)

    for b in range(batch):
        per_tile(b)


def _power_split(feat):
    """hi/lo bf16 operand split of the pair-feature block (see
    _pixel_quad_feat)."""
    fhi_f = pltpu.bitcast(pltpu.bitcast(feat, jnp.int32) & _MASK_HI,
                          jnp.float32)
    return jnp.concatenate([fhi_f.astype(jnp.bfloat16),
                            (feat - fhi_f).astype(jnp.bfloat16)], axis=0)


def _to_cols_u8(rows_f32, eye_bf):
    """(R, chunk) f32 rows holding bf16-exact values -> (chunk, R_pad)
    columns (R pads to 8: Mosaic rejects size-1 matmul output dims)."""
    r = rows_f32.shape[0]
    rows = jnp.concatenate(
        [rows_f32, jnp.zeros((8 - r, rows_f32.shape[1]), jnp.float32)],
        axis=0)
    return jax.lax.dot_general(
        eye_bf, rows.astype(jnp.bfloat16),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)


def _forward(pair_data, seg_start, seg_end, grid_x: int, grid_y: int,
             chunk: int, power_cutoff: float, interpret: bool,
             batch: int = 8, mxu_power: bool = False,
             window: int = 16384, sub: int = 2048):
    num_tiles = grid_x * grid_y
    cap = pair_data.shape[1]
    assert window % sub == 0 and chunk % 128 == 0 and sub % 128 == 0
    assert cap >= 128, cap
    sub = min(sub, (cap // 128) * 128)
    window = max(sub, min(window, (cap // sub) * sub))
    assert window >= chunk, (window, chunk)
    t_pad = ((num_tiles + batch - 1) // batch) * batch
    if t_pad != num_tiles:
        # Pad with the last real seg_end (see blend_fov: zero-padded segs
        # would drag the final batch's streaming window to lane 0).
        pad = t_pad - num_tiles
        tail = jnp.broadcast_to(seg_end[-1], (pad,)).astype(jnp.int32)
        seg_start = jnp.concatenate([seg_start, tail])
        seg_end = jnp.concatenate([seg_end, tail])
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(t_pad // batch,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[
            pl.BlockSpec((batch, 8, PIX), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[pltpu.VMEM((2, ROW, window), jnp.float32),
                        pltpu.VMEM((ROW, chunk), jnp.float32),
                        pltpu.SemaphoreType.DMA((2,)),
                        pltpu.SemaphoreType.DMA(())],
    )
    kernel = functools.partial(_fwd_kernel, grid_x=grid_x, chunk=chunk,
                               power_cutoff=power_cutoff, cap=cap,
                               batch=batch, mxu_power=mxu_power,
                               window=window, sub=sub)
    out = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((t_pad, 8, PIX), jnp.float32)],
        interpret=interpret,
    )(seg_start, seg_end, pair_data)[0]
    out = out[:num_tiles]
    # Back to the legacy (T, PIX, 4) / (T, PIX, 1) API shapes.
    color_T = out[:, 0:4, :].transpose(0, 2, 1)
    nc = out[:, 4, :, None].astype(jnp.int32)
    return color_T, nc


# --------------------------------------------------------------- backward

def _suffix_prod_lanes(x, chunk: int):
    """Inclusive suffix product along lanes (exact f32)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    s = 1
    while s < chunk:
        x = x * jnp.where(lane < chunk - s, pltpu.roll(x, chunk - s, 1),
                          1.0)
        s *= 2
    return x


def _bwd_kernel(seg_start_ref, seg_end_ref, pairs_hbm, fin_ref, grads_hbm,
                win, fbuf, gbuf, gout_ref, wsem, fsem, gsem, *, grid_x: int,
                chunk: int, power_cutoff: float, cap: int, batch: int,
                window: int, sub: int, sfx_parts: int = 3,
                dbg_no_writes: bool = False):
    """fin_ref: blocked (batch, PIX, 8) = [g_r, g_g, g_b, g_T, final_T,
    n_contrib, pad, pad] along the last axis. grads_hbm: (ROW, CAP) output.

    Pair reads ride the same cross-program window streaming as the
    forward (blend_fov DMA discipline; the backward walks chunks
    back-to-front, but the window holds the batch's whole range so access
    order is free). T is recovered by DIVISION from the running suffix
    product of (1 - alpha) — the reference backward's own trick
    (backward.cu:503) — instead of exp of the negated log-suffix: the
    log form overflows f32 when a chunk stacks enough near-opaque pairs
    (exp(+|sum log1p(-a)|) with a capped at 0.99), while the division is
    bounded by the forward's T >= T_EPS semantics and additionally
    clamped at 1. Only chunks up to the deepest contributing pair are
    processed; the caller zero-masks the rest."""
    tb = pl.program_id(0)
    nprog = pl.num_programs(0)
    maxsub = window // sub

    @pl.when(tb == 0)
    def _():
        gout_ref[0] = 0
        gout_ref[1] = 0

    def seg_base(p):
        t0 = jnp.minimum(p * batch, seg_start_ref.shape[0] - 1)
        return pl.multiple_of(
            (seg_start_ref[t0] // chunk) * chunk, chunk)

    def seg_nsub(p):
        t0 = jnp.minimum(p * batch, seg_start_ref.shape[0] - 1)
        t1 = jnp.minimum((p + 1) * batch - 1, seg_end_ref.shape[0] - 1)
        base = (seg_start_ref[t0] // chunk) * chunk
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
    win_loaded = seg_nsub(tb) * sub

    # Suffix-sum operand: X @ tril_incl (tril[k, j] = 1 for k >= j) gives
    # inclusive suffix sums along lanes on the MXU. Inputs ride as EXACT
    # bf16 x3 splits (8+8+8 >= f32's 24 mantissa bits) with f32
    # accumulation — exact f32-summation suffix sums. The lane-roll scan
    # form is also exact but costs ~8 VPU passes per operand per chunk
    # and dominated the backward before the MXU form.
    tril_bf = (jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 0)
               >= jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 1)
               ).astype(jnp.bfloat16)

    def _sfx_sum_cat(xcat, k):
        # (k*PIX, chunk) -> inclusive lane suffix sums via one MXU pass
        # over a bf16 split: sfx_parts=3 is EXACT (hi+mid+lo == x,
        # exact f32-summation suffix sums); sfx_parts=2 drops the third
        # part (~2^-17 relative per element, deterministic) for a third
        # less tril-matmul volume — measured on-chip before enabling.
        hi = pltpu.bitcast(pltpu.bitcast(xcat, jnp.int32) & _MASK_HI,
                           jnp.float32)
        rem = xcat - hi
        if sfx_parts == 2:
            parts = jnp.concatenate([hi, rem], axis=0).astype(jnp.bfloat16)
        else:
            mid = pltpu.bitcast(pltpu.bitcast(rem, jnp.int32) & _MASK_HI,
                                jnp.float32)
            parts = jnp.concatenate([hi, mid, rem - mid],
                                    axis=0).astype(jnp.bfloat16)
        out = jax.lax.dot_general(
            parts, tril_bf, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc = out[:k * PIX] + out[k * PIX:2 * k * PIX]
        if sfx_parts == 3:
            acc = acc + out[2 * k * PIX:]
        return acc

    def per_tile(b):
        t = tb * batch + b
        start = seg_start_ref[t]
        end = seg_end_ref[t]
        px, py = _pixel_coords(t, grid_x)

        fin = fin_ref[b]                         # (PIX, 8)
        g_r = fin[:, 0:1]                        # (PIX, 1)
        g_g = fin[:, 1:2]
        g_b = fin[:, 2:3]
        gT = fin[:, 3:4]
        Tf = fin[:, 4:5]
        nc = fin[:, 5:6]
        max_nc = jnp.max(nc)
        # UNALIGNED segments: chunk windows start at the chunk-floor of
        # the segment start; [start, end) masking handles the head, and
        # the boundary chunk shared with earlier tiles is
        # read-merge-written. Walk only to the deepest contributing pair.
        base = pl.multiple_of((start // chunk) * chunk, chunk)
        deepest = jnp.minimum(end, start + max_nc.astype(jnp.int32))
        num_chunks = pl.cdiv(deepest - base, chunk)

        def body(state):
            k, T_back, S_cg = state            # k counts down num_chunks..1
            kk = k - 1
            src = pl.multiple_of(
                jnp.minimum(base + kk * chunk, cap - chunk), chunk)
            woff = src - win_base
            in_win = (woff >= 0) & (woff + chunk <= win_loaded)

            @pl.when(jnp.logical_not(in_win))
            def _():
                dma = pltpu.make_async_copy(
                    pairs_hbm.at[:, pl.ds(src, chunk)], fbuf, fsem)
                dma.start()
                dma.wait()

            wdata = win[slot, :, pl.ds(
                pl.multiple_of(jnp.clip(woff, 0, window - chunk), 128),
                chunk)]
            sel = jnp.full((ROW, chunk), in_win)
            data = jnp.where(sel, wdata, fbuf[...])
            gid = src + jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1)
            in_seg = (gid >= start) & (gid < end)
            rank = (gid - start).astype(jnp.float32)         # (1, chunk)

            alpha, geo_ok, G, dx, dy = _alpha_from_chunk(data, px, py,
                                                         power_cutoff)
            contribute = geo_ok & (alpha >= ALPHA_MIN) & in_seg & (rank < nc)
            a_eff = jnp.where(contribute, alpha, 0.0)
            om = 1.0 - a_eff                                 # (PIX, chunk)

            # T before pair j = T_after_chunk / prod_{i>=j} om_i, clamped
            # at 1 (T <= 1 holds mathematically; the clamp bounds f32
            # roundoff and any impossible-state blowup). Computed as
            # T_back * suffix_prod(1/om): dL_da needs 1/om anyway, so the
            # suffix of the reciprocal replaces BOTH the om suffix AND a
            # full (PIX, chunk) division with one multiply. Overflow of
            # the reciprocal product (alpha ~0.99 stacks) saturates to
            # inf -> min(inf * T_back, 1) = 1, and T_back >= T_EPS by the
            # forward's contribute semantics, so no 0 * inf NaN exists.
            inv_om = 1.0 / om
            sfx_inv = _suffix_prod_lanes(inv_om, chunk)
            T_j = jnp.minimum(T_back * sfx_inv, 1.0)
            w = a_eff * T_j                                  # (PIX, chunk)

            # The per-channel color suffixes S_r/S_g/S_b are only ever
            # consumed as their dot with the per-pixel cotangent g — and
            # g is constant along the chunk axis, so the three channel
            # suffixes collapse to ONE suffix of w * (c . g). That cuts
            # the dominant tril-matmul operand from 3*PIX rows to PIX
            # (and drops the wr/wg/wb products): ~3x less MXU volume in
            # the hot per-chunk path.
            gc_dot_col = (g_r * data[6:7, :] + g_g * data[7:8, :]
                          + g_b * data[8:9, :])               # (PIX, chunk)
            w_cg = w * gc_dot_col
            sfx_cg = _sfx_sum_cat(w_cg, 1)                    # incl suffix
            # Suffix EXCLUSIVE of j: sum over i > j, plus deeper chunks.
            gc_dot_S = S_cg + (sfx_cg - w_cg)
            dL_da = jnp.where(
                contribute,
                gc_dot_col * T_j - (gc_dot_S + gT * Tf) * inv_om, 0.0)

            # Masked G / a_eff (identical on contributing lanes): a
            # non-finite alpha on an excluded lane must not ride 0 * NaN
            # into the reductions.
            d_op = jnp.sum(jnp.where(contribute, G, 0.0) * dL_da,
                           axis=0, keepdims=True)     # (1, chunk)
            d_power = a_eff * dL_da
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
            ], axis=0)                                       # (ROW, chunk)
            gslot = kk % 2

            def drain(s):
                @pl.when(gout_ref[s] == 1)
                def _():
                    pltpu.make_async_copy(
                        gbuf.at[s], grads_hbm.at[:, pl.ds(0, chunk)],
                        gsem.at[s]).wait()
                    gout_ref[s] = 0

            if dbg_no_writes:
                # Timing experiment: keep ALL compute live (accumulate
                # into VMEM), skip the per-chunk DMA machinery — the
                # difference against the real kernel is the write-path
                # fixed cost. RESULTS ARE WRONG in this mode.
                gbuf[0] += g_out
            else:
                # Boundary chunk shared with EARLIER tiles (lanes <
                # start): their gradient rows are already in HBM, but
                # possibly still in flight — drain ALL outstanding writes
                # before the read-merge (the only ordering point;
                # elsewhere writes go to disjoint chunk regions and stay
                # ASYNC, waited lazily only when their slot is reused).
                @pl.when((kk == 0) & (base < start))
                def _():
                    drain(0)
                    drain(1)
                    rdma = pltpu.make_async_copy(
                        grads_hbm.at[:, pl.ds(src, chunk)],
                        gbuf.at[1 - gslot], gsem.at[1 - gslot])
                    rdma.start()
                    rdma.wait()
                    lane_g = src + jax.lax.broadcasted_iota(
                        jnp.int32, (ROW, chunk), 1)
                    gbuf[gslot] = jnp.where(lane_g < start,
                                            gbuf[1 - gslot], g_out)

                @pl.when(jnp.logical_not((kk == 0) & (base < start)))
                def _():
                    drain(gslot)
                    gbuf[gslot] = g_out
                wdma = pltpu.make_async_copy(
                    gbuf.at[gslot], grads_hbm.at[:, pl.ds(src, chunk)],
                    gsem.at[gslot])
                wdma.start()
                gout_ref[gslot] = 1

            T_back = jnp.minimum(T_back * sfx_inv[:, 0:1], 1.0)
            S_cg = S_cg + sfx_cg[:, 0:1]
            return kk, T_back, S_cg

        def cond(state):
            return state[0] > 0

        zero_col = jnp.zeros((PIX, 1), jnp.float32)
        jax.lax.while_loop(cond, body, (num_chunks, Tf, zero_col))

    for b in range(batch):
        per_tile(b)

    # Last program: drain any in-flight gradient writes.
    @pl.when(tb == nprog - 1)
    def _():
        for s_ in (0, 1):
            @pl.when(gout_ref[s_] == 1)
            def _(s_=s_):
                pltpu.make_async_copy(
                    gbuf.at[s_], grads_hbm.at[:, pl.ds(0, chunk)],
                    gsem.at[s_]).wait()
                gout_ref[s_] = 0


def _backward(pair_data, seg_start, seg_end, fin, n_contrib_max,
              grid_x: int, grid_y: int, chunk: int, power_cutoff: float,
              interpret: bool, batch: int = 8, window: int = 16384,
              sub: int = 2048, sfx_parts: int = 3,
              dbg_no_writes: bool = False):
    num_tiles = grid_x * grid_y
    cap = pair_data.shape[1]
    assert window % sub == 0 and chunk % 128 == 0 and sub % 128 == 0
    assert cap >= 128, cap
    sub = min(sub, (cap // 128) * 128)
    window = max(sub, min(window, (cap // sub) * sub))
    assert window >= chunk, (window, chunk)
    seg_start0, seg_end0 = seg_start, seg_end
    t_pad = ((num_tiles + batch - 1) // batch) * batch
    if t_pad != num_tiles:
        pad = t_pad - num_tiles
        tail = jnp.broadcast_to(seg_end[-1], (pad,)).astype(jnp.int32)
        seg_start = jnp.concatenate([seg_start, tail])
        seg_end = jnp.concatenate([seg_end, tail])
        fin = jnp.concatenate(
            [fin, jnp.zeros((pad, PIX, 8), jnp.float32)], axis=0)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(t_pad // batch,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec((batch, PIX, 8), lambda t, *_: (t, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        scratch_shapes=[pltpu.VMEM((2, ROW, window), jnp.float32),
                        pltpu.VMEM((ROW, chunk), jnp.float32),
                        pltpu.VMEM((2, ROW, chunk), jnp.float32),
                        pltpu.SMEM((2,), jnp.int32),
                        pltpu.SemaphoreType.DMA((2,)),
                        pltpu.SemaphoreType.DMA(()),
                        pltpu.SemaphoreType.DMA((2,))],
    )
    kernel = functools.partial(_bwd_kernel, grid_x=grid_x, chunk=chunk,
                               power_cutoff=power_cutoff, cap=cap,
                               batch=batch, window=window, sub=sub,
                               sfx_parts=sfx_parts,
                               dbg_no_writes=dbg_no_writes)
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

@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7, 8, 9))
def blend_pallas(pair_data, seg_start, seg_end, grid_x, grid_y, chunk,
                 power_cutoff, interpret, bwd_chunk=None, sfx_parts=3):
    """Differentiable Pallas blend over a chunk-aligned SoA pair list.

    pair_data: (ROW, CAP) f32. Returns (tile_color [T,PIX,3],
    final_T [T,PIX], n_contrib [T,PIX] i32). bwd_chunk overrides the
    backward walk's chunk (measured fastest at 128 vs the forward's
    256 at bench scale — scripts/probe_bwd_variants.py).
    """
    out, nc = _forward(pair_data, seg_start, seg_end, grid_x, grid_y, chunk,
                       power_cutoff, interpret)
    return out[:, :, 0:3], out[:, :, 3], nc[:, :, 0]


def _blend_pallas_fwd(pair_data, seg_start, seg_end, grid_x, grid_y, chunk,
                      power_cutoff, interpret, bwd_chunk=None, sfx_parts=3):
    out, nc = _forward(pair_data, seg_start, seg_end, grid_x, grid_y, chunk,
                       power_cutoff, interpret)
    res = (pair_data, seg_start, seg_end, out[:, :, 3], nc[:, :, 0])
    return (out[:, :, 0:3], out[:, :, 3], nc[:, :, 0]), res


def _blend_pallas_bwd(grid_x, grid_y, chunk, power_cutoff, interpret,
                      bwd_chunk, sfx_parts, res, g):
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
                      grid_x, grid_y, bwd_chunk or chunk, power_cutoff,
                      interpret, sfx_parts=sfx_parts)
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
