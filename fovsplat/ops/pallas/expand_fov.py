"""Fused Pallas pair-expansion kernel for the foveated path.

Replaces the XLA mid-section of binning (expansion row gathers + OBB cull +
per-pair foveation-level math + per-level attribute selection) with ONE
kernel pass over the pair list. This is the TPU answer to the reference's
``duplicateWithKeys`` + ``filter`` + ``compute_fov_colors`` kernels
(diff-gaussian-rasterization_fov_pcheck_obb/cuda_rasterizer/
rasterizer_impl.cu:264-383,489-531), whose CUDA form leans on global
scatter; here every per-pair value is computed in VMEM and written once.

Key idea: after the depth presort, the pair->Gaussian map ``g`` is
NON-DECREASING, so the Gaussians of any 512-pair chunk live in a window of
at most 512+1 consecutive rows of the depth-ordered attribute table. The
"gather" is then a one-hot matmul on the MXU:

    expanded (32, chunk) = dtable_window (32, W) @ onehot (W, chunk)

with ``precision=HIGHEST`` the result is exact f32 (integer columns up to
2^24 round-trip exactly). XLA-level row gathers cost ~45-55 ms per CAP=3M
pairs on a v5e; this kernel does the same work in a few ms because the
window streams HBM->VMEM sequentially.

The per-pair foveation level is recomputed analytically (no per-tile table
lookup). arccos/tan are evaluated as series (Mosaic has no trig lowering):
|error| < 1e-5 in level units — a tile only flips its level selection if
its fractional level sits within that distance of an integer boundary,
where the smoothstep blend makes adjacent levels near-identical anyway.

dtable: (DROWS=64, N_pad) bf16 SPLIT-ROW table (layout and exactness
rationale in foveated.build_fov_dtable), ORIGINAL Gaussian order (no depth
presort — a 33-operand payload sort wedges the XLA TPU compiler for tens of
minutes, and argsort+row-gathers cost ~72 ms at 1.16M rows; instead every
invalid row contributes one dummy culled pair (hl = -2) so the pair->row
map still advances at least one row per pair and the window bound holds in
any order; depth rides the kernel output inside the fused sort key).
Exact f32 values (ints, coords, depth, ca) ride as bf16 x3 splits whose
part sums reconstruct the f32 bit-exactly; OBB axes/extents as x2
(~2^-17 relative); per-level colors/opacities as single bf16 (they are
bf16-packed for the sort anyway). The expansion is then ONE bf16 one-hot
matmul — a small-M f32-HIGHEST matmul runs 6 passes at <15% MXU
utilization and dominated the kernel before this layout.

Output is COMPACTED: culled pairs (out of range, OBB-rejected,
level-culled, and every invalid-row dummy) are dropped in-kernel before
they ever reach HBM, so the tile sort runs over kept pairs only (~40% of
the candidate capacity on the bench workload — the sort is the single
largest frame cost and scales linearly with its input). Mechanics: the
TPU grid is sequential and scratch persists across programs, so the
kernel keeps a running kept-count in SMEM; each chunk ranks its kept
lanes with a strictly-upper-triangular prefix matmul, routes them
through a transposed one-hot permutation matmul to lanes
[tail, tail+kept) of a (OROWS, chunk+128) staging block, merges the
<=127 unflushed lanes carried from the previous chunk, and DMAs the
whole 128-aligned block to out_hbm at the aligned write base (out-DMAs
are strictly ordered — consecutive blocks overlap). The final program
drains the tail. Lanes past the final count hold stale garbage: the
caller MUST mask by the returned count before sorting.

Output (OROWS=16, CAP_OUT) f32 value rows (+ (1, 128) i32 kept count):
  [tile, depth, mx, my, P_caca, P_cbcc, OPRG, BRGB, pad x8]
  rows 2..7 are the blend kernel's 6-row SoA (blend_fov reads them from an
  8-row-padded buffer for DMA sublane alignment); the caller builds the
  fused sort key from tile and depth-bits (tile << depth_bits |
  f32_bits(depth) >> (32 - depth_bits); view-space depth is positive, so
  its high float bits are order-preserving). Ties (depths within ~2^-11
  relative) blend in arbitrary order — the reference's atomic scheduling
  is non-deterministic at far smaller scales.
  Packed lanes (all inference-only quantization; training uses blend_fwd
  at f32): P_caca = bf16 x2 split of ca (hi + lo reconstructs within
  ~2^-17 relative — conic precision matches the previous f32-ca layout to
  well under the bf16 cb/cc error); P_cbcc = cb | cc bf16
  (round-to-nearest, <= 0.2% exponent perturbation -> alpha error < 1%
  relative); OPRG = op1_u8 << 24 | op2_u8 << 16 | r1_u8 << 8 | g1_u8 and
  BRGB = b1 | r2 | g2 | b2: opacities quantize at step 1/255 — exactly
  the blend's ALPHA_MIN cutoff, below which a pair never contributes (the
  L2-cull sentinel becomes op2 = 0, rejected by a2 >= ALPHA_MIN for
  free); colors quantize at step 2/255 on [0, 2] and blend weights sum to
  <= 1, so the final pixel error stays within one 8-bit display LSB.
  6 attr rows = exactly 3 bit-packed i64 sort payloads (was 4 with the
  bf16-pair layout; sort cost is per operand x element).

The permutation matmul moves VALUES (tile ids, depth, coords — all exact
f32), never bit patterns: f32 bit patterns (the old fused key) could be
NaN/denormal lanes that an MXU pass corrupts, and bf16-PAIR packed lanes
can be denormal when the high half is ~0. Hence tile/depth ride as values
and the key is rebuilt after the kernel, while bf16 pair packing happens
on the staged block after the permutation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fovsplat.ops.projection import TILE

DROWS = 64           # bf16 dtable rows (50 used; see foveated.build_fov_dtable
                     # for the split-row layout; 16-aligned for bf16 tiling)
OROWS = 16           # output rows (fused key + 9 packed attrs + pad)
WPAD = 256           # window slack: 128 (w0 floor) + 128 (g span margin)

_MASK_HI = -65536                     # 0xFFFF0000 (python int: literals
                                      # inline; jnp scalars become captured
                                      # constants inside pallas kernels)


def tile_bits(num_tiles: int) -> int:
    """Bits needed for tile ids 0..num_tiles (incl. the sentinel)."""
    return max(int(num_tiles + 1).bit_length(), 1)


def fused_key32(tile_row, depth_row, usable, num_tiles: int):
    """i32 fused sort key pair, replacing the round-2 i64 key.

    Returns (key, dbits):
      key   = (tile << db) | (f32-bits(depth) >> (32 - db)) with
              db = 31 - tile_bits(num_tiles) depth bits — view-space depth
              is positive, so its high float bits are order-preserving.
      dbits = full f32 depth bits as i32 (exact secondary key).

    A single-key sort on `key` ties depths within ~2^(db-24) relative
    (~5e-4 at the 1237x822 grid) — measured >50 dB against the exact
    order on the bench proxy, i.e. far below the u8 quantization ladder;
    adding dbits as a second sort key (num_keys=2) restores exactness for
    ~+0.9 ms at 1.77M lanes (scripts/bench_sort_variants.py; the round-2
    i64 single-key layout — the reference's duplicateWithKeys key — costs
    ~+1.7 ms over the lossy i32 key AND forces x64 + bit-packed payloads,
    which sort ~7% slower than the same bytes as plain f32 rows).
    Lanes >= usable get the sentinel (num_tiles << db) which sorts last."""
    db = 31 - tile_bits(num_tiles)
    tile_i = tile_row.astype(jnp.int32)          # exact f32 integers
    dbits = jax.lax.bitcast_convert_type(depth_row, jnp.int32)
    key = (tile_i << jnp.int32(db)) | jax.lax.shift_right_logical(
        dbits, jnp.int32(32 - db))
    lane = jnp.arange(tile_row.shape[0], dtype=jnp.int32)
    sent = jnp.int32(num_tiles << db)
    ok = lane < usable
    return jnp.where(ok, key, sent), jnp.where(ok, dbits, jnp.int32(0))


def seg_bounds32(num_tiles: int):
    """searchsorted boundaries for the i32 fused key."""
    db = 31 - tile_bits(num_tiles)
    return jnp.arange(num_tiles + 1, dtype=jnp.int32) << jnp.int32(db)


def _pack2_i32(a, b):
    """Two f32 vectors -> one f32 whose lanes hold (bf16(a) << 16 | bf16(b)).

    Round-to-nearest via +0x8000 before truncation (monotone, carries into
    the exponent correctly; works for negatives in sign-magnitude IEEE)."""
    ua = (pltpu.bitcast(a, jnp.int32) + 0x8000) & _MASK_HI
    ub = jax.lax.shift_right_logical(
        (pltpu.bitcast(b, jnp.int32) + 0x8000) & _MASK_HI, 16)
    return pltpu.bitcast(ua | ub, jnp.float32)


def _trunc_bf16(x):
    """bf16-representable truncation via bit masking — immune to the XLA
    excess-precision fold that elides f32->bf16->f32 convert pairs (see
    foveated._trunc_bf16; Mosaic honors the converts today, but the masked
    form costs the same and cannot regress)."""
    return pltpu.bitcast(pltpu.bitcast(x, jnp.int32) & _MASK_HI,
                         jnp.float32)


def _bf16x3_rows(x):
    """f32 rows -> 3 rows (hi, mid, lo), each EXACTLY bf16-representable,
    with hi + mid + lo == x exactly (8+8+8 >= f32's 24 mantissa bits; each
    residual is computed exactly in f32). A 0/1 bf16 matmul then passes
    f32 values through LOSSLESSLY at one MXU pass instead of HIGHEST's six
    — and small-M HIGHEST matmuls run at <15% MXU utilization, so this is
    the difference between ~1 us and ~0.1 us per chunk."""
    hi = _trunc_bf16(x)
    r = x - hi
    mid = _trunc_bf16(r)
    lo = r - mid
    return hi, mid, lo


def _prefix_excl_lanes(x):
    """Exclusive prefix sum of (1, n) f32 along lanes via log-step rolls —
    replaces an M=1 HIGHEST matmul that runs at <1% MXU utilization."""
    n = x.shape[1]
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    incl = x
    s = 1
    while s < n:
        incl = incl + jnp.where(lane >= s, pltpu.roll(incl, s, 1), 0.0)
        s *= 2
    return incl - x


def _acos_poly(d):
    """arccos on [-1, 1] via acos(1-u) = sqrt(2u) * sum c_k u^k.

    Max error ~1e-5 rad over the eccentricity range reachable on screen."""
    u = jnp.clip(1.0 - d, 0.0, 2.0)
    s = 1.0 + u * (1.0 / 12.0 + u * (3.0 / 160.0 + u * (
        5.0 / 896.0 + u * (35.0 / 18432.0 + u * (63.0 / 90112.0)))))
    return jnp.sqrt(2.0 * u) * s


def _fov_level(tx, ty, gdx, gdy, gdz, alpha, *, width, height, real_w,
               real_h, dist, fov_num, sqrt_max_ps):
    """Per-pair fractional foveation level (ops/foveation.tile_levels_at,
    trig replaced by series; cos(ecc_center) needs no arccos at all)."""
    px = tx * TILE + TILE / 2
    py = ty * TILE + TILE / 2
    x = (px / width - 0.5) * real_w
    y = (py / height - 0.5) * real_h
    inv_n = jax.lax.rsqrt(x * x + y * y + dist * dist)
    d = (x * gdx + y * gdy + dist * gdz) * inv_n
    ecc = _acos_poly(jnp.clip(d, -1.0, 1.0))
    cosC = dist * inv_n                       # cos(ecc_center): cdir=(0,0,1)

    pr = alpha * ecc * ecc
    pr2 = pr * pr
    sin_pr = pr * (1.0 - pr2 * (1.0 / 6.0) * (1.0 - pr2 * (1.0 / 20.0)))
    cos_pr = 1.0 - pr2 * 0.5 * (1.0 - pr2 * (1.0 / 12.0))
    # cos(amax)*cos(amin) = (cos(2*ecc_c) + cos(pr)) / 2
    cosAB = 0.5 * ((2.0 * cosC * cosC - 1.0) + cos_pr)
    major = sin_pr / cosAB * dist             # tan(amax) - tan(amin)
    t = pr * 0.5
    tan_half = t * (1.0 + t * t * (1.0 / 3.0 + t * t * (2.0 / 15.0)))
    minor = 2.0 * (1.0 / inv_n) * tan_half    # d2pix == 1/inv_n
    area = (jnp.pi * 0.25) * major * minor
    ps = jnp.sqrt(jnp.maximum(area, 0.0)) * (width / real_w)
    step = (sqrt_max_ps - 1.0) / (fov_num - 1)
    lv = jnp.where(ps <= 1.0, 0.0,
                   (jnp.sqrt(jnp.maximum(ps, 1.0)) - 1.0) / step)
    return jnp.minimum(lv, fov_num - 0.1)


def _kernel(ints_ref, dtable_hbm, cum_hbm, consts_ref, out_hbm, cnt_hbm,
            win, cbuf, obuf, tail, cntbuf, kcum, insem, gsem, outsem,
            *, chunk: int, wsize: int, batch: int, grid_x: int,
            num_tiles: int, n_pad: int, cap_out: int,
            width: int, height: int, real_w: float, real_h: float,
            dist: float, fov_num: int, fov_num_cull: int, drows: int,
            sqrt_max_ps: float, guard_marker: bool = False):
    # fov_num is the table's color/opacity LAYOUT level count; the level
    # cull always runs at fov_num_cull levels. The SM-FR shared layout
    # (reference N7) uses fov_num=1 / fov_num_cull=4: a 48-row table
    # (drows) instead of 64, cutting the expansion matmul volume 25%.
    cb_ = pl.program_id(0)
    total = ints_ref[0]
    out_w = chunk + 128

    @pl.when(cb_ == 0)
    def _():
        kcum[0] = 0          # kept count
        kcum[1] = 0          # window-missed pairs (guard_marker mode)
    # (1,1) vector constants — broadcast in arithmetic, no scalar extraction.
    gdx = consts_ref[0:1, 0:1]
    gdy = consts_ref[0:1, 1:2]
    gdz = consts_ref[0:1, 2:3]
    alpha = consts_ref[0:1, 3:4]

    def win_dma(slot, k):
        c = cb_ * batch + k
        w0 = pl.multiple_of(jnp.minimum((ints_ref[1 + c] // 128) * 128,
                                        n_pad - wsize), 128)
        return pltpu.make_async_copy(dtable_hbm.at[:, pl.ds(w0, wsize)],
                                     win.at[slot], insem.at[slot])

    def cum_dma(slot, k):
        c = cb_ * batch + k
        w0 = pl.multiple_of(jnp.minimum((ints_ref[1 + c] // 128) * 128,
                                        n_pad - wsize), 128)
        return pltpu.make_async_copy(cum_hbm.at[:, pl.ds(w0, wsize + 128)],
                                     cbuf.at[slot], gsem.at[slot])

    def out_dma(slot, base):
        dst = pl.multiple_of(jnp.minimum(base, cap_out - out_w), 128)
        return pltpu.make_async_copy(obuf.at[slot],
                                     out_hbm.at[:, pl.ds(dst, out_w)],
                                     outsem.at[slot])

    # Whole-program skip: programs whose FIRST pair index is already past
    # `total` compute nothing (all their lanes are out of range — keep is
    # all-false and the compaction would write nothing anyway). ~14% of
    # programs on the bench workload, more at sparse gazes. All DMA
    # start/wait pairing stays inside this branch.
    @pl.when(cb_ * (batch * chunk) < total)
    def _run():
        win_dma(0, 0).start()
        cum_dma(0, 0).start()

        # Loop-invariant 2D masks/iotas, built once per program.
        d_iota = jax.lax.broadcasted_iota(
            jnp.int32, (out_w, chunk), 0).astype(jnp.float32)
        lane128 = jax.lax.broadcasted_iota(jnp.int32, (OROWS, 128), 1)

        def body(k, prev_base):
            slot = k % 2
            win_dma(slot, k).wait()
            cum_dma(slot, k).wait()

            @pl.when(k + 1 < batch)
            def _():
                win_dma(1 - slot, k + 1).start()
                cum_dma(1 - slot, k + 1).start()

            c = cb_ * batch + k
            # Interval one-hot straight from the exclusive-cumsum column:
            # onehot[w, j] = (cum[w] <= p_j < cum[w+1]) — no pair->Gaussian
            # index array (and no CAP-sized scatter+cumsum to build one).
            # Empty rows (cum[w] == cum[w+1]) match nothing by construction.
            p_row = (c * chunk
                     + jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1)
                     ).astype(jnp.float32)
            p_col = (c * chunk
                     + jax.lax.broadcasted_iota(jnp.int32, (chunk, 1), 0)
                     ).astype(jnp.float32)
            cumv = cbuf[slot][0:1, :]                        # (1, wsize+128)
            cum_lo = cumv[:, 0:wsize]
            # next row's cum: rotate left one lane (positive-shift roll form).
            cum_hi = pltpu.roll(cumv, wsize + 127, 1)[:, 0:wsize]
            onehot_t = ((cum_lo <= p_col)
                        & (p_col < cum_hi)).astype(jnp.bfloat16)  # (chunk, wsize)
            # ONE bf16 expansion matmul over the whole split-row table
            # (build_fov_dtable layout); exact values reconstruct as part
            # sums. No f32-HIGHEST pass anywhere in this kernel.
            w = jax.lax.dot_general(
                win[slot], onehot_t, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)          # (DROWS, chunk)

            p = (c * chunk
                 + jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1))
            in_range = p < total

            rw = jnp.maximum(w[2:3, :], 1.0)
            cum_e = w[3:4, :] + w[4:5, :] + w[5:6, :]
            mx = w[6:7, :] + w[7:8, :] + w[8:9, :]
            my = w[9:10, :] + w[10:11, :] + w[11:12, :]
            local = p_row - cum_e
            ty_off = jnp.floor((local + 0.5) / rw)
            tx = w[0:1, :] + (local - ty_off * rw)           # f32 tile coords
            ty = w[1:2, :] + ty_off
            tile = (ty * grid_x + tx).astype(jnp.int32)

            # OBB separating-axis test (ops/binning.obb_pass).
            half = TILE / 2.0
            cx = mx - (tx * TILE + half)
            cy = my - (ty * TILE + half)
            v1x = w[12:13, :] + w[13:14, :]
            v1y = w[14:15, :] + w[15:16, :]
            v2x = w[16:17, :] + w[17:18, :]
            v2y = w[18:19, :] + w[19:20, :]
            l1e = w[20:21, :] + w[21:22, :]
            l2e = w[22:23, :] + w[23:24, :]
            ext_x = jnp.abs(l1e * v1x) + jnp.abs(l2e * v2x)
            ext_y = jnp.abs(l1e * v1y) + jnp.abs(l2e * v2y)
            b1 = -(cx * v1x + cy * v1y)
            b2 = -(cx * v2x + cy * v2y)
            e1 = half * (jnp.abs(v1x) + jnp.abs(v1y))
            e2 = half * (jnp.abs(v2x) + jnp.abs(v2y))
            obb = ((jnp.abs(cx) <= half + ext_x) & (jnp.abs(cy) <= half + ext_y)
                   & (jnp.abs(b1) <= l1e + e1) & (jnp.abs(b2) <= l2e + e2))
            obb = obb | (l1e <= 0.0)                          # single-tile rects

            lv = _fov_level(tx, ty, gdx, gdy, gdz, alpha, width=width,
                            height=height, real_w=real_w, real_h=real_h,
                            dist=dist, fov_num=fov_num_cull,
                            sqrt_max_ps=sqrt_max_ps)
            hl = w[27:28, :]
            keep = in_range & obb & (lv < hl + 1.0)
            if guard_marker:
                # Window-miss guard (drop_invalid tables): a pair whose
                # true row fell outside [w0, w0+wsize) gathered all-zero
                # rows — marker row 31 is 1.0 on every real row, so a
                # gathered 0 identifies the miss. Dropped and COUNTED
                # (reported as overflow), never silently corrupted.
                hit = w[31:32, :] > 0.5
                kcum[1] = kcum[1] + jnp.sum(
                    (in_range & jnp.logical_not(hit)).astype(jnp.int32))
                keep = keep & hit

            p1 = lv.astype(jnp.int32)
            p2 = jnp.minimum(p1 + 1, fov_num - 1)

            def sel(pk):
                out = []
                for cidx in range(4):                         # op, r, g, b
                    base_row = 32 + cidx * fov_num
                    v = w[base_row:base_row + 1, :]
                    for lvl in range(1, fov_num):
                        v = jnp.where(pk == lvl,
                                      w[base_row + lvl:base_row + lvl + 1, :],
                                      v)
                    out.append(v)
                return out

            o1, r1c, g1c, b1c = sel(p1)
            o2, r2c, g2c, b2c = sel(p2)
            # L2-cull folds into the sign of op2: the blend's a2 >= ALPHA_MIN
            # test rejects negative opacity for free.
            o2 = jnp.where((hl + 1.0) < (lv + 1.0), -1.0, o2)

            # --- In-kernel compaction (module docstring): rank kept lanes,
            # permute them to [tail_len, tail_len + kept) of the staging
            # block, merge the carried tail, flush 128-aligned lanes.
            keepf = keep.astype(jnp.float32)                 # (1, chunk)
            rank = _prefix_excl_lanes(keepf)                 # (1, chunk)
            kept = jnp.sum(keepf).astype(jnp.int32)

            kc = kcum[0]
            tail_len = jax.lax.rem(kc, 128)
            base = kc - tail_len
            dst = tail_len.astype(jnp.float32) + rank        # (1, chunk)
            ohT = ((d_iota == dst) & keep).astype(jnp.bfloat16)  # (out_w, chunk)

            # ONE bf16 permutation matmul (M=24, ~20% MXU utilization) —
            # no HIGHEST pass anywhere: the f32 values (tile/depth/mx/my/ca)
            # ride as exact bf16 splits (the depth/mx/my/ca parts come
            # straight from the split-row table; tile is a 13-bit int: x2)
            # and are reconstructed exactly after the permutation; the 10
            # color/opacity/conic rows are already bf16-exact (o2's -1
            # sentinel is bf16-exact).
            tilef = tile.astype(jnp.float32)
            t_hi = _trunc_bf16(tilef)
            vals = jnp.concatenate(
                [t_hi, tilef - t_hi,
                 w[28:31, :],                                # depth x3
                 w[6:9, :],                                  # mx x3
                 w[9:12, :],                                 # my x3
                 w[24:27, :],                                # ca x3
                 w[32 + 4 * fov_num:33 + 4 * fov_num, :],    # cb
                 w[33 + 4 * fov_num:34 + 4 * fov_num, :],    # cc
                 o1, o2, r1c, g1c, b1c, r2c, g2c, b2c],
                axis=0)                                      # (24, chunk)
            staged = jax.lax.dot_general(
                vals.astype(jnp.bfloat16), ohT, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)          # (24, out_w)

            # 6-row packed output = exactly 3 bit-packed i64 sort payload
            # operands (sort cost is per operand x element): ca rides as a
            # bf16 x2 split pair (~2^-17 relative), opacities as u8/255
            # (step 1/255 == the blend's own ALPHA_MIN cutoff; the L2-cull
            # sentinel becomes 0, which a2 >= ALPHA_MIN rejects for free),
            # colors as u8 on [0, 2] (step 2/255; blend weights sum to <= 1
            # so the final pixel error stays within one 8-bit display LSB).
            ca_f = staged[11:12] + staged[12:13] + staged[13:14]
            ca_hi = _trunc_bf16(ca_f)
            q8 = lambda v, sc: jnp.clip(jnp.floor(v * sc + 0.5),
                                        0.0, 255.0).astype(jnp.int32)
            oprg = pltpu.bitcast(
                (q8(staged[16:17], 255.0) << 24)
                | (q8(staged[17:18], 255.0) << 16)
                | (q8(staged[18:19], 127.5) << 8)
                | q8(staged[19:20], 127.5), jnp.float32)
            brgb = pltpu.bitcast(
                (q8(staged[20:21], 127.5) << 24)
                | (q8(staged[21:22], 127.5) << 16)
                | (q8(staged[22:23], 127.5) << 8)
                | q8(staged[23:24], 127.5), jnp.float32)
            blk = jnp.concatenate(
                [staged[0:1] + staged[1:2],                  # tile
                 staged[2:3] + staged[3:4] + staged[4:5],    # depth
                 staged[5:6] + staged[6:7] + staged[7:8],    # mx
                 staged[8:9] + staged[9:10] + staged[10:11],  # my
                 _pack2_i32(ca_hi, ca_f - ca_hi),            # P_caca
                 _pack2_i32(staged[14:15], staged[15:16]),   # P_cbcc
                 oprg, brgb,
                 jnp.zeros((OROWS - 8, out_w), jnp.float32)], axis=0)
            # Merge the carried tail into lanes [0, tail_len).
            head = jnp.where(lane128 < tail_len, tail[...], blk[:, 0:128])
            blk = jnp.concatenate([head, blk[:, 128:]], axis=1)

            # Out-DMAs are strictly ordered (consecutive blocks overlap):
            # complete the previous one before starting this one; the wait
            # descriptor only needs matching static shapes.
            @pl.when(prev_base >= 0)
            def _():
                out_dma(1 - slot, prev_base).wait()

            obuf[slot] = blk
            out_dma(slot, base).start()

            # Carry the unflushed remainder [flush, new_total) — flush is a
            # 128 multiple <= chunk, so the window is one of 5 static slices.
            # Selected with VECTOR-predicate wheres: a scalar-condition select
            # over vectors (lax.switch / scalar jnp.where) fails Mosaic
            # legalization ('arith.select' on vector operands with i1 pred).
            new_total = tail_len + kept
            flush = (new_total // 128) * 128
            fidx = jnp.full((OROWS, 128), flush // 128, jnp.int32)
            sel = blk[:, 0:128]
            for i in range(1, chunk // 128 + 1):
                sel = jnp.where(fidx == i, blk[:, 128 * i:128 * i + 128], sel)
            tail[...] = sel
            kcum[0] = kc + kept
            return base

        last_base = jax.lax.fori_loop(0, batch, body, jnp.int32(-1))
        # Drain the in-flight out-DMA before the program ends.
        out_dma((batch - 1) % 2, last_base).wait()

    # Last program: publish the kept count. (No tail flush needed — every
    # chunk's full-width DMA already wrote its unflushed lanes; the carry
    # exists only to survive the NEXT chunk's overlapping write.)
    @pl.when(cb_ == pl.num_programs(0) - 1)
    def _():
        cntbuf[...] = jnp.concatenate(
            [jnp.full((1, 64), kcum[0], jnp.int32),
             jnp.full((1, 64), kcum[1], jnp.int32)], axis=1)
        cc_dma = pltpu.make_async_copy(cntbuf, cnt_hbm, gsem.at[0])
        cc_dma.start()
        cc_dma.wait()


# ------------------------------------------------------------- plain path

PROWS = 64           # ps1 bf16 split-row dtable rows (49 used; layout in
                     # binning.bin_fused_ps1; 16-aligned for bf16 tiling)
POROWS = 16          # ps1 output rows (key + 9 attrs + pad)


def _ps1_kernel(ints_ref, dtable_hbm, cum_hbm, out_hbm, cnt_hbm,
                win, cbuf, obuf, tail, cntbuf, kcum, insem, gsem, outsem,
                *, chunk: int, wsize: int, batch: int, grid_x: int,
                num_tiles: int, n_pad: int, cap_out: int,
                train: bool = False, guard_marker: bool = False):
    """Plain (single-level) pair expansion + OBB cull, output COMPACTED
    exactly like the foveated kernel (see module docstring — same
    rank/permute/tail machinery; culled + dummy pairs never reach HBM).

    dtable: (PROWS=64) bf16 split-row table (layout in
    binning.bin_fused_ps1), ORIGINAL Gaussian order (no depth presort —
    invalid rows carry one dummy pair with valid=0; see module docstring).
    Output rows (POROWS=16), compacted values (+ (1,128) i32 kept count):
    [tile, depth, mx, my, P_caca, P_cbcc, OPRGB, pad x9] — rows 2..6 are
    the blend_fwd fwd-only (quantized) row prefix."""
    cb_ = pl.program_id(0)
    total = ints_ref[0]
    out_w = chunk + 128

    @pl.when(cb_ == 0)
    def _():
        kcum[0] = 0          # kept count
        kcum[1] = 0          # window-missed pairs (guard_marker mode)

    def win_dma(slot, k):
        c = cb_ * batch + k
        w0 = pl.multiple_of(jnp.minimum((ints_ref[1 + c] // 128) * 128,
                                        n_pad - wsize), 128)
        return pltpu.make_async_copy(dtable_hbm.at[:, pl.ds(w0, wsize)],
                                     win.at[slot], insem.at[slot])

    def cum_dma(slot, k):
        c = cb_ * batch + k
        w0 = pl.multiple_of(jnp.minimum((ints_ref[1 + c] // 128) * 128,
                                        n_pad - wsize), 128)
        return pltpu.make_async_copy(cum_hbm.at[:, pl.ds(w0, wsize + 128)],
                                     cbuf.at[slot], gsem.at[slot])

    def out_dma(slot, base):
        dst = pl.multiple_of(jnp.minimum(base, cap_out - out_w), 128)
        return pltpu.make_async_copy(obuf.at[slot],
                                     out_hbm.at[:, pl.ds(dst, out_w)],
                                     outsem.at[slot])

    # Whole-program skip past `total` — see the fov kernel above.
    @pl.when(cb_ * (batch * chunk) < total)
    def _run():
        win_dma(0, 0).start()
        cum_dma(0, 0).start()

        # Loop-invariant 2D masks/iotas, built once per program (not per chunk).
        d_iota = jax.lax.broadcasted_iota(
            jnp.int32, (out_w, chunk), 0).astype(jnp.float32)
        lane128 = jax.lax.broadcasted_iota(jnp.int32, (POROWS, 128), 1)

        def body(k, prev_base):
            slot = k % 2
            win_dma(slot, k).wait()
            cum_dma(slot, k).wait()

            @pl.when(k + 1 < batch)
            def _():
                win_dma(1 - slot, k + 1).start()
                cum_dma(1 - slot, k + 1).start()

            c = cb_ * batch + k
            p_row = (c * chunk
                     + jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1)
                     ).astype(jnp.float32)
            p_col = (c * chunk
                     + jax.lax.broadcasted_iota(jnp.int32, (chunk, 1), 0)
                     ).astype(jnp.float32)
            cumv = cbuf[slot][0:1, :]                        # (1, wsize+128)
            cum_lo = cumv[:, 0:wsize]
            # next row's cum: rotate left one lane (positive-shift roll form).
            cum_hi = pltpu.roll(cumv, wsize + 127, 1)[:, 0:wsize]
            onehot_t = ((cum_lo <= p_col)
                        & (p_col < cum_hi)).astype(jnp.bfloat16)  # (chunk, wsize)
            # ONE bf16 expansion matmul over the split-row table (layout in
            # binning.bin_fused_ps1) — no f32-HIGHEST pass in this kernel.
            w = jax.lax.dot_general(
                win[slot], onehot_t, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)          # (PROWS, chunk)

            p = (c * chunk
                 + jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1))
            in_range = p < total

            rw = jnp.maximum(w[2:3, :], 1.0)
            cum_e = w[3:4, :] + w[4:5, :] + w[5:6, :]
            mx = w[6:7, :] + w[7:8, :] + w[8:9, :]
            my = w[9:10, :] + w[10:11, :] + w[11:12, :]
            local = p_row - cum_e
            ty_off = jnp.floor((local + 0.5) / rw)
            tx = w[0:1, :] + (local - ty_off * rw)
            ty = w[1:2, :] + ty_off
            tile = (ty * grid_x + tx).astype(jnp.int32)

            half = TILE / 2.0
            cx = mx - (tx * TILE + half)
            cy = my - (ty * TILE + half)
            v1x = w[12:13, :] + w[13:14, :]
            v1y = w[14:15, :] + w[15:16, :]
            v2x = w[16:17, :] + w[17:18, :]
            v2y = w[18:19, :] + w[19:20, :]
            l1e = w[20:21, :] + w[21:22, :]
            l2e = w[22:23, :] + w[23:24, :]
            ext_x = jnp.abs(l1e * v1x) + jnp.abs(l2e * v2x)
            ext_y = jnp.abs(l1e * v1y) + jnp.abs(l2e * v2y)
            b1 = -(cx * v1x + cy * v1y)
            b2 = -(cx * v2x + cy * v2y)
            e1 = half * (jnp.abs(v1x) + jnp.abs(v1y))
            e2 = half * (jnp.abs(v2x) + jnp.abs(v2y))
            obb = ((jnp.abs(cx) <= half + ext_x) & (jnp.abs(cy) <= half + ext_y)
                   & (jnp.abs(b1) <= l1e + e1) & (jnp.abs(b2) <= l2e + e2))
            obb = obb | (l1e <= 0.0)

            hit = w[45:46, :] > 0.0
            keep = in_range & obb & hit
            if guard_marker:
                # Window-miss guard (drop_invalid tables; see the fov
                # kernel): a pair whose true row fell outside the window
                # gathered all-zero rows, so valid == 0 identifies the
                # miss. With dummy-free tables every candidate pair
                # belongs to a VALID row — a zero valid can ONLY be a
                # miss. Dropped and COUNTED, never silently corrupted.
                kcum[1] = kcum[1] + jnp.sum(
                    (in_range & jnp.logical_not(hit[0:1, :])
                     ).astype(jnp.int32))

            # In-kernel compaction — identical machinery to the fov kernel.
            keepf = keep.astype(jnp.float32)
            rank = _prefix_excl_lanes(keepf)
            kept = jnp.sum(keepf).astype(jnp.int32)

            kc = kcum[0]
            tail_len = jax.lax.rem(kc, 128)
            base = kc - tail_len
            dst = tail_len.astype(jnp.float32) + rank
            ohT = ((d_iota == dst) & keep).astype(jnp.bfloat16)

            # ONE bf16 permutation matmul. Inference: geometry
            # (tile/depth/mx/my/ca) rides as exact bf16 split parts;
            # conic cb/cc, opacity and colors reconstruct f32 BEFORE the
            # matmul and ride as single bf16 rows — they quantize to
            # bf16/u8 in the packed output anyway (same ladder as the fov
            # kernel: quantization bounds in the module docstring).
            # Train: EVERY value rides as exact x3 splits and the output
            # rows stay f32 (the differentiable blend recomputes alpha
            # elementwise and the backward must match bitwise); gid rides
            # as a payload for the gradient segment-sum.
            tilef = tile.astype(jnp.float32)
            t_hi = _trunc_bf16(tilef)
            if train:
                vals = jnp.concatenate(
                    [t_hi, tilef - t_hi,
                     w[46:49, :],                # depth x3
                     w[6:9, :], w[9:12, :],      # mx, my x3
                     w[24:27, :], w[27:30, :],   # ca, cb x3
                     w[30:33, :], w[33:36, :],   # cc, op x3
                     w[36:39, :], w[39:42, :],   # r, g x3
                     w[42:45, :], w[49:52, :],   # b, gid x3
                     ], axis=0)                  # (35, chunk)
                staged3 = jax.lax.dot_general(
                    vals.astype(jnp.bfloat16), ohT, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)      # (35, out_w)
                staged = jnp.concatenate(
                    [staged3[0:1] + staged3[1:2]]
                    + [staged3[2 + 3 * i:3 + 3 * i]
                       + staged3[3 + 3 * i:4 + 3 * i]
                       + staged3[4 + 3 * i:5 + 3 * i] for i in range(11)]
                    + [jnp.zeros((POROWS - 12, out_w), jnp.float32)],
                    axis=0)
            else:
                vals = jnp.concatenate(
                    [t_hi, tilef - t_hi,
                     w[46:49, :],                    # depth x3
                     w[6:9, :], w[9:12, :],          # mx, my x3
                     w[24:27, :],                    # ca x3
                     w[27:28, :] + w[28:29, :] + w[29:30, :],   # cb
                     w[30:31, :] + w[31:32, :] + w[32:33, :],   # cc
                     w[33:34, :] + w[34:35, :] + w[35:36, :],   # op
                     w[36:37, :] + w[37:38, :] + w[38:39, :],   # r
                     w[39:40, :] + w[40:41, :] + w[41:42, :],   # g
                     w[42:43, :] + w[43:44, :] + w[44:45, :],   # b
                     ], axis=0)                      # (20, chunk)
                staged = jax.lax.dot_general(
                    vals.astype(jnp.bfloat16), ohT, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)      # (20, out_w)
                ca_f = staged[11:12] + staged[12:13] + staged[13:14]
                ca_hi = _trunc_bf16(ca_f)
                q8 = lambda v, sc: jnp.clip(jnp.floor(v * sc + 0.5),
                                            0.0, 255.0).astype(jnp.int32)
                oprgb = pltpu.bitcast(
                    (q8(staged[16:17], 255.0) << 24)
                    | (q8(staged[17:18], 127.5) << 16)
                    | (q8(staged[18:19], 127.5) << 8)
                    | q8(staged[19:20], 127.5), jnp.float32)
                staged = jnp.concatenate(
                    [staged[0:1] + staged[1:2],                  # tile
                     staged[2:3] + staged[3:4] + staged[4:5],    # depth
                     staged[5:6] + staged[6:7] + staged[7:8],    # mx
                     staged[8:9] + staged[9:10] + staged[10:11],  # my
                     _pack2_i32(ca_hi, ca_f - ca_hi),            # P_caca
                     _pack2_i32(staged[14:15], staged[15:16]),   # P_cbcc
                     oprgb,
                     jnp.zeros((POROWS - 7, out_w), jnp.float32)], axis=0)

            head = jnp.where(lane128 < tail_len, tail[...], staged[:, 0:128])
            blk = jnp.concatenate([head, staged[:, 128:]], axis=1)

            @pl.when(prev_base >= 0)
            def _():
                out_dma(1 - slot, prev_base).wait()

            obuf[slot] = blk
            out_dma(slot, base).start()

            new_total = tail_len + kept
            flush = (new_total // 128) * 128
            fidx = jnp.full((POROWS, 128), flush // 128, jnp.int32)
            sel = blk[:, 0:128]
            for i in range(1, chunk // 128 + 1):
                sel = jnp.where(fidx == i, blk[:, 128 * i:128 * i + 128], sel)
            tail[...] = sel
            kcum[0] = kc + kept
            return base

        last_base = jax.lax.fori_loop(0, batch, body, jnp.int32(-1))
        out_dma((batch - 1) % 2, last_base).wait()

    @pl.when(cb_ == pl.num_programs(0) - 1)
    def _():
        cntbuf[...] = jnp.concatenate(
            [jnp.full((1, 64), kcum[0], jnp.int32),
             jnp.full((1, 64), kcum[1], jnp.int32)], axis=1)
        cc_dma = pltpu.make_async_copy(cntbuf, cnt_hbm, gsem.at[0])
        cc_dma.start()
        cc_dma.wait()


@functools.partial(jax.jit, static_argnames=(
    "cap", "cap_out", "chunk", "batch", "grid_x", "grid_y", "interpret",
    "train", "guard_marker"))
def expand_ps1_pallas(dtable, cum, gstarts, total,
                      *, cap, cap_out=None, chunk=512, batch=8, grid_x,
                      grid_y, interpret=False, train=False,
                      guard_marker=False):
    """dtable (PROWS, N_pad) bf16 split-row table in ORIGINAL order
    (layout in binning.bin_fused_ps1; valid flag row 45, depth rows
    46-48); cum (1, N_pad + 128) f32 exclusive cumsum (dummy pairs
    for invalid rows; padding past the total; +128 for aligned window
    reads); gstarts (CAP//chunk,) i32; total () i32. cap_out bounds the
    COMPACTED output (kept pairs only; defaults to cap).
    Returns (key (CAP_OUT,) i32 fused sort key + dbits (CAP_OUT,) i32
    exact-depth secondary key (see fused_key32) — sentinel-masked past
    the kept count, attrs f32 rows: inference (5, CAP_OUT)
    [mx, my, P_caca, P_cbcc, OPRGB] (ca as a bf16 x2 split pair; cb | cc
    bf16; OPRGB = op_u8 << 24 | r_u8 << 16 | g_u8 << 8 | b_u8, opacity
    u8/255, colors u8 on [0, 2] — same inference quantization ladder as
    the fov kernel) or train (10, CAP_OUT) exact
    [mx, my, ca, cb, cc, op, r, g, b, gid], kept () i32)."""
    n_pad = dtable.shape[1]
    assert cap % (chunk * batch) == 0, (cap, chunk, batch)
    if cap_out is None:
        cap_out = cap
    cap_out = ((cap_out + 127) // 128) * 128
    assert cap_out >= chunk + 128
    num_chunks = cap // chunk
    wsize = chunk + WPAD
    assert n_pad >= wsize, (n_pad, wsize)

    ints = jnp.concatenate([total[None].astype(jnp.int32),
                            gstarts.astype(jnp.int32)])
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(num_chunks // batch,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[pl.BlockSpec(memory_space=pl.ANY),
                   pl.BlockSpec(memory_space=pl.ANY)],
        scratch_shapes=[pltpu.VMEM((2, PROWS, wsize), jnp.bfloat16),
                        pltpu.VMEM((2, 1, wsize + 128), jnp.float32),
                        pltpu.VMEM((2, POROWS, chunk + 128), jnp.float32),
                        pltpu.VMEM((POROWS, 128), jnp.float32),
                        pltpu.VMEM((1, 128), jnp.int32),
                        pltpu.SMEM((2,), jnp.int32),
                        pltpu.SemaphoreType.DMA((2,)),
                        pltpu.SemaphoreType.DMA((2,)),
                        pltpu.SemaphoreType.DMA((2,))],
    )
    kernel = functools.partial(
        _ps1_kernel, chunk=chunk, wsize=wsize, batch=batch, grid_x=grid_x,
        num_tiles=grid_x * grid_y, n_pad=n_pad, cap_out=cap_out,
        train=train, guard_marker=guard_marker)
    out, cnt = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((POROWS, cap_out), jnp.float32),
                   jax.ShapeDtypeStruct((1, 128), jnp.int32)],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(ints, dtable, cum)
    kept = cnt[0, 0]
    missed = cnt[0, 64]    # window-missed (dropped) pairs, guard mode
    num_tiles = grid_x * grid_y
    usable = jnp.minimum(kept, cap_out - (chunk + 128))
    key, dbits = fused_key32(out[0], out[1], usable, num_tiles)
    if train:
        # [mx, my, ca, cb, cc, op, r, g, b, gid]
        return key, dbits, out[2:12], kept, missed
    return key, dbits, out[2:7], kept, missed


@functools.partial(jax.jit, static_argnames=(
    "cap", "cap_out", "chunk", "batch", "grid_x", "grid_y", "width",
    "height", "real_w", "real_h", "dist", "fov_num", "fov_num_cull",
    "sqrt_max_ps", "interpret", "guard_marker"))
def expand_fov_pallas(dtable, cum, gstarts, total, gaze_dir, alpha, *, cap,
                      cap_out=None, chunk=512, batch=8, grid_x, grid_y,
                      width, height, real_w, real_h, dist, fov_num,
                      fov_num_cull=None, sqrt_max_ps, interpret=False,
                      guard_marker=False):
    """dtable (DROWS, N_pad) bf16 split-row table (N_pad multiple of 128,
    >= wsize+1; layout in foveated.build_fov_dtable);
    cum (1, N_pad + 128) f32 exclusive cumsum of tiles_touched in original
    order (padding rows set past the pair total; +128 so the kernel's
    8-row-aligned window reads never run off the end); gstarts (CAP//chunk,) i32 =
    first row owning pair c*chunk; total () i32 candidate pair count;
    gaze_dir (3,) f32 unit gaze direction; alpha () f32. cap_out bounds the
    COMPACTED output (kept pairs only; defaults to cap).

    Returns (key (CAP_OUT,) i32 fused sort key + dbits (CAP_OUT,) i32
    exact-depth secondary key (see fused_key32) — sentinel-masked past
    the kept count, attrs (6, CAP_OUT) f32
    [mx, my, P_caca, P_cbcc, OPRG, BRGB] (P_caca = bf16 x2 split of ca;
    OPRG = op1_u8 | op2_u8 | r1_u8 | g1_u8, BRGB = b1 | r2 | g2 | b2,
    opacities u8/255, colors u8 on [0, 2] — see the kernel's packing
    comment), kept () i32 — may exceed the usable capacity, in which case
    trailing pairs were dropped)."""
    n_pad = dtable.shape[1]
    assert cap % (chunk * batch) == 0, (cap, chunk, batch)
    if cap_out is None:
        cap_out = cap
    cap_out = ((cap_out + 127) // 128) * 128
    assert cap_out >= chunk + 128
    num_chunks = cap // chunk
    wsize = chunk + WPAD
    assert n_pad >= wsize, (n_pad, wsize)

    ints = jnp.concatenate([total[None].astype(jnp.int32),
                            gstarts.astype(jnp.int32)])
    consts = jnp.zeros((1, 128), jnp.float32)
    consts = consts.at[0, 0:3].set(gaze_dir)
    consts = consts.at[0, 3].set(alpha)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(num_chunks // batch,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec((1, 128), lambda i, *_: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec(memory_space=pl.ANY),
                   pl.BlockSpec(memory_space=pl.ANY)],
        scratch_shapes=[pltpu.VMEM((2, dtable.shape[0], wsize),
                                   jnp.bfloat16),
                        pltpu.VMEM((2, 1, wsize + 128), jnp.float32),
                        pltpu.VMEM((2, OROWS, chunk + 128), jnp.float32),
                        pltpu.VMEM((OROWS, 128), jnp.float32),
                        pltpu.VMEM((1, 128), jnp.int32),
                        pltpu.SMEM((2,), jnp.int32),
                        pltpu.SemaphoreType.DMA((2,)),
                        pltpu.SemaphoreType.DMA((2,)),
                        pltpu.SemaphoreType.DMA((2,))],
    )
    kernel = functools.partial(
        _kernel, chunk=chunk, wsize=wsize, batch=batch, grid_x=grid_x,
        num_tiles=grid_x * grid_y, n_pad=n_pad, cap_out=cap_out,
        width=width, height=height,
        real_w=real_w, real_h=real_h, dist=dist, fov_num=fov_num,
        fov_num_cull=fov_num_cull or fov_num, drows=dtable.shape[0],
        sqrt_max_ps=sqrt_max_ps, guard_marker=guard_marker)
    out, cnt = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((OROWS, cap_out), jnp.float32),
                   jax.ShapeDtypeStruct((1, 128), jnp.int32)],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(ints, dtable, cum, consts)
    kept = cnt[0, 0]
    missed = cnt[0, 64]    # window-missed (dropped) pairs, guard mode
    # Lanes past the kept count (and past the clamped write region when
    # kept overflows cap_out) hold stale garbage — sentinel-mask the key.
    num_tiles = grid_x * grid_y
    usable = jnp.minimum(kept, cap_out - (chunk + 128))
    key, dbits = fused_key32(out[0], out[1], usable, num_tiles)
    return key, dbits, out[2:8], kept, missed
