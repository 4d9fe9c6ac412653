"""Fused per-Gaussian table-build kernel for the foveated SoA path.

Replaces the XLA column stage of ``rasterize_fov_soa`` — projection/EWA
(``projection.preprocess_cols``), level-rect clip, SH evaluation, per-level
color/opacity derivation, the bf16 split-row table stack
(``foveated.build_fov_dtable``) and the tiles-touched cumsum — with ONE
Pallas pass over the model. The XLA version runs ~50 elementwise passes
over (N,) columns plus a 50-row stack and an associative scan (~14 ms at
1.16M Gaussians on a v5e); this kernel streams the packed model once
(geometry f32 + colors bf16, ~190 B/Gaussian), computes everything
in-register, and writes the dtable directly in its bf16 split-row layout.

This is the TPU answer to the reference's ``preprocessCUDA``
(diff-gaussian-rasterization_fov_pcheck_obb/cuda_rasterizer/forward.cu:
156-241) + ``computeRestColorFromSH`` (rasterizer_impl.cu:34-84): one
per-Gaussian pass, except the TPU version also folds in the tile-count
prefix sum (CUDA uses a separate CUB InclusiveSum) via the sequential-grid
running carry.

Inputs (packed once per model in ``foveated.pack_fov_model``):
  geo_t (16, N_pad) f32: [x, y, z, sx, sy, sz, q0, q1, q2, q3, hl, pad x5]
  col_t (64, N_pad) bf16: [rest 3x16 (ch-major, k=0 zero DC), dc 3x4,
                           opac 4] — exactly 64 rows.
  consts (1, 128) f32 (dynamic per frame): world_view rows (12), full_proj
  rows 0/1/3 (12), cam_center (3), level-clip bboxes x0[4] y0[4] x1[4]
  y1[4] (16) at _CONST_* offsets.

Output: dtable (64, N_pad) bf16 in the exact ``build_fov_dtable`` layout,
cum (1, N_pad) f32 exclusive cumsum of tiles_touched (lane n holds the
pair total; see the padding analysis in the caller), total via
cum[-1] (all padding lanes contribute 0).

Math mirrors ``projection.preprocess_cols`` / ``_cov3d_cols`` /
``_cov2d_from_cols`` op for op (same order, same guards) so rect bounds
and validity bits match the XLA path exactly; the parity suite compares
the two end to end.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fovsplat.ops.projection import LOWPASS, NEAR_CULL_Z, TILE
from fovsplat.ops import sh as shmod

GROWS = 16
CROWS = 64
TROWS = 64           # dtable rows
TCHUNK = 4096        # lanes per grid program (model tables pad to this)

# consts lane offsets
_C_WV = 0            # world_view rows 0..2 (3x4)
_C_FP0 = 12          # full_proj row 0
_C_FP1 = 16          # full_proj row 1
_C_FP3 = 20          # full_proj row 3
_C_CAM = 24          # cam_center xyz
_C_FOC = 27          # focal_x, focal_y, tan_fovx, tan_fovy
_C_BBOX = 32         # x0[4], y0[4], x1[4], y1[4]


_MASK_HI = -65536    # 0xFFFF0000


def _trunc_bf16(x):
    """bf16-representable truncation via bit masking — immune to the
    XLA excess-precision fold that elides f32->bf16->f32 convert pairs
    (see foveated._trunc_bf16; Mosaic honors the converts today, but the
    masked form costs the same and cannot regress)."""
    return pltpu.bitcast(pltpu.bitcast(x, jnp.int32) & _MASK_HI,
                         jnp.float32)


def _split3(x):
    hi = _trunc_bf16(x)
    r = x - hi
    mid = _trunc_bf16(r)
    return hi, mid, r - mid


def _split2(x):
    hi = _trunc_bf16(x)
    return hi, x - hi


def _kernel(geo_ref, col_ref, consts_ref, dt_ref, cum_ref, tnum_ref, carry,
            *, chunk: int, n: int, grid_x: int, grid_y: int,
            width: int, height: int, scale_modifier: float,
            fov_num: int, fov_num_bbox: int, sh_degree: int,
            mode: str = "fov", drop_invalid: bool = False):
    # fov_num is the COLOR/OPACITY LAYOUT level count; fov_num_bbox the
    # level count of the clip-bbox consts + hl clamp (the SM-FR shared
    # layout uses fov_num=1 with fov_num_bbox=4: one color/opacity per
    # Gaussian, full 4-level culling — reference N7).
    c = pl.program_id(0)

    @pl.when(c == 0)
    def _():
        carry[0] = 0.0

    def k(i):
        return consts_ref[0:1, i:i + 1]

    # Single-row ref reads (no whole-block materialization — the geo/col
    # blocks are 256/512 KB and would spill vregs if loaded at once).
    def g(i):
        return geo_ref[i:i + 1, :]
    x = g(0)
    y = g(1)
    z = g(2)

    # --- view/projection (preprocess_cols) ---
    depth = k(_C_WV + 8) * x + k(_C_WV + 9) * y + k(_C_WV + 10) * z \
        + k(_C_WV + 11)
    hx = k(_C_FP0) * x + k(_C_FP0 + 1) * y + k(_C_FP0 + 2) * z \
        + k(_C_FP0 + 3)
    hy = k(_C_FP1) * x + k(_C_FP1 + 1) * y + k(_C_FP1 + 2) * z \
        + k(_C_FP1 + 3)
    hw = k(_C_FP3) * x + k(_C_FP3 + 1) * y + k(_C_FP3 + 2) * z \
        + k(_C_FP3 + 3)
    p_w = 1.0 / (hw + 1e-7)
    in_front = depth > NEAR_CULL_Z

    # --- cov3d from scale/quat (_cov3d_cols) ---
    qr = g(6)
    qx = g(7)
    qy = g(8)
    qz = g(9)
    r00 = 1 - 2 * (qy * qy + qz * qz)
    r01 = 2 * (qx * qy - qr * qz)
    r02 = 2 * (qx * qz + qr * qy)
    r10 = 2 * (qx * qy + qr * qz)
    r11 = 1 - 2 * (qx * qx + qz * qz)
    r12 = 2 * (qy * qz - qr * qx)
    r20 = 2 * (qx * qz - qr * qy)
    r21 = 2 * (qy * qz + qr * qx)
    r22 = 1 - 2 * (qx * qx + qy * qy)
    s0 = (g(3) * scale_modifier) ** 2
    s1 = (g(4) * scale_modifier) ** 2
    s2 = (g(5) * scale_modifier) ** 2
    sxx = r00 * r00 * s0 + r01 * r01 * s1 + r02 * r02 * s2
    sxy = r00 * r10 * s0 + r01 * r11 * s1 + r02 * r12 * s2
    sxz = r00 * r20 * s0 + r01 * r21 * s1 + r02 * r22 * s2
    syy = r10 * r10 * s0 + r11 * r11 * s1 + r12 * r12 * s2
    syz = r10 * r20 * s0 + r11 * r21 * s1 + r12 * r22 * s2
    szz = r20 * r20 * s0 + r21 * r21 * s1 + r22 * r22 * s2

    # --- EWA cov2d (_cov2d_from_cols) ---
    tX = k(_C_WV + 0) * x + k(_C_WV + 1) * y + k(_C_WV + 2) * z \
        + k(_C_WV + 3)
    tY = k(_C_WV + 4) * x + k(_C_WV + 5) * y + k(_C_WV + 6) * z \
        + k(_C_WV + 7)
    tz = depth
    focal_x = k(_C_FOC)
    focal_y = k(_C_FOC + 1)
    limx = 1.3 * k(_C_FOC + 2)
    limy = 1.3 * k(_C_FOC + 3)
    tx = jnp.clip(tX / tz, -limx, limx) * tz
    ty = jnp.clip(tY / tz, -limy, limy) * tz
    inv_z = 1.0 / tz
    inv_z2 = inv_z * inv_z
    j00, j02 = focal_x * inv_z, -focal_x * tx * inv_z2
    j11, j12 = focal_y * inv_z, -focal_y * ty * inv_z2
    a0 = j00 * k(_C_WV + 0) + j02 * k(_C_WV + 8)
    a1 = j00 * k(_C_WV + 1) + j02 * k(_C_WV + 9)
    a2 = j00 * k(_C_WV + 2) + j02 * k(_C_WV + 10)
    b0 = j11 * k(_C_WV + 4) + j12 * k(_C_WV + 8)
    b1 = j11 * k(_C_WV + 5) + j12 * k(_C_WV + 9)
    b2 = j11 * k(_C_WV + 6) + j12 * k(_C_WV + 10)
    sa0 = sxx * a0 + sxy * a1 + sxz * a2
    sa1 = sxy * a0 + syy * a1 + syz * a2
    sa2 = sxz * a0 + syz * a1 + szz * a2
    sb0 = sxx * b0 + sxy * b1 + sxz * b2
    sb1 = sxy * b0 + syy * b1 + syz * b2
    sb2 = sxz * b0 + syz * b1 + szz * b2
    cxx = a0 * sa0 + a1 * sa1 + a2 * sa2 + LOWPASS
    cxy = b0 * sa0 + b1 * sa1 + b2 * sa2
    cyy = b0 * sb0 + b1 * sb1 + b2 * sb2

    det = cxx * cyy - cxy * cxy
    det_ok = det != 0.0
    safe_det = jnp.where(det_ok, det, 1.0)
    det_inv = 1.0 / safe_det
    mid = 0.5 * (cxx + cyy)
    disc = jnp.sqrt(jnp.maximum(0.1, mid * mid - safe_det))
    lambda1 = mid + disc
    lambda2 = mid - disc
    radius_f = jnp.ceil(3.0 * jnp.sqrt(jnp.maximum(lambda1, lambda2)))

    px = ((hx * p_w + 1.0) * width - 1.0) * 0.5    # ndc2pix
    py = ((hy * p_w + 1.0) * height - 1.0) * 0.5

    rx0 = jnp.clip(((px - radius_f) / TILE).astype(jnp.int32), 0, grid_x)
    ry0 = jnp.clip(((py - radius_f) / TILE).astype(jnp.int32), 0, grid_y)
    rx1 = jnp.clip(((px + radius_f + TILE - 1) / TILE).astype(jnp.int32),
                   0, grid_x)
    ry1 = jnp.clip(((py + radius_f + TILE - 1) / TILE).astype(jnp.int32),
                   0, grid_y)
    tiles0 = (rx1 - rx0) * (ry1 - ry0)
    valid0 = in_front & det_ok & (tiles0 > 0)

    lane = c * chunk + jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1)
    if mode == "fov":
        hl = g(10)
        nb = fov_num_bbox
        hli = jnp.clip(hl.astype(jnp.int32), 0, nb - 1)
        bx0 = k(_C_BBOX + 0)
        by0 = k(_C_BBOX + nb)
        bx1 = k(_C_BBOX + 2 * nb)
        by1 = k(_C_BBOX + 3 * nb)
        for h in range(1, nb):
            m = hli == h
            bx0 = jnp.where(m, k(_C_BBOX + h), bx0)
            by0 = jnp.where(m, k(_C_BBOX + nb + h), by0)
            bx1 = jnp.where(m, k(_C_BBOX + 2 * nb + h), bx1)
            by1 = jnp.where(m, k(_C_BBOX + 3 * nb + h), by1)
        rx0 = jnp.maximum(rx0, bx0.astype(jnp.int32))
        ry0 = jnp.maximum(ry0, by0.astype(jnp.int32))
        rx1 = jnp.minimum(rx1, bx1.astype(jnp.int32))
        ry1 = jnp.minimum(ry1, by1.astype(jnp.int32))
        tnum = jnp.maximum(rx1 - rx0, 0) * jnp.maximum(ry1 - ry0, 0)
        valid = valid0 & (tnum > 0) & (hl >= 0.0) & (lane < n)
    else:                         # ps1: no level clip, no hl gating
        tnum = tiles0
        valid = valid0 & (lane < n)
    rx1 = jnp.maximum(rx1, rx0)

    # Dummy rows: every INVALID row in [0, n) carries one culled pair so
    # the expand kernel's bounded-window property holds in original order
    # (foveated._bin_fov_fused); padding lanes >= n carry none.
    # INVALID lanes' projective values can be inf/NaN (p_w blows up near
    # hw = 0); they must not reach the table — a zero one-hot column does
    # NOT neutralize a NaN operand through an MXU pass (0 * NaN = NaN
    # accumulates into every pair of the chunk). Sanitize every
    # valid-gated value before the split rows.
    px = jnp.where(valid, px, 0.0)
    py = jnp.where(valid, py, 0.0)
    depth = jnp.where(valid, depth, 1.0)
    is_dummy = jnp.logical_not(valid) & (lane < n)
    # drop_invalid (fov inference): invalid rows carry NO dummy pair —
    # the candidate stream shrinks by the invalid count (~22% at bench
    # scale). The expand window property then holds only statistically;
    # the expand kernel's marker-row guard (row 31) counts and drops any
    # window-missed pair instead of corrupting it.
    tnum_f = jnp.where(valid, tnum.astype(jnp.float32), 0.0)
    if not drop_invalid:
        tnum_f = tnum_f + jnp.where(is_dummy, 1.0, 0.0)
    rx0_f = jnp.where(valid, rx0.astype(jnp.float32), 0.0)
    ry0_f = jnp.where(valid, ry0.astype(jnp.float32), 0.0)
    rw_f = jnp.where(valid,
                     jnp.maximum(rx1 - rx0, 1).astype(jnp.float32), 1.0)
    hl_row = jnp.where(valid, hl, -2.0) if mode == "fov" else None

    # --- OBB principal axes (preprocess_cols tail) ---
    multi = tnum > 1
    a1e = cxx - lambda1
    a2e = cxx - lambda2
    n1 = jax.lax.rsqrt(jnp.maximum(cxy * cxy + a1e * a1e, 1e-20))
    n2 = jax.lax.rsqrt(jnp.maximum(cxy * cxy + a2e * a2e, 1e-20))
    len1 = jnp.where(multi, 3.0 * jnp.sqrt(jnp.maximum(lambda1, 0.0)), 0.0)
    len2 = jnp.where(multi, 3.0 * jnp.sqrt(jnp.maximum(lambda2, 0.0)), 0.0)
    v1x = -cxy * n1
    v1y = a1e * n1
    v2x = -cxy * n2
    v2y = a2e * n2
    ca = cyy * det_inv
    cb = -cxy * det_inv
    cc = cxx * det_inv
    # Same sanitize rationale as px/py/depth: behind-camera lanes can
    # push tz ~ 0 -> inf through the EWA chain into the OBB/conic family,
    # and inf splits produce NaN residual rows.
    v1x = jnp.where(valid, v1x, 0.0)
    v1y = jnp.where(valid, v1y, 0.0)
    v2x = jnp.where(valid, v2x, 0.0)
    v2y = jnp.where(valid, v2y, 0.0)
    len1 = jnp.where(valid, len1, 0.0)
    len2 = jnp.where(valid, len2, 0.0)
    ca = jnp.where(valid, ca, 1.0)
    cb = jnp.where(valid, cb, 0.0)
    cc = jnp.where(valid, cc, 1.0)

    # --- SH rest (ch-major bf16 rows, slice-wise upcast) + colors ---
    dxc = x - k(_C_CAM)
    dyc = y - k(_C_CAM + 1)
    dzc = z - k(_C_CAM + 2)
    # max guard: zero-padded model lanes sit AT the camera center and
    # rsqrt(0) = inf would poison the SH rows (see sanitize note above).
    inv_n = jax.lax.rsqrt(jnp.maximum(
        dxc * dxc + dyc * dyc + dzc * dzc, 1e-20))
    dx = dxc * inv_n
    dy = dyc * inv_n
    dz = dzc * inv_n
    xx, yy2, zz = dx * dx, dy * dy, dz * dz
    xy, yz, xz = dx * dy, dy * dz, dx * dz
    def rest_eval(ch):
        # Includes the C0 term: the fov table's k=0 rows are zero (DC
        # rides per level), the ps1 table's k=0 rows hold the DC itself.
        def cf(kk):
            return col_ref[ch * 16 + kk:ch * 16 + kk + 1,
                           :].astype(jnp.float32)
        r = (shmod.SH_C0 * cf(0)
             - shmod.SH_C1 * dy * cf(1) + shmod.SH_C1 * dz * cf(2)
             - shmod.SH_C1 * dx * cf(3))
        if sh_degree > 1:
            r = (r + shmod.SH_C2[0] * xy * cf(4)
                 + shmod.SH_C2[1] * yz * cf(5)
                 + shmod.SH_C2[2] * (2.0 * zz - xx - yy2) * cf(6)
                 + shmod.SH_C2[3] * xz * cf(7)
                 + shmod.SH_C2[4] * (xx - yy2) * cf(8))
            if sh_degree > 2:
                r = (r + shmod.SH_C3[0] * dy * (3.0 * xx - yy2) * cf(9)
                     + shmod.SH_C3[1] * xy * dz * cf(10)
                     + shmod.SH_C3[2] * dy * (4.0 * zz - xx - yy2) * cf(11)
                     + shmod.SH_C3[3] * dz
                     * (2.0 * zz - 3 * xx - 3 * yy2) * cf(12)
                     + shmod.SH_C3[4] * dx * (4.0 * zz - xx - yy2) * cf(13)
                     + shmod.SH_C3[5] * dz * (xx - yy2) * cf(14)
                     + shmod.SH_C3[6] * dx * (xx - 3.0 * yy2) * cf(15))
        return r + 0.5

    rest_c = [rest_eval(ch) for ch in range(3)]
    if mode == "fov":
        dc0 = 48
        op0 = dc0 + 3 * fov_num
        ops_lv = [col_ref[op0 + l:op0 + l + 1, :].astype(jnp.float32)
                  for l in range(fov_num)]
        cols_lv = [jnp.maximum(
            shmod.SH_C0 * col_ref[dc0 + ch * fov_num + l:
                                  dc0 + ch * fov_num + l + 1,
                                  :].astype(jnp.float32)
            + rest_c[ch], 0.0)
            for ch in range(3) for l in range(fov_num)]
    else:
        ops_lv = [col_ref[48:49, :].astype(jnp.float32)]
        cols_lv = [jnp.maximum(rc, 0.0) for rc in rest_c]

    # --- exclusive prefix of tnum + global carry (sequential grid) ---
    lane_i = jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1)
    incl = tnum_f
    s = 1
    while s < chunk:
        incl = incl + jnp.where(lane_i >= s, pltpu.roll(incl, s, 1), 0.0)
        s *= 2
    kc = carry[0]
    cum_excl = kc + (incl - tnum_f)
    carry[0] = kc + incl[0, chunk - 1]
    cum_ref[...] = cum_excl
    tnum_ref[...] = tnum_f

    # --- dtable rows ---
    rows = [rx0_f, ry0_f, rw_f,
            *_split3(cum_excl),
            *_split3(px), *_split3(py),
            *_split2(v1x), *_split2(v1y),
            *_split2(v2x), *_split2(v2y),
            *_split2(len1), *_split2(len2),
            *_split3(ca)]
    if mode == "fov":
        # build_fov_dtable layout (50 rows). Row 31 = window marker: 1.0
        # on every model row; a pair whose one-hot gathered marker is 0
        # missed the expand window (only possible with drop_invalid) and
        # is dropped + counted there.
        rows += [hl_row, *_split3(depth),
                 jnp.where(lane < n, 1.0, 0.0)]
        rows += ops_lv + cols_lv + [cb, cc]
    else:
        # binning.bin_fused_ps1 layout (52 rows): cb/cc/op/r/g/b as x3
        # splits, valid flag row 45, depth rows 46-48, gid rows 49-51
        # (train-mode payload; inference ignores them).
        rows += [*_split3(cb), *_split3(cc), *_split3(ops_lv[0]),
                 *_split3(cols_lv[0]), *_split3(cols_lv[1]),
                 *_split3(cols_lv[2]),
                 jnp.where(valid, 1.0, 0.0),
                 *_split3(depth),
                 *_split3(lane.astype(jnp.float32))]
    out = jnp.concatenate(rows, axis=0).astype(jnp.bfloat16)
    trows = dt_ref.shape[0]
    dt_ref[...] = jnp.concatenate(
        [out, jnp.zeros((trows - out.shape[0], chunk), jnp.bfloat16)],
        axis=0)


@functools.partial(jax.jit, static_argnames=(
    "n", "chunk", "grid_x", "grid_y", "width", "height", "scale_modifier",
    "fov_num", "fov_num_bbox", "sh_degree", "interpret", "mode",
    "drop_invalid"))
def build_fov_table_pallas(geo_t, col_t, consts, *, n, chunk=4096,
                           grid_x, grid_y, width, height,
                           scale_modifier=1.0,
                           fov_num=4, fov_num_bbox=None, sh_degree=3,
                           interpret=False, mode="fov",
                           drop_invalid=False):
    """geo_t (16, N_pad) f32, col_t (64, N_pad) bf16 (N_pad a multiple of
    `chunk`), consts (1, 128) f32 (see module docstring).

    Returns (dtable (64, N_pad) bf16, cum (1, N_pad) f32 exclusive cumsum
    with cum[lane >= n] == pair total, total_f () f32, tnum (1, N_pad)
    f32 per-row tile counts incl. the one-dummy-per-invalid-row scheme —
    input to ops/pallas/compact_table)."""
    n_pad = geo_t.shape[1]
    assert n_pad % chunk == 0 and col_t.shape[1] == n_pad
    assert geo_t.shape[0] == GROWS and col_t.shape[0] == CROWS
    grid = (n_pad // chunk,)
    kernel = functools.partial(
        _kernel, chunk=chunk, n=n, grid_x=grid_x, grid_y=grid_y,
        width=width, height=height,
        scale_modifier=scale_modifier, fov_num=fov_num,
        fov_num_bbox=fov_num_bbox or fov_num, sh_degree=sh_degree,
        mode=mode, drop_invalid=drop_invalid)
    # Shared-color (SM-FR) fov tables use 38 rows -> a 48-row table
    # (16-aligned for bf16 tiling); the smaller M feeds straight into a
    # 25%-smaller expansion matmul in expand_fov.
    trows = TROWS if mode != "fov" or fov_num >= 2 else 48
    dtable, cum, tnum = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec((GROWS, chunk), lambda c: (0, c)),
                  pl.BlockSpec((CROWS, chunk), lambda c: (0, c)),
                  pl.BlockSpec((1, 128), lambda c: (0, 0))],
        out_specs=[pl.BlockSpec((trows, chunk), lambda c: (0, c)),
                   pl.BlockSpec((1, chunk), lambda c: (0, c)),
                   pl.BlockSpec((1, chunk), lambda c: (0, c))],
        out_shape=[jax.ShapeDtypeStruct((trows, n_pad), jnp.bfloat16),
                   jax.ShapeDtypeStruct((1, n_pad), jnp.float32),
                   jax.ShapeDtypeStruct((1, n_pad), jnp.float32)],
        scratch_shapes=[pltpu.SMEM((1,), jnp.float32)],
        interpret=interpret,
    )(geo_t, col_t, consts)
    # Padding lanes contribute tnum = 0, so the last cum lane IS the total.
    total_f = cum[0, -1]
    return dtable, cum, total_f, tnum


def make_table_consts(camera, bx0=None, by0=None, bx1=None, by1=None):
    """(1, 128) f32 consts vector (module docstring layout). bx0..by1 are
    (L,) per-level clip-bbox scalars (fov mode only)."""
    c = jnp.zeros((128,), jnp.float32)
    wv = jnp.asarray(camera.world_view, jnp.float32)
    fp = jnp.asarray(camera.full_proj, jnp.float32)
    c = c.at[_C_WV:_C_WV + 12].set(wv[:3].reshape(-1))
    c = c.at[_C_FP0:_C_FP0 + 4].set(fp[0])
    c = c.at[_C_FP1:_C_FP1 + 4].set(fp[1])
    c = c.at[_C_FP3:_C_FP3 + 4].set(fp[3])
    c = c.at[_C_CAM:_C_CAM + 3].set(
        jnp.asarray(camera.cam_center, jnp.float32))
    c = c.at[_C_FOC].set(jnp.asarray(camera.focal_x, jnp.float32))
    c = c.at[_C_FOC + 1].set(jnp.asarray(camera.focal_y, jnp.float32))
    c = c.at[_C_FOC + 2].set(jnp.asarray(camera.tan_fovx, jnp.float32))
    c = c.at[_C_FOC + 3].set(jnp.asarray(camera.tan_fovy, jnp.float32))
    if bx0 is not None:
        L = bx0.shape[0]
        c = c.at[_C_BBOX:_C_BBOX + L].set(bx0.astype(jnp.float32))
        c = c.at[_C_BBOX + L:_C_BBOX + 2 * L].set(by0.astype(jnp.float32))
        c = c.at[_C_BBOX + 2 * L:_C_BBOX + 3 * L].set(
            bx1.astype(jnp.float32))
        c = c.at[_C_BBOX + 3 * L:_C_BBOX + 4 * L].set(
            by1.astype(jnp.float32))
    return c[None, :]
