"""Pallas row compaction of the per-Gaussian split-row table.

Drops INVALID rows (culled / clipped-out Gaussians) from the bf16 dtable
before pair expansion. Without it, every invalid row carries one dummy
pair so the expand kernel's bounded-window property holds in original
order (foveated._bin_fov_fused) — 0.49M of 2.87M candidate pairs on the
bench workload (~17% of the expand kernel's chunks) exist only to be
culled. After compaction every surviving row has tnum >= 1, the window
property holds with NO dummies, and the candidate stream shrinks to the
real pair total.

Same staging machinery as the expand kernel's output compaction
(rank via log-roll prefix, one-hot permutation matmul into a 128-aligned
staging block with a cross-chunk carry, whole-block DMA): all dtable
values are bf16 by construction, so the bf16 permutation matmul is
lossless; tnum (integer up to num_tiles > 256) rides as an exact bf16 x2
split pair. The kernel also REBUILDS the cum_excl split rows (3-5) for
the compacted order from a running pair-total carry — the only rows
whose values change.

The caller derives the new f32 cum from rows 3-5 (their sum is exact)
and sentinel-pads past the live count (see binning/foveated users).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TROWS = 64
_MASK_HI = -65536


def _trunc_bf16(x):
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


def _prefix_excl_lanes(x):
    n = x.shape[1]
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    incl = x
    s = 1
    while s < n:
        incl = incl + jnp.where(lane >= s, pltpu.roll(incl, s, 1), 0.0)
        s *= 2
    return incl - x


def _kernel(dt_ref, tnum_ref, out_hbm, cnt_hbm, obuf, tail, cntbuf,
            kcum, outsem, *, chunk: int, kbatch: int, cap_out: int,
            flag_row: int, flag_thresh: float):
    cb_ = pl.program_id(0)
    out_w = chunk + 128

    @pl.when(cb_ == 0)
    def _():
        kcum[0] = 0          # live rows written
        kcum[1] = 0          # running pair total (exact int in i32 range)

    d_iota = jax.lax.broadcasted_iota(
        jnp.int32, (out_w, chunk), 0).astype(jnp.float32)
    lane128 = jax.lax.broadcasted_iota(jnp.int32, (TROWS, 128), 1)

    def out_dma(slot, base):
        dst = pl.multiple_of(jnp.minimum(base, cap_out - out_w), 128)
        return pltpu.make_async_copy(obuf.at[slot],
                                     out_hbm.at[:, pl.ds(dst, out_w)],
                                     outsem.at[slot])

    def body(k, prev_base):
        dt = dt_ref[:, pl.ds(k * chunk, chunk)]              # (64,) bf16
        tn = tnum_ref[:, pl.ds(k * chunk, chunk)]            # (1, chunk)
        keep = dt[flag_row:flag_row + 1, :].astype(jnp.float32) > flag_thresh
        keepf = keep.astype(jnp.float32)
        rank = _prefix_excl_lanes(keepf)
        kept = jnp.sum(keepf).astype(jnp.int32)

        kc = kcum[0]
        tail_len = jax.lax.rem(kc, 128)
        base = kc - tail_len
        dst = tail_len.astype(jnp.float32) + rank
        ohT = ((d_iota == dst) & keep).astype(jnp.bfloat16)  # (out_w, chunk)

        tn_hi, tn_lo = _split2(tn)
        # dt stays bf16 end to end — every table value is bf16 by
        # construction, so no f32 round trip is needed for the permute.
        vals = jnp.concatenate(
            [dt, tn_hi.astype(jnp.bfloat16), tn_lo.astype(jnp.bfloat16),
             jnp.zeros((80 - TROWS - 2, chunk), jnp.bfloat16)], axis=0)
        staged = jax.lax.dot_general(
            vals, ohT, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)              # (80, out_w)

        # Rebuild cum_excl rows (3-5) for the COMPACTED order: running
        # pair total + exclusive prefix of the kept tnums (carried lanes
        # < tail_len contribute 0 through the one-hot, so the prefix is
        # correct for the new lanes and the head merge below restores the
        # carried lanes' already-correct values).
        tnp = staged[TROWS:TROWS + 1] + staged[TROWS + 1:TROWS + 2]
        pc = kcum[1]
        cum_new = pc.astype(jnp.float32) + _prefix_excl_lanes(tnp)
        c_hi, c_mid, c_lo = _split3(cum_new)
        blk = jnp.concatenate(
            [staged[0:3], c_hi, c_mid, c_lo, staged[6:TROWS]], axis=0)
        head = jnp.where(lane128 < tail_len,
                         tail[...].astype(jnp.float32), blk[:, 0:128])
        blk = jnp.concatenate([head, blk[:, 128:]], axis=1)

        @pl.when(prev_base >= 0)
        def _():
            out_dma(1 - (k % 2), prev_base).wait()

        obuf[k % 2] = blk.astype(jnp.bfloat16)
        out_dma(k % 2, base).start()

        new_total = tail_len + kept
        flush = (new_total // 128) * 128
        fidx = jnp.full((TROWS, 128), flush // 128, jnp.int32)
        sel = blk[:, 0:128]
        for i in range(1, chunk // 128 + 1):
            sel = jnp.where(fidx == i, blk[:, 128 * i:128 * i + 128], sel)
        tail[...] = sel.astype(jnp.bfloat16)
        kcum[0] = kc + kept
        kcum[1] = pc + jnp.sum(tnp).astype(jnp.int32)
        return base

    last_base = jax.lax.fori_loop(0, kbatch, body, jnp.int32(-1))
    out_dma((kbatch - 1) % 2, last_base).wait()

    @pl.when(cb_ == pl.num_programs(0) - 1)
    def _():
        cntbuf[...] = jnp.concatenate(
            [jnp.full((1, 64), kcum[0], jnp.int32),
             jnp.full((1, 64), kcum[1], jnp.int32)], axis=1)
        dma = pltpu.make_async_copy(cntbuf, cnt_hbm, outsem.at[0])
        dma.start()
        dma.wait()
        # Zero the STALE tail [ceil128(live), cap_out): those lanes are
        # arbitrary HBM garbage, and a NaN bit pattern there would poison
        # the expand kernel's one-hot matmul even through zero one-hot
        # columns (0 * NaN accumulates NaN). Valid lanes end at live;
        # lanes up to the last written block are already zero from the
        # staging, so re-zeroing them is harmless.
        obuf[0] = jnp.zeros((TROWS, chunk + 128), jnp.bfloat16)

        def zero_at(z, width):
            zs = pl.multiple_of(z, 128)
            d = pltpu.make_async_copy(
                obuf.at[0, :, pl.ds(0, width)],
                out_hbm.at[:, pl.ds(zs, width)], outsem.at[0])
            d.start()
            d.wait()
            return z + width

        z0 = ((kcum[0] + 127) // 128) * 128

        def big_cond(z):
            return z + (chunk + 128) <= cap_out

        z1 = jax.lax.while_loop(big_cond, lambda z: zero_at(z, chunk + 128),
                                z0)

        def small_cond(z):
            return z < cap_out

        jax.lax.while_loop(small_cond, lambda z: zero_at(z, 128), z1)


@functools.partial(jax.jit, static_argnames=("chunk", "kbatch", "cap_out",
                                             "flag_row", "flag_thresh",
                                             "interpret"))
def compact_table_pallas(dtable, tnum, *, chunk=512, kbatch=16,
                         cap_out=None, flag_row: int, flag_thresh: float,
                         interpret=False):
    """dtable (64, N_pad) bf16 (N_pad multiple of chunk*kbatch), tnum
    (1, N_pad) f32. Rows with dtable[flag_row] > flag_thresh survive
    (fov: row 27 = hl, thresh -1.0; ps1: row 45 = valid, thresh 0.5).

    Returns (dtable_c (64, CAP_OUT) bf16 — lanes past the live count are
    STALE, mask via the live count; live () i32; total_pairs () i32)."""
    n_pad = dtable.shape[1]
    assert dtable.shape[0] == TROWS
    while kbatch > 1 and n_pad % (chunk * kbatch):
        kbatch //= 2                  # small tables (tests) divide less
    assert n_pad % (chunk * kbatch) == 0, (n_pad, chunk, kbatch)
    if cap_out is None:
        # Real slack past the worst-case live count: the staged block DMA
        # writes a full (chunk+128)-wide block at a 128-aligned base, so
        # with live == n_pad the last write extends past n_pad. Without
        # the slack the dst clamp would shift that block low and corrupt
        # the previous block's tail.
        cap_out = n_pad + chunk + 128
    cap_out = ((cap_out + 127) // 128) * 128
    assert cap_out >= n_pad + chunk + 128 or cap_out >= chunk + 128, (
        "cap_out must either cover worst-case live+block slack or the "
        "caller must guarantee live <= cap_out - (chunk+128)")
    grid = (n_pad // (chunk * kbatch),)
    kernel = functools.partial(_kernel, chunk=chunk, kbatch=kbatch,
                               cap_out=cap_out, flag_row=flag_row,
                               flag_thresh=flag_thresh)
    out, cnt = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec((TROWS, chunk * kbatch), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, chunk * kbatch), lambda i: (0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec(memory_space=pl.ANY),
                   pl.BlockSpec(memory_space=pl.ANY)],
        out_shape=[jax.ShapeDtypeStruct((TROWS, cap_out), jnp.bfloat16),
                   jax.ShapeDtypeStruct((1, 128), jnp.int32)],
        scratch_shapes=[pltpu.VMEM((2, TROWS, chunk + 128), jnp.bfloat16),
                        pltpu.VMEM((TROWS, 128), jnp.bfloat16),
                        pltpu.VMEM((1, 128), jnp.int32),
                        pltpu.SMEM((2,), jnp.int32),
                        pltpu.SemaphoreType.DMA((2,))],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(dtable, tnum)
    return out, cnt[0, 0], cnt[0, 64]
