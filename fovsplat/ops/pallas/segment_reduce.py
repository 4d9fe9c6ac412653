"""Pallas TPU segment reduction over a gid-SORTED value stream.

The train backward must reduce per-pair cotangent rows to per-Gaussian
columns (the reference backward's atomicAdd scatter, backward.cu:523-554).
XLA on TPU has no fast scatter path: 9x jax.ops.segment_sum costs ~216 ms
at 3.4M pairs on a v5e, a combined row scatter 276 ms, and sorted-flag
segment_sum 300 ms (scripts/bench_gid_reduce.py). A cumsum-diff
formulation is cheap but catastrophically cancels (a single Gaussian's
sum is recovered as the difference of two ~global-magnitude prefix sums).

This kernel exploits the SORTED gid stream instead: per-gid sums are
one equality one-hot matmul against a sliding output window (with a
flush-and-remask loop for chunks whose gid span exceeds the window —
sparse streams can jump arbitrarily far inside one chunk):

    partial (R, WOUT) += vals (R, chunk) @ onehot(gid == base + w)

with the window carried in VMEM across chunks (the grid is sequential)
and flushed to HBM in aligned FLUSH-column blocks as the stream's gid
advances — every output block is written exactly once, no read-modify-
write, no atomics, exact f32 accumulation. Values ride the MXU as exact
bf16 x3 splits (blend_fwd._rows_to_cols_exact rationale).

Input  rows (16, CAP) f32: row 0 = gid (integer-valued, ASCENDING;
       sentinel n for padding lanes whose value rows are zero),
       rows 1..R = values to reduce, rest ignored.
Output (16, n_pad) f32: per-gid sums in rows 1..R (row 0 = gid count
       column sums of 1s if row 0 of input were ones; here it carries
       the reduced gid*count — ignore it), n_pad a multiple of FLUSH.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

VROWS = 16
FLUSH = 768          # output columns per flush DMA
WOUT = 1536          # VMEM window: FLUSH + chunk + slack (chunk <= 512)

_MASK_HI = -65536


def _split3_rows(x):
    hi = pltpu.bitcast(pltpu.bitcast(x, jnp.int32) & _MASK_HI, jnp.float32)
    rem = x - hi
    mid = pltpu.bitcast(pltpu.bitcast(rem, jnp.int32) & _MASK_HI,
                        jnp.float32)
    return hi, mid, rem - mid


def _kernel(block_ref, out_hbm, carry, base_ref, sem,
            *, chunk: int, kbatch: int, n_pad: int, nrows: int,
            skip_from: int | None = None):
    cb = pl.program_id(0)
    nprog = pl.num_programs(0)

    @pl.when(cb == 0)
    def _():
        base_ref[0] = 0
        carry[...] = jnp.zeros((VROWS, WOUT), jnp.float32)

    w_iota = jax.lax.broadcasted_iota(jnp.int32, (WOUT, chunk), 0)

    def flush_one(base):
        dst = pl.multiple_of(jnp.minimum(base, n_pad - FLUSH), FLUSH)
        dma = pltpu.make_async_copy(
            carry.at[:, 0:FLUSH], out_hbm.at[:, pl.ds(dst, FLUSH)], sem)
        dma.start()
        dma.wait()
        # Shift the window down by FLUSH and zero the vacated tail.
        carry[...] = jnp.concatenate(
            [carry[:, FLUSH:WOUT],
             jnp.zeros((VROWS, FLUSH), jnp.float32)], axis=1)
        return base + FLUSH

    def body(k, _):
        blk = block_ref[:, pl.ds(k * chunk, chunk)]        # (VROWS, chunk)
        gid = blk[0:1, :].astype(jnp.int32)                 # (1, chunk)
        first = gid[0, 0]
        last = gid[0, chunk - 1]                            # max (sorted)

        # Dead-chunk skip (skip_from = the caller's zero-value sentinel
        # id, sorted past every live gid): the train backward routes
        # zero-cotangent lanes — ~2/3 of the stream, everything past
        # each tile's deepest contributing pair — to the sentinel, so
        # whole chunks of zeros skip the one-hot + matmul + accumulate.
        # Their window columns flush via the final drain.
        @pl.when(first < (skip_from if skip_from is not None
                          else jnp.int32(2147483647)))
        def _run():
            # Advance the window until this chunk's FIRST gid sits in the
            # retained [base, base+FLUSH) span.
            def adv_cond(b):
                return first >= b + FLUSH

            base_ref[0] = jax.lax.while_loop(adv_cond, flush_one,
                                             base_ref[0])

            hi, mid, lo = _split3_rows(blk[1:1 + nrows, :])
            parts = jnp.concatenate([hi, mid, lo],
                                    axis=0).astype(jnp.bfloat16)

            def accumulate(base, lo_gid):
                # Lanes with gid < lo_gid were accumulated by a previous
                # window position; the one-hot's [base, base+WOUT) range
                # masks lanes still ahead of this window.
                onehot = ((gid == base + w_iota)
                          & (gid >= lo_gid)).astype(jnp.bfloat16)
                partial = jax.lax.dot_general(
                    parts, onehot, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)     # (3R, WOUT)
                carry[1:1 + nrows, :] += (
                    partial[0:nrows] + partial[nrows:2 * nrows]
                    + partial[2 * nrows:3 * nrows])

            accumulate(base_ref[0], jnp.int32(-2147483647))

            # Sorted-but-SPARSE gid streams can span more than WOUT
            # values inside one chunk (e.g. a long frustum-culled id
            # run): keep flushing and re-accumulate only the
            # not-yet-covered lanes until the chunk's last gid fits.
            def tail_cond(b):
                return last >= b + WOUT

            def tail_body(b):
                covered = b + WOUT
                b = flush_one(b)
                accumulate(b, covered)
                return b

            base_ref[0] = jax.lax.while_loop(tail_cond, tail_body,
                                             base_ref[0])
        return 0

    jax.lax.fori_loop(0, kbatch, body, 0)

    # Last program: drain the remaining window across the whole tail.
    @pl.when(cb == nprog - 1)
    def _():
        def drain_cond(b):
            return b < n_pad

        jax.lax.while_loop(drain_cond, flush_one, base_ref[0])


@functools.partial(jax.jit, static_argnames=("n_pad", "chunk", "kbatch",
                                             "nrows", "interpret",
                                             "skip_from"))
def reduce_by_sorted_gid(rows, *, n_pad: int, chunk: int = 512,
                         kbatch: int = 16, nrows: int = 9,
                         interpret: bool = False,
                         skip_from: int | None = None):
    """rows (16, CAP) f32, row 0 ascending integer gids (sentinel gid for
    padding lanes must be < n_pad and its value rows zero), rows
    1..nrows = values. CAP must be a multiple of chunk*kbatch; n_pad a
    multiple of FLUSH. skip_from: chunks whose FIRST gid >= skip_from
    are all-zero sentinel lanes and skip their accumulate entirely (the
    caller must guarantee value rows are zero at gid >= skip_from).
    Returns (16, n_pad) per-gid sums (rows 1..nrows)."""
    cap = rows.shape[1]
    assert rows.shape[0] == VROWS
    assert cap % (chunk * kbatch) == 0, (cap, chunk, kbatch)
    assert n_pad % FLUSH == 0
    assert chunk + 1 <= WOUT - FLUSH
    assert skip_from is None or skip_from < n_pad
    grid = (cap // (chunk * kbatch),)
    kernel = functools.partial(_kernel, chunk=chunk, kbatch=kbatch,
                               n_pad=n_pad, nrows=nrows,
                               skip_from=skip_from)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec((VROWS, chunk * kbatch), lambda i: (0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((VROWS, n_pad), jnp.float32),
        scratch_shapes=[pltpu.VMEM((VROWS, WOUT), jnp.float32),
                        pltpu.SMEM((1,), jnp.int32),
                        pltpu.SemaphoreType.DMA(())],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(rows)
    return out
