"""Isolate the fov blend kernel's per-tile fixed overhead (~3.9 us/tile
measured with EMPTY segments). Three stripped kernels over the same grid
(4056 tiles, batch 8):
  A: per tile, write a constant (PIX, 8) output block only
  B: A + act load + activity masks + is_blend reduce
  C: B + two zero-trip while_loops with the real carry structure
"""
import os
import sys
import time
import functools

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

PIX = 256
T = 4056


def kernel(seg_ref, act_ref, out_ref, *, mode: str, BATCH: int):
    if mode == "W":
        # window sub-DMA scalar machinery (no DMAs issued: ns == 0)
        maxsub = 16

        def issue(j, _):
            @pl.when(j < seg_ref[0])        # seg is all zeros -> never
            def _():
                out_ref[0, 0, 0] = 1.0
            return 0
        jax.lax.fori_loop(0, maxsub, issue, 0)
        jax.lax.fori_loop(0, maxsub, issue, 0)
    for b in range(BATCH):
        zc = jnp.zeros((PIX, 1), jnp.float32)
        one = jnp.ones((PIX, 1), jnp.float32)
        if mode == "A":
            out_ref[b] = jnp.concatenate(
                [zc, zc, zc, one, zc, zc, zc, one], axis=1)
            continue
        act = act_ref[b]
        l1_active = act[:, 0:1] > 0
        l2_active = act[:, 1:2] > 0
        is_blend = jnp.max(act[:, 1]) > 0
        if mode == "B":
            v = jnp.where(l1_active & l2_active, 1.0, 0.0)
            out_ref[b] = jnp.concatenate(
                [v, zc, zc, one, zc, zc, zc, one], axis=1)
            continue
        # mode C: zero-trip whiles with the real carry structure.
        t = pl.program_id(0) * BATCH + b
        start = seg_ref[t]
        num_chunks = pl.cdiv(start - start, 256)   # always 0

        def body_dual(s):
            k, cont, T1, c1r, c1g, c1b, T2, c2r, c2g, c2b = s
            return (k + 1, k + 1 < num_chunks, T1 * 0.5, c1r + 0.1, c1g,
                    c1b, T2, c2r, c2g, c2b)

        def body_single(s):
            k, cont, T1, c1r, c1g, c1b = s
            return k + 1, k + 1 < num_chunks, T1 * 0.5, c1r + 0.1, c1g, c1b

        @pl.when(is_blend)
        def _():
            st = jax.lax.while_loop(
                lambda s: s[1], body_dual,
                (jnp.int32(0), num_chunks > 0, one, zc, zc, zc, one, zc,
                 zc, zc))
            _, _, T1, c1r, c1g, c1b, T2, c2r, c2g, c2b = st
            out_ref[b] = jnp.concatenate(
                [c1r, c1g, c1b, T1, c2r, c2g, c2b, T2], axis=1)

        @pl.when(jnp.logical_not(is_blend))
        def _():
            st = jax.lax.while_loop(
                lambda s: s[1], body_single,
                (jnp.int32(0), num_chunks > 0, one, zc, zc, zc))
            _, _, T1, c1r, c1g, c1b = st
            out_ref[b] = jnp.concatenate(
                [c1r, c1g, c1b, T1, zc, zc, zc, one], axis=1)


def run(mode, BATCH=8):
    T_PAD = ((T + BATCH - 1) // BATCH) * BATCH
    seg = jnp.zeros(T_PAD, jnp.int32)
    act = jnp.ones((T_PAD, PIX, 4), jnp.float32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(T_PAD // BATCH,),
        in_specs=[pl.BlockSpec((BATCH, PIX, 4), lambda t, *_: (t, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec((BATCH, PIX, 8), lambda t, *_: (t, 0, 0),
                                memory_space=pltpu.VMEM)],
    )
    f = jax.jit(lambda s, a: pl.pallas_call(
        functools.partial(kernel, mode='C' if mode == 'W' else mode, BATCH=BATCH) if mode != 'W' else functools.partial(kernel, mode='W', BATCH=BATCH), grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((T_PAD, PIX, 8), jnp.float32)],
    )(s, a)[0])
    out = f(seg, act)
    float(np.asarray(jax.device_get(out.ravel()[0])))
    t0 = time.perf_counter()
    for _ in range(20):
        out = f(seg, act)
    float(np.asarray(jax.device_get(out.ravel()[0])))
    dt = (time.perf_counter() - t0) / 20
    print(f"mode {mode} batch {BATCH}: {dt*1e3:.2f} ms total, "
          f"{dt/T*1e6:.2f} us/tile, "
          f"{dt/(T_PAD//BATCH)*1e6:.2f} us/program", flush=True)


if os.environ.get("PROBE_ORIG"):
    for m, b in (("A", 8), ("A", 32), ("C", 32), ("W", 8), ("A", 128)):
        run(m, b)


def run_T(BATCH=8):
    """Transposed output layout: PIX on lanes, (batch, 8, PIX) block."""
    T_PAD = ((T + BATCH - 1) // BATCH) * BATCH
    seg = jnp.zeros(T_PAD, jnp.int32)
    act = jnp.ones((T_PAD, 4, PIX), jnp.float32)

    def k2(seg_ref, act_ref, out_ref):
        for b in range(BATCH):
            zr = jnp.zeros((1, PIX), jnp.float32)
            on = jnp.ones((1, PIX), jnp.float32)
            l1 = act_ref[b, 0:1, :] > 0
            v = jnp.where(l1, 1.0, 0.0)
            out_ref[b] = jnp.concatenate(
                [v, zr, zr, on, zr, zr, zr, on], axis=0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(T_PAD // BATCH,),
        in_specs=[pl.BlockSpec((BATCH, 4, PIX), lambda t, *_: (t, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec((BATCH, 8, PIX), lambda t, *_: (t, 0, 0),
                                memory_space=pltpu.VMEM)],
    )
    f = jax.jit(lambda s, a: pl.pallas_call(
        k2, grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((T_PAD, 8, PIX), jnp.float32)],
    )(s, a)[0])
    out = f(seg, act)
    float(np.asarray(jax.device_get(out.ravel()[0])))
    t0 = time.perf_counter()
    for _ in range(20):
        out = f(seg, act)
    float(np.asarray(jax.device_get(out.ravel()[0])))
    dt = (time.perf_counter() - t0) / 20
    print(f"mode T batch {BATCH}: {dt*1e3:.2f} ms total, "
          f"{dt/T*1e6:.2f} us/tile", flush=True)


run_T(8)
run_T(32)
