"""Standalone Mosaic probe: do i16 broadcast compares / selects lower on
this TPU? If yes, the expand kernel's one-hot mask builds (its dominant
VPU cost) can run 2x-packed: compares on i16 operands, then a single
select to the f32/bf16 one-hot.

Prints PASS/FAIL per pattern; lowering errors print client-side when the
kernel compiles standalone (memory: mosaic-kernel-pitfalls).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def run(name, kernel, out_shape, *args):
    try:
        out = pl.pallas_call(kernel, out_shape=out_shape)(*args)
        out = np.asarray(jax.device_get(out))
        print(f"{name}: PASS  sum={out.sum():.1f}", flush=True)
        return out
    except Exception as e:
        print(f"{name}: FAIL  {type(e).__name__}: {str(e)[:300]}",
              flush=True)
        return None


# 1. i16 iota + broadcast compare + select to f32
def k_i16_cmp(x_ref, o_ref):
    ri = jax.lax.broadcasted_iota(jnp.int16, (256, 512), 0)
    ci = jax.lax.broadcasted_iota(jnp.int16, (256, 512), 1)
    thr = x_ref[0:1, 0:512].astype(jnp.int16)         # (1, 512) i16
    m = (ri <= ci) & (thr <= ci)
    o_ref[...] = jnp.where(m, 1.0, 0.0)


run("i16 iota/cmp/select->f32", k_i16_cmp,
    jax.ShapeDtypeStruct((256, 512), jnp.float32),
    jnp.arange(512, dtype=jnp.float32).reshape(1, 512) % 7)


# 2. f32 -> i16 conversion of data values then 2D broadcast compare
def k_i16_conv(x_ref, o_ref):
    v = jnp.clip(x_ref[...], -1.0, 513.0).astype(jnp.int16)   # (1, 512)
    ci = jax.lax.broadcasted_iota(jnp.int16, (256, 512), 1)
    lo = v[0:1, :]
    m = (lo <= ci)
    o_ref[...] = jnp.where(m, 1.0, 0.0).astype(jnp.bfloat16)


run("f32->i16 conv + cmp -> bf16", k_i16_conv,
    jax.ShapeDtypeStruct((256, 512), jnp.bfloat16),
    jnp.arange(512, dtype=jnp.float32).reshape(1, 512) % 11)


# 3. bf16 compare path (alternative if i16 fails): small ints exact in bf16
def k_bf16_cmp(x_ref, o_ref):
    ri = jax.lax.broadcasted_iota(jnp.bfloat16, (256, 512), 0)
    thr = x_ref[0:1, 0:512].astype(jnp.bfloat16)
    m = thr <= ri
    o_ref[...] = jnp.where(m, 1.0, 0.0).astype(jnp.bfloat16)


run("bf16 iota/cmp -> bf16", k_bf16_cmp,
    jax.ShapeDtypeStruct((256, 512), jnp.bfloat16),
    jnp.arange(512, dtype=jnp.float32).reshape(1, 512) % 7)


# 4. correctness of pattern 1 vs numpy
x = jnp.arange(512, dtype=jnp.float32).reshape(1, 512) % 7
out = run("i16 correctness", k_i16_cmp,
          jax.ShapeDtypeStruct((256, 512), jnp.float32), x)
if out is not None:
    ri = np.arange(256)[:, None]
    ci = np.arange(512)[None, :]
    ref = ((ri <= ci) & (np.asarray(x)[0][None, :] <= ci)).astype(np.float32)
    print("i16 matches numpy:", bool((out == ref).all()), flush=True)
