"""Decompose the fov tile-sort STAGE at the real bench capacity: raw
key+4i64 lax.sort vs + pack, + unpack/concat, + seg searchsorted. The
stage bench reports ~24 ms while the raw sort should be ~12 ms at this
capacity — this probe attributes the difference. x64 REALLY enabled (see
bench_sort_parts.py)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import numpy as np

from fovsplat.ops.foveated import _pack_i64, _unpack_i64

cap2 = 2_686_976
num_tiles = 78 * 52
db = 31 - int(num_tiles).bit_length()
rng = np.random.default_rng(0)
key = jnp.asarray(
    rng.integers(0, (num_tiles + 1) << db, cap2), jnp.int32)
attrs = jnp.asarray(rng.normal(0, 1, (8, cap2)), jnp.float32)
packed4 = tuple(jnp.asarray(
    rng.integers(0, 2**62, cap2, dtype=np.int64), jnp.int64)
    for _ in range(4))


def force(x):
    return float(np.asarray(jax.device_get(
        jax.tree.leaves(x)[0].ravel()[0].astype(jnp.float32))))


def timeit(f, *a, reps=10, label=""):
    out = f(*a)
    force(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*a)
    force(out)
    dt = (time.perf_counter() - t0) / reps * 1e3
    print(f"{label}: {dt:.2f} ms", flush=True)
    return out


timeit(jax.jit(lambda k: k[:8] + 1), key, reps=20, label="RTT floor")

timeit(jax.jit(lambda k, p: jax.lax.sort((k, *p), num_keys=1)),
       key, packed4, reps=10, label="raw sort key+4 i64")

timeit(jax.jit(lambda a: (_pack_i64(a[0], a[1]), _pack_i64(a[2], a[3]),
                          _pack_i64(a[4], a[5]), _pack_i64(a[6], a[7]))),
       attrs, reps=10, label="pack 8f32 -> 4i64")

timeit(jax.jit(lambda p: jnp.concatenate(
    [_unpack_i64(p[i]) for i in range(4)], axis=0)),
    packed4, reps=10, label="unpack 4i64 -> (8,CAP)")

timeit(jax.jit(lambda k: jnp.searchsorted(
    k, jnp.arange(num_tiles + 1, dtype=jnp.int32) << db,
    side="left").astype(jnp.int32)),
    jnp.sort(key), reps=10, label="seg searchsorted (4057 queries)")


def full(k, a):
    res = jax.lax.sort(
        (k, _pack_i64(a[0], a[1]), _pack_i64(a[2], a[3]),
         _pack_i64(a[4], a[5]), _pack_i64(a[6], a[7])), num_keys=1)
    packed = jnp.concatenate(
        [_unpack_i64(res[i]) for i in range(1, 5)], axis=0)
    seg = jnp.searchsorted(
        res[0], jnp.arange(num_tiles + 1, dtype=jnp.int32) << db,
        side="left").astype(jnp.int32)
    return packed, seg


timeit(jax.jit(full), key, attrs, reps=10, label="full stage (pipeline)")
