"""Tile-sort variants on the real TPU at the fov bench capacity.

The round-2 sort stage is lax.sort((i64 key, 3 bit-packed i64 payloads))
at cap_out lanes (~12.6 ms incl pack/unpack/searchsorted). Candidates:

  a) i64 key (tile << 32 | f32 depth bits)         — exact (current)
  b) i32 key (tile << 19 | f32 depth bits >> 13)   — ~2^-11 relative depth
     ties; inference-only candidate (quality gate: >40 dB vs f32 oracle)
  c) two i32 keys (tile|depth-hi, depth-lo)        — exact, num_keys=2
  d) i32 key19 + payloads as 6 f32 (no i64 packing at all)

All variants carry the same 24 payload bytes/lane. x64 enabled for (a).
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import jax
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import numpy as np

ap = argparse.ArgumentParser()
ap.add_argument("--cap", type=int, default=1_769_472)
args = ap.parse_args()

cap = args.cap
num_tiles = 78 * 52
# On-device data (tunnel host->device transfers are very slow).
kk = jax.random.split(jax.random.PRNGKey(0), 3)
tile = jax.random.randint(kk[0], (cap,), 0, num_tiles + 1, jnp.int32)
depth = jax.random.uniform(kk[1], (cap,), jnp.float32, 0.3, 80.0)
attrs = jax.random.normal(kk[2], (6, cap), jnp.float32)


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
    print(f"{label}: {(time.perf_counter()-t0)/reps*1e3:.2f} ms", flush=True)
    return out


def pack_i64(a, b):
    return jax.lax.bitcast_convert_type(jnp.stack([a, b], axis=-1),
                                        jnp.int64)


def unpack_i64(q):
    return jax.lax.bitcast_convert_type(q, jnp.float32).T


def payload3(a):
    return (pack_i64(a[0], a[1]), pack_i64(a[2], a[3]), pack_i64(a[4], a[5]))


def finish(res, key_sorted, bounds):
    packed = jnp.concatenate(
        [unpack_i64(r) for r in res] + [jnp.zeros((2, cap), jnp.float32)],
        axis=0)
    seg = jnp.searchsorted(key_sorted, bounds, side="left").astype(jnp.int32)
    return packed, seg


def var_a(tile, depth, a):
    k = (tile.astype(jnp.int64) << 32) | jax.lax.bitcast_convert_type(
        depth, jnp.int32).astype(jnp.int64)
    res = jax.lax.sort((k, *payload3(a)), num_keys=1)
    return finish(res[1:], res[0],
                  jnp.arange(num_tiles + 1, dtype=jnp.int64) << 32)


def var_b(tile, depth, a):
    db = jax.lax.shift_right_logical(
        jax.lax.bitcast_convert_type(depth, jnp.int32), jnp.int32(13))
    k = (tile << jnp.int32(19)) | db
    res = jax.lax.sort((k, *payload3(a)), num_keys=1)
    return finish(res[1:], res[0],
                  jnp.arange(num_tiles + 1, dtype=jnp.int32) << jnp.int32(19))


def var_c(tile, depth, a):
    db = jax.lax.bitcast_convert_type(depth, jnp.int32)
    k1 = (tile << jnp.int32(19)) | jax.lax.shift_right_logical(db, jnp.int32(13))
    res = jax.lax.sort((k1, db, *payload3(a)), num_keys=2)
    return finish(res[2:], res[0],
                  jnp.arange(num_tiles + 1, dtype=jnp.int32) << jnp.int32(19))


def var_d(tile, depth, a):
    db = jax.lax.shift_right_logical(
        jax.lax.bitcast_convert_type(depth, jnp.int32), jnp.int32(13))
    k = (tile << jnp.int32(19)) | db
    res = jax.lax.sort((k, *(a[i] for i in range(6))), num_keys=1)
    packed = jnp.concatenate(
        [jnp.stack(res[1:], axis=0), jnp.zeros((2, cap), jnp.float32)],
        axis=0)
    seg = jnp.searchsorted(
        res[0], jnp.arange(num_tiles + 1, dtype=jnp.int32) << jnp.int32(19),
        side="left").astype(jnp.int32)
    return packed, seg


timeit(jax.jit(lambda k: k[:8] + 1), tile, reps=20, label="RTT floor")
timeit(jax.jit(var_a), tile, depth, attrs, reps=10,
       label="a) i64 key exact + 3 i64")
timeit(jax.jit(var_b), tile, depth, attrs, reps=10,
       label="b) i32 key19 + 3 i64")
timeit(jax.jit(var_c), tile, depth, attrs, reps=10,
       label="c) 2x i32 keys exact + 3 i64")
timeit(jax.jit(var_d), tile, depth, attrs, reps=10,
       label="d) i32 key19 + 6 f32")


def var_e(tile, depth, a):
    db = jax.lax.bitcast_convert_type(depth, jnp.int32)
    k1 = (tile << jnp.int32(19)) | jax.lax.shift_right_logical(db, jnp.int32(13))
    res = jax.lax.sort((k1, db, *(a[i] for i in range(6))), num_keys=2)
    packed = jnp.concatenate(
        [jnp.stack(res[2:], axis=0), jnp.zeros((2, cap), jnp.float32)],
        axis=0)
    seg = jnp.searchsorted(
        res[0], jnp.arange(num_tiles + 1, dtype=jnp.int32) << jnp.int32(19),
        side="left").astype(jnp.int32)
    return packed, seg


timeit(jax.jit(var_e), tile, depth, attrs, reps=10,
       label="e) 2x i32 keys exact + 6 f32")

# Batched-sort ceiling: same total lanes split into B independent rows
# (what a Pallas bucket pass would feed). Costs exclude the bucket pass.
for B, W in ((16, 131072), (64, 32768), (256, 8192)):
    kb = jax.random.split(jax.random.PRNGKey(B), 8)
    t2 = jax.random.randint(kb[0], (B, W), 0, num_tiles + 1, jnp.int32)
    d2 = jax.random.uniform(kb[1], (B, W), jnp.float32, 0.3, 80.0)
    a2 = jax.random.normal(kb[2], (6, B, W), jnp.float32)

    def var_batched(t2, d2, a2):
        db = jax.lax.bitcast_convert_type(d2, jnp.int32)
        k1 = (t2 << jnp.int32(19)) | jax.lax.shift_right_logical(
            db, jnp.int32(13))
        res = jax.lax.sort((k1, db, *(a2[i] for i in range(6))),
                           dimension=1, num_keys=2)
        return res[2]

    timeit(jax.jit(var_batched), t2, d2, a2, reps=10,
           label=f"f) batched ({B}, {W}) 2xi32 keys + 6 f32")
