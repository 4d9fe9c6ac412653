"""Decompose the fov tile-sort stage cost on the real TPU, with x64
REALLY enabled (without it, i64 payloads silently truncate to i32 and the
probe measures the wrong thing). Answers: does lax.sort cost scale with
operand count or operand bytes? Shapes match bench_fov_stages."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import numpy as np

cap2 = 3_260_416
rng = np.random.default_rng(0)
key = jnp.asarray(rng.integers(0, 1 << 31, cap2), jnp.int32)
attrs = jnp.asarray(rng.normal(0, 1, (9, cap2)), jnp.float32)
attrs64 = jnp.asarray(rng.integers(0, 2**62, (5, cap2), dtype=np.int64),
                      jnp.int64)
assert attrs64.dtype == jnp.int64, attrs64.dtype


def force(x):
    return float(np.asarray(jax.device_get(
        jax.tree.leaves(x)[0].ravel()[0].astype(jnp.float32))))


def timeit(f, *a, reps=10, label=""):
    out = f(*a)
    force(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        force(f(*a))
    print(f"{label}: {(time.perf_counter()-t0)/reps*1e3:.2f} ms", flush=True)
    return out


timeit(jax.jit(lambda k: k[:8] + 1), key, reps=20, label="RTT floor (tiny op)")
timeit(jax.jit(lambda k: k[:8] + 1), key, reps=20, label="RTT floor again")


def sortn(n_ops):
    return jax.jit(lambda k, a: jax.lax.sort(
        (k, *(a[i] for i in range(n_ops))), num_keys=1))


timeit(sortn(9), key, attrs, reps=10, label="sort key+9 f32")

i64sort = jax.jit(lambda k, a: jax.lax.sort(
    (k, *(a[i] for i in range(4))), num_keys=1))
out = timeit(i64sort, key, attrs64, reps=10,
             label="sort key+4 TRUE i64 (=8 f32 bytes)")
assert out[1].dtype == jnp.int64, out[1].dtype

i64sort5 = jax.jit(lambda k, a: jax.lax.sort(
    (k, *(a[i] for i in range(5))), num_keys=1))
timeit(i64sort5, key, attrs64, reps=10, label="sort key+5 TRUE i64")

# pack+sort+unpack end-to-end (what foveated.py would actually run)
def packed_sort(k, a):
    def pack(x, y):
        ua = jax.lax.bitcast_convert_type(x, jnp.uint32).astype(jnp.uint64)
        ub = jax.lax.bitcast_convert_type(y, jnp.uint32).astype(jnp.uint64)
        return ((ua << 32) | ub).astype(jnp.int64)

    q = (k, pack(a[0], a[1]), pack(a[2], a[3]), pack(a[4], a[5]),
         pack(a[6], a[7]), a[8])
    r = jax.lax.sort(q, num_keys=1)

    def unpack(z):
        uz = z.astype(jnp.uint64)
        hi = jax.lax.bitcast_convert_type(
            (uz >> 32).astype(jnp.uint32), jnp.float32)
        lo = jax.lax.bitcast_convert_type(uz.astype(jnp.uint32), jnp.float32)
        return jnp.stack([hi, lo], axis=0)

    packed = jnp.concatenate(
        [*(unpack(r[i]) for i in range(1, 5)), r[5][None, :],
         jnp.zeros((7, cap2), jnp.float32)], axis=0)
    return packed


timeit(jax.jit(packed_sort), key, attrs, reps=10,
       label="pack4i64+sort6+unpack to (16,CAP)")
