"""Microbenchmark: pair-sort strategies on TPU."""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

rng = np.random.default_rng(0)
CAP = int(os.environ.get("CAP", str(1 << 22)))
T = 8160
keys = jnp.asarray(rng.integers(0, T, CAP), jnp.int32)
payload = jnp.asarray(rng.integers(0, 1 << 20, CAP), jnp.int32)
fkeys = keys.astype(jnp.float32)


def force(x):
    leaves = jax.tree.leaves(x)
    return float(jnp.sum(leaves[0].ravel()[:1]))


def timeit(f, *a, reps=5, label=""):
    out = f(*a)
    force(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        force(f(*a))
    print(f"{label}: {(time.perf_counter()-t0)/reps*1e3:.2f} ms", flush=True)
    return out


timeit(jax.jit(lambda k, p: jax.lax.sort((k, p), num_keys=1, is_stable=True)),
       keys, payload, label="lax.sort stable i32+payload")
timeit(jax.jit(lambda k, p: jax.lax.sort((k, p), num_keys=1, is_stable=False)),
       keys, payload, label="lax.sort unstable i32+payload")
timeit(jax.jit(lambda k: jax.lax.sort((k,), num_keys=1, is_stable=False)),
       keys, label="lax.sort unstable i32 only")
timeit(jax.jit(lambda k: jnp.sort(k)), fkeys, label="jnp.sort f32 only")
timeit(jax.jit(lambda k: jnp.argsort(k)), keys, label="argsort i32")

# Unique-key trick: pack (tile, index) into one f64? Not on TPU. Try u32
# packing with reduced index bits: tile(13) + idx_low(19) -> stability within
# 512k groups only. Just measure a single u32 unstable sort with payload:
packed = (keys.astype(jnp.uint32) << 19) | (
    jnp.arange(CAP, dtype=jnp.uint32) & jnp.uint32((1 << 19) - 1))
timeit(jax.jit(lambda k, p: jax.lax.sort((k, p), num_keys=1, is_stable=False)),
       packed, payload, label="lax.sort unstable u32packed+payload")

# Counting-sort destination computation: histogram + cumsum + rank via
# one-hot matmul blocks (rank-within-tile by block prefix).
def counting_positions(keys):
    # histogram
    hist = jnp.zeros(T + 1, jnp.int32).at[keys].add(1, mode='drop')
    offs = jnp.concatenate([jnp.zeros(1, jnp.int32),
                            jnp.cumsum(hist)[:-1].astype(jnp.int32)])
    return hist, offs


timeit(jax.jit(counting_positions), keys, label="histogram+cumsum only")

# Scatter throughput reference: 8M scatter-add into 8k bins is above;
# full permutation scatter:
perm = jnp.asarray(rng.permutation(CAP), jnp.int32)
timeit(jax.jit(lambda p, v: jnp.zeros(CAP, jnp.int32).at[p].set(v)),
       perm, payload, label="8M permutation scatter")
timeit(jax.jit(lambda p, v: v[p]), perm, payload, label="8M gather i32")
