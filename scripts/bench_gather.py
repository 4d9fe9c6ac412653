"""Microbench: TPU cost of (a) row gathers vs table width and table size,
(b) lax.sort vs payload-operand count. Informs how foveated per-level
attributes should ride the binning pipeline."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

CAP = 3 << 20
N = 1_161_358
rng = np.random.default_rng(0)
idx_n = jnp.asarray(rng.integers(0, N, (CAP,)), jnp.int32)      # random
idx_sorted = jnp.sort(idx_n)                                    # coalesced-ish
key = jnp.asarray(rng.integers(0, 8160, (CAP,)), jnp.int32)


def timeit(f, *a, reps=10, label=""):
    out = f(*a)
    float(jax.tree.leaves(out)[0].ravel()[0])
    t0 = time.perf_counter()
    for _ in range(reps):
        float(jax.tree.leaves(f(*a))[0].ravel()[0])
    print(f"{label}: {(time.perf_counter()-t0)/reps*1e3:.2f} ms", flush=True)


for w in (1, 5, 8, 17, 34):
    tab = jnp.asarray(rng.normal(0, 1, (N, w)), jnp.float32)
    timeit(jax.jit(lambda t, i: t[i].sum(1)), tab, idx_n, reps=5,
           label=f"gather (N,{w}) random idx")

tab17 = jnp.asarray(rng.normal(0, 1, (N, 17)), jnp.float32)
timeit(jax.jit(lambda t, i: t[i].sum(1)), tab17, idx_sorted, reps=5,
       label="gather (N,17) sorted idx")

big = jnp.asarray(rng.normal(0, 1, (CAP, 14)), jnp.float32)
perm = jnp.asarray(rng.permutation(CAP), jnp.int32)
timeit(jax.jit(lambda t, i: t[i].sum(1)), big, perm, reps=5,
       label="gather (CAP,14) permutation")

vals = [jnp.asarray(rng.normal(0, 1, (CAP,)), jnp.float32)
        for _ in range(13)]
for k in (1, 3, 5, 9, 13):
    timeit(jax.jit(lambda key, *v: jax.lax.sort((key, *v), num_keys=1,
                                                is_stable=True)[0]),
           key, *vals[:k], reps=5, label=f"sort key+{k} payloads")


# Depth-reorder formulations for the fused-expansion dtable build:
# (N,16) row gather + transpose vs direct lane-dim gather of (16, N).
cols16 = [jnp.asarray(rng.normal(0, 1, (N,)), jnp.float32)
          for _ in range(16)]
dorder = jnp.asarray(rng.permutation(N), jnp.int32)
timeit(jax.jit(lambda do, *c: jnp.stack(c, 1)[do].T), dorder, *cols16,
       reps=5, label="stack(ax1)+rowgather+T -> (16,N)")
timeit(jax.jit(lambda do, *c: jnp.stack(c, 0)[:, do]), dorder, *cols16,
       reps=5, label="stack(ax0)+lanegather -> (16,N)")
timeit(jax.jit(lambda do, *c: jnp.stack([x[do] for x in c], 0)), dorder,
       *cols16, reps=5, label="16x (N,) gathers + stack(ax0)")
