"""Per-Gaussian gradient reduction variants on the real TPU.

The train backward's sort/expand VJP reduces 9 per-pair cotangent rows to
per-Gaussian columns by gid. Round-3 profile: 9x jax.ops.segment_sum at
5.36M lanes = 370 ms (XLA scatter-add). Variants:
  a) 9x segment_sum (current)
  b) ONE scatter-add of (CAP, 9) rows
  c) gid-sort (1 sort, 9 payloads) + segment_sum(indices_are_sorted=True)
  d) gid-sort + cumsum-diff at per-Gaussian boundaries from a
     marks-scatter (i32 constant scatter + cumsum)
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import jax
import jax.numpy as jnp
import numpy as np

ap = argparse.ArgumentParser()
ap.add_argument("--cap", type=int, default=3_407_872)
ap.add_argument("--n", type=int, default=1_161_358)
args = ap.parse_args()
cap, n = args.cap, args.n

kk = jax.random.split(jax.random.PRNGKey(0), 3)
# tile-sorted order: gids effectively random per lane
gid = jax.random.randint(kk[0], (cap,), 0, n, jnp.int32)
vals = jax.random.normal(kk[1], (9, cap), jnp.float32)
num_pairs = jnp.int32(int(cap * 0.9))
lane = jnp.arange(cap, dtype=jnp.int32)


def force(x):
    return float(np.asarray(jax.device_get(
        jax.tree.leaves(x)[0].ravel()[0].astype(jnp.float32))))


def timeit(f, *a, reps=6, label=""):
    out = f(*a)
    force(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*a)
    force(out)
    print(f"{label}: {(time.perf_counter()-t0)/reps*1e3:.1f} ms", flush=True)
    return out


def var_a(gid, vals):
    g = jnp.where(lane < num_pairs, gid, n)
    return [jax.ops.segment_sum(
        jnp.where(lane < num_pairs, vals[r], 0.0), g,
        num_segments=n + 1)[:n] for r in range(9)]


def var_b(gid, vals):
    g = jnp.where(lane < num_pairs, gid, n)
    v = jnp.where(lane < num_pairs, vals, 0.0).T        # (CAP, 9)
    return jnp.zeros((n + 1, 9), jnp.float32).at[g].add(v)[:n]


def var_c(gid, vals):
    g = jnp.where(lane < num_pairs, gid, n)
    res = jax.lax.sort((g, *(vals[r] for r in range(9))), num_keys=1)
    return [jax.ops.segment_sum(res[1 + r], res[0], num_segments=n + 1,
                                indices_are_sorted=True)[:n]
            for r in range(9)]


def var_d(gid, vals):
    g = jnp.where(lane < num_pairs, gid, n)
    res = jax.lax.sort((g, *(vals[r] for r in range(9))), num_keys=1)
    gs = res[0]
    # boundary marks: start index of each gid via constant i32 scatter
    starts = jnp.zeros(n + 2, jnp.int32).at[gs + 1].add(1, mode='drop')
    starts = jnp.cumsum(starts)          # starts[g] = first lane of gid g
    out = []
    for r in range(9):
        S = jnp.concatenate([jnp.zeros(1, jnp.float32),
                             jnp.cumsum(res[1 + r])])
        out.append(S[starts[1:n + 1]] - S[starts[:n]])
    return out


timeit(jax.jit(var_a), gid, vals, label="a) 9x segment_sum (scatter)")
timeit(jax.jit(var_b), gid, vals, label="b) one (CAP,9) row scatter-add")
timeit(jax.jit(var_c), gid, vals, label="c) gid-sort + sorted segment_sum")
timeit(jax.jit(var_d), gid, vals, label="d) gid-sort + cumsum-diff")
