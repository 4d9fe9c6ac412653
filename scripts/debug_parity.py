"""Debug helper: find where tile and dense renders disagree."""
import os
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import jax.numpy as jnp
import numpy as np

import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fovsplat.ops import dense, rasterize, projection
from tests.utils import make_test_camera, synthetic_cloud

means, scales, quats, ops_, colors = synthetic_cloud(n=512, seed=3)
cam = make_test_camera(width=128, height=96)

cfg = rasterize.RasterizeConfig(pair_capacity=1 << 14, chunk=256)
dense_f = jax.jit(lambda m, s, q, o, c: dense.render_dense(m, s, q, o, c, cam))
tile_f = jax.jit(lambda m, s, q, o, c: rasterize.rasterize(
    m, s, q, o, cam, colors=c, config=cfg))
out_d = dense_f(means, scales, quats, ops_, colors)
out_t = tile_f(means, scales, quats, ops_, colors)

Td = np.asarray(out_d["final_T"])
Tt = np.asarray(out_t["final_T"])
diff = np.abs(Td - Tt)
iy, ix = np.unravel_index(np.argmax(diff), diff.shape)
print("max diff", diff.max(), "at pixel", iy, ix, "Td", Td[iy, ix], "Tt", Tt[iy, ix], flush=True)
print("num big diffs", (diff > 1e-4).sum(), flush=True)

prep = jax.jit(lambda m, s, q: projection.preprocess(m, s, q, cam))(means, scales, quats)
order = np.asarray(jnp.argsort(jnp.where(prep.valid, prep.depth, jnp.inf)))
m2d = np.asarray(prep.mean2d)
conic = np.asarray(prep.conic)
valid = np.asarray(prep.valid)

px, py = float(ix), float(iy)


def chain_from(ids):
    out = []
    for g in ids:
        dx = m2d[g, 0] - px
        dy = m2d[g, 1] - py
        a, b, c = conic[g]
        power = -0.5 * (a * dx * dx + c * dy * dy) - b * dx * dy
        if power > 0 or power < -4.5:
            continue
        alpha = min(0.99, ops_[g] * np.exp(power))
        if alpha < 1.0 / 255.0:
            continue
        out.append((int(g), float(alpha)))
    return out


chain = chain_from([g for g in order if valid[g]])
print("dense chain length:", len(chain), flush=True)

bn = out_t["binned"]
gx = (cam.width + 15) // 16
tile = (iy // 16) * gx + (ix // 16)
s = int(bn.seg_start[tile])
e = int(bn.seg_start[tile + 1])
pair_g = np.asarray(bn.pair_gauss)[s:e]
print("tile segment length:", e - s, flush=True)

tile_chain = chain_from(pair_g)
print("tile chain length:", len(tile_chain), flush=True)
dg = [g for g, _ in chain]
tg = [g for g, _ in tile_chain]
print("missing from tile:", [g for g in dg if g not in tg], flush=True)
print("extra in tile:", [g for g in tg if g not in dg], flush=True)
print("order equal:", dg == tg, flush=True)


def seq_T(ch):
    T = 1.0
    for g, a in ch:
        tT = T * (1 - a)
        if tT < 1e-4:
            break
        T = tT
    return T


print("seq T dense chain:", seq_T(chain), "seq T tile chain:", seq_T(tile_chain), flush=True)
depths = np.asarray(prep.depth)
print("tile chain depths sorted?",
      all(depths[tg[i]] <= depths[tg[i + 1]] for i in range(len(tg) - 1)), flush=True)
