"""Measure candidate/surviving pair counts for the bench fov workload,
with and without pre-expansion level-rect clipping. Informs the static
pair-capacity choice (the whole binning pipeline is CAP-bound).
"""
import argparse
import sys

sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_161_358)
    ap.add_argument("--cap", type=int, default=1 << 23)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        import dataclasses
import jax
        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp
    import numpy as np

    from fovsplat.data.cameras import look_at_camera
    from fovsplat.ops import foveated as fov
    from fovsplat.ops.rasterize import RasterizeConfig

    rng = np.random.default_rng(0)
    n = args.n
    means = jnp.asarray(rng.normal(0, 1.2, (n, 3)), jnp.float32)
    scales = jnp.asarray(rng.uniform(0.002, 0.012, (n, 3)), jnp.float32)
    quats = rng.normal(0, 1, (n, 4))
    quats /= np.linalg.norm(quats, axis=1, keepdims=True)
    quats = jnp.asarray(quats, jnp.float32)
    # Matches bench.py's pnum-derived highest_level distribution.
    hl = jnp.asarray(rng.choice(4, size=(n,),
                                p=[0.5992, 0.1832, 0.0434, 0.1742]),
                     jnp.float32)
    shs_dcs = jnp.asarray(rng.normal(0, 0.8, (n, 4, 3)), jnp.float32)
    opac4 = jnp.asarray(rng.uniform(0.2, 0.95, (n, 4)), jnp.float32)
    rest = jnp.asarray(rng.normal(0, 0.05, (n, 15, 3)), jnp.float32)
    cam = look_at_camera([0.4, -0.3, -4.0], [0, 0, 0], [0, -1, 0],
                         fovx=1.1, fovy=0.7, width=1920, height=1080)
    cfg = RasterizeConfig(pair_capacity=args.cap, chunk=4096, backend="xla")

    def counts(m, s, q, o4, sd, re, h, clip):
        c2 = dataclasses.replace(cfg, clip_level_rects=clip)
        out = fov.rasterize_fov(m, s, q, o4, sd, re, h, cam,
                                gaze=jnp.array([0.5, 0.5], jnp.float32),
                                alpha=0.05, blending=True, config=c2)
        bn = out["binned"]
        return bn.num_pairs, bn.overflow

    for clip in (True, False):
        fn = jax.jit(lambda *a: counts(*a, clip))
        np_, ov = fn(means, scales, quats, opac4, shs_dcs, rest, hl)
        print(f"clip={clip}: pairs={int(np_)} overflow={int(ov)} "
              f"(cap={args.cap})")


if __name__ == "__main__":
    main()
