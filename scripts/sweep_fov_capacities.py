"""Sweep the 9 bench gazes at both bench resolutions and report the pair
counts that size the fused fov path's static capacities:
  - candidates incl dummy pairs  -> pair_capacity + dummy_slack
  - invalid rows                 -> dummy_slack
  - kept pairs (post cull)       -> compact_capacity
Runs the real pallas fused path (generous caps) on the bicycle-scale
synthetic cloud used by bench.py / bench_fps_ninegaze / bench_fov_stages.
"""
import argparse
import sys

sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_161_358)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from fovsplat.data.cameras import look_at_camera
    from fovsplat.ops import foveated as fov
    from fovsplat.ops import projection
    from fovsplat.ops.rasterize import RasterizeConfig

    rng = np.random.default_rng(0)
    n = args.n
    means = jnp.asarray(rng.normal(0, 1.2, (n, 3)), jnp.float32)
    scales = jnp.asarray(rng.uniform(0.002, 0.012, (n, 3)), jnp.float32)
    quats = rng.normal(0, 1, (n, 4))
    quats /= np.linalg.norm(quats, axis=1, keepdims=True)
    quats = jnp.asarray(quats, jnp.float32)
    hl = jnp.asarray(rng.choice(4, size=(n,),
                                p=[0.5992, 0.1832, 0.0434, 0.1742]),
                     jnp.float32)
    shs_dcs = jnp.asarray(rng.normal(0, 0.8, (n, 4, 3)), jnp.float32)
    opac4 = jnp.asarray(rng.uniform(0.2, 0.95, (n, 4)), jnp.float32)
    rest = jnp.asarray(rng.normal(0, 0.05, (n, 15, 3)), jnp.float32)

    gazes = [(x, y) for y in (0.25, 0.5, 0.75) for x in (0.25, 0.5, 0.75)]

    for (w, h, fovy) in ((1237, 822, 0.76), (1920, 1080, 0.7)):
        cam = look_at_camera([0.4, -0.3, -4.0], [0, 0, 0], [0, -1, 0],
                             fovx=1.1, fovy=fovy, width=w, height=h)
        cfg = RasterizeConfig(pair_capacity=5 << 20, chunk=4096,
                              backend="pallas", pallas_chunk=256,
                              pallas_fwd_only=True)
        model = jax.jit(fov.pack_fov_model)(means, scales, quats, opac4,
                                            shs_dcs, rest, hl)
        n_invalid = int(jax.device_get(jnp.sum(~jax.jit(
            lambda m, s, q: projection.preprocess(m, s, q, cam).valid)(
            means, scales, quats))))

        @jax.jit
        def stats(m, g):
            out = fov.rasterize_fov_soa(m, cam, gaze=g, alpha=0.05,
                                        blending=True, config=cfg)
            return out["num_pairs"], out["overflow"]

        kept_max = 0
        for gz in gazes:
            kp, ov = jax.device_get(stats(
                model, jnp.asarray(gz, jnp.float32)))
            assert int(ov) == 0, (gz, int(ov))
            print(f"{w}x{h} gaze={gz}: kept={int(kp)}", flush=True)
            kept_max = max(kept_max, int(kp))
        print(f"{w}x{h}: invalid_rows={n_invalid} kept_max={kept_max}",
              flush=True)


if __name__ == "__main__":
    main()
