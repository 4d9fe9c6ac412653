"""Benchmark: rasterizer throughput on real TPU hardware.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Harness semantics mirror the reference FPS benchmark
(fov3dgs/render_compose_gazes_fps.py:25-73): warmups, then timed repetitions
of the rasterizer call only; value = frames/s. vs_baseline compares against
the reference's ours-Q foveated FPS on Mip360 bicycle (702.12,
fov3dgs/fps/ours-Q-9gazes/bicycle.txt) — resolution here is 1080p-class and
the cloud is synthetic bicycle-scale until real scene data is wired in.
"""

import argparse
import json
import sys
import time

BASELINE_FPS = 702.12


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_161_358)  # bicycle PS1 count
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--pair-capacity", type=int, default=1 << 22)
    ap.add_argument("--chunk", type=int, default=4096)
    ap.add_argument("--warmup", type=int, default=10)
    ap.add_argument("--reps", type=int, default=50)
    ap.add_argument("--mode", default="ps1", choices=["ps1", "fov"])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from fovsplat.data.cameras import look_at_camera
    from fovsplat.ops import rasterize as rast

    rng = np.random.default_rng(0)
    n = args.n
    means = rng.normal(0, 1.2, (n, 3)).astype(np.float32)
    # Calibrated so candidate pairs land in the few-million range at 1080p
    # (bicycle-like density), not tens of millions.
    scales = rng.uniform(0.002, 0.012, (n, 3)).astype(np.float32)
    quats = rng.normal(0, 1, (n, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=1, keepdims=True)
    opac = rng.uniform(0.2, 0.95, (n,)).astype(np.float32)
    colors = rng.uniform(0, 1, (n, 3)).astype(np.float32)

    cam = look_at_camera([0.4, -0.3, -4.0], [0, 0, 0], [0, -1, 0],
                         fovx=1.1, fovy=0.7, width=args.width,
                         height=args.height)
    cfg = rast.RasterizeConfig(pair_capacity=args.pair_capacity,
                               chunk=args.chunk)

    if args.mode == "fov":
        from fovsplat.ops import foveated as fov
        hl = rng.integers(0, 4, (n,)).astype(np.float32)
        shs_dcs = rng.normal(0, 0.8, (n, 4, 3)).astype(np.float32)
        opac4 = rng.uniform(0.2, 0.95, (n, 4)).astype(np.float32)
        rest = rng.normal(0, 0.05, (n, 15, 3)).astype(np.float32)
        gaze = jnp.array([0.5, 0.5], jnp.float32)

        def render(means, scales, quats):
            out = fov.rasterize_fov(
                means, scales, quats, jnp.asarray(opac4),
                jnp.asarray(shs_dcs), jnp.asarray(rest),
                jnp.asarray(hl), cam, gaze=gaze, alpha=0.05,
                blending=True, config=cfg)
            return out["render"]
    else:
        def render(means, scales, quats):
            out = rast.rasterize(means, scales, quats, jnp.asarray(opac),
                                 cam, colors=jnp.asarray(colors), config=cfg)
            return out["render"]

    fn = jax.jit(render)
    m = jnp.asarray(means)
    s = jnp.asarray(scales)
    q = jnp.asarray(quats)

    img = jax.block_until_ready(fn(m, s, q))
    assert img.shape == (args.height, args.width, 3)
    for _ in range(args.warmup):
        jax.block_until_ready(fn(m, s, q))
    # Sync every rep: the remote TPU backend does not reliably serialize
    # async dispatches, so trailing-sync timing under-reports wildly.
    t0 = time.perf_counter()
    for _ in range(args.reps):
        jax.block_until_ready(fn(m, s, q))
    dt = (time.perf_counter() - t0) / args.reps
    fps = 1.0 / dt
    rays_per_s = args.width * args.height * fps

    print(json.dumps({
        "metric": f"render FPS ({args.mode}, {args.width}x{args.height}, "
                  f"{n} gaussians, synthetic, 1 chip)",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / BASELINE_FPS, 4),
        "rays_per_s": rays_per_s,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
