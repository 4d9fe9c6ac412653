"""Benchmark: rasterizer throughput + train step + on-chip parity on real
TPU hardware.

Prints one JSON line per measurement; the HEADLINE (foveated "ours" FPS,
9 gazes, reference eval resolution 1237x822, bicycle-proxy scene) is the
FINAL line. vs_baseline compares against the reference's ours-Q foveated
FPS on Mip360 bicycle (702.12, fov3dgs/fps/ours-Q-9gazes/bicycle.txt),
measured by the same harness shape (9 gazes, warmups, timed reps of the
rasterizer call; fov3dgs/render_compose_gazes_fps.py:25-73).

The scene is the calibrated bicycle proxy (fovsplat/data/proxy.py):
clustered centers, long-tail scales, pnum-ladder level fractions,
1.53M kept pairs at the center gaze — not the round-1 uniform saturated
cloud. Every rep forces a host read (the remote TPU backend does not
reliably serialize on block_until_ready).

Aux lines (skipped once the wall-clock budget is spent, so the headline
always lands): SM-FR (naive) FPS, MM-FR FPS, 1080p FPS, full train step
(fwd+bwd+Adam at eval resolution) with a backward %-of-SOL estimate
(model in docs/ARCHITECTURE.md), and the fused-vs-f32-oracle parity PSNR.
"""

import argparse
import json
import sys
import time

BASELINE_FPS = 702.12     # ours-Q avg
BASELINE_NAIVE = 871.46   # SM-FR avg
BASELINE_MMFR = 293.53    # MM-FR avg
GAZES = [(x, y) for y in (0.2, 0.5, 0.8) for x in (0.2, 0.5, 0.8)]

T_START = time.time()


def budget_left(args):
    return (time.time() - T_START) < args.budget_s


def emit(obj):
    print(json.dumps(obj), flush=True)


def _force(x):
    import numpy as np
    import jax
    return float(np.asarray(jax.device_get(x.ravel()[0])))


def nine_gaze_fps(render, cam, warmups, reps, log=lambda *a: None):
    """render(gaze (2,) f32, gz_tuple) -> image; reference 9-gaze harness,
    chained dispatch with one host read per rep batch to amortize the
    tunnel RTT."""
    import numpy as np
    import jax.numpy as jnp
    per_gaze = []
    for gz in GAZES:
        gaze = jnp.asarray(gz, jnp.float32)
        _force(render(gaze, gz))
        for _ in range(warmups):
            out = render(gaze, gz)
        _force(out)
        t0 = time.perf_counter()
        for _ in range(reps):
            out = render(gaze, gz)
        _force(out)
        per_gaze.append(reps / (time.perf_counter() - t0))
        log(f"# gaze={gz} fps={per_gaze[-1]:.2f}")
    return float(np.mean(per_gaze)), per_gaze


def build_fov_render(sc, cam, args, naive=False):
    """Returns (render(gaze, bucket), diag(gaze), n_buckets).

    Adaptive capacity buckets: the whole binning pipeline is sized by
    STATIC capacities, but off-center gazes keep ~45-75% of the center
    gaze's pairs (level culling concentrates detail at the gaze) — the
    sort/expand cost is linear in capacity, so each gaze picks the
    smallest bucket its measured counts fit (the reference's harness
    likewise resizes its buffers per frame, rasterize_points.cu
    resizeFunctional). Bucket choice comes from an untimed diagnostic
    frame per gaze; every timed frame's overflow counter is asserted 0."""
    import jax
    import jax.numpy as jnp
    from fovsplat.ops import foveated as fov
    from fovsplat.ops.rasterize import RasterizeConfig

    def mkcfg(f):
        r = lambda v: (int(v * f) + 8191) // 8192 * 8192
        return RasterizeConfig(
            pair_capacity=r(args.pair_capacity), backend=args.backend,
            pallas_fwd_only=True, pallas_interpret=args.interpret,
            pallas_chunk=args.blend_chunk,
            pallas_blend_batch=args.blend_batch,
            expand_chunk=args.expand_chunk, expand_batch=args.expand_batch,
            dummy_slack=args.dummy_slack,
            compact_capacity=r(args.compact_capacity))

    cfgs = [mkcfg(1.0), mkcfg(0.78), mkcfg(0.58)]
    opac4 = jnp.asarray(sc["opacities4"])
    dcs = jnp.asarray(sc["shs_dcs"])
    if naive:
        # SM-FR (reference N7): one shared color/opacity per Gaussian,
        # levels only gate participation — broadcast per-level arrays.
        opac4 = jnp.broadcast_to(opac4[:, :1], opac4.shape)
        dcs = jnp.broadcast_to(dcs[:, :1, :], dcs.shape)

    if args.backend != "pallas":
        fn = jax.jit(lambda gz, o4, dc: fov.rasterize_fov(
            jnp.asarray(sc["means"]), jnp.asarray(sc["scales"]),
            jnp.asarray(sc["rotations"]), o4, dc,
            jnp.asarray(sc["shs_rest"]), jnp.asarray(sc["highest_levels"]),
            cam, gaze=gz, alpha=0.05, blending=True,
            config=cfgs[0])["render"])
        return (lambda gz, bucket=0: fn(gz, opac4, dcs)), None, 1

    # SoA fast path: pack once per model (the reference loads its composed
    # model once per FPS run too). All big arrays are jit ARGUMENTS —
    # closure captures become inline HLO constants and blow the remote
    # compile service's request-size limit.
    model = jax.jit(fov.pack_fov_model)(
        jnp.asarray(sc["means"]), jnp.asarray(sc["scales"]),
        jnp.asarray(sc["rotations"]), opac4, dcs,
        jnp.asarray(sc["shs_rest"]), jnp.asarray(sc["highest_levels"]))
    fns = [jax.jit(lambda mdl, gz, c=c: fov.rasterize_fov_soa(
        mdl, cam, gaze=gz, alpha=0.05, blending=True,
        config=c)) for c in cfgs]

    def render(gz, bucket=0):
        return fns[bucket](model, gz)["render"]

    def diag(gz, bucket=0):
        return fns[bucket](model, gz)

    return render, diag, len(cfgs)


def leg_fov(sc, cam, args, tag, naive=False):
    import jax.numpy as jnp
    render, diag, n_buckets = build_fov_render(sc, cam, args, naive=naive)
    buckets = {}
    if diag is not None:
        # Untimed diagnostic frame per gaze: record kept pairs at the full
        # bucket, then pick the smallest bucket with >=12% headroom on
        # BOTH the kept (compact) and candidate (pair) capacities and
        # re-verify its overflow counter.
        for gz in GAZES:
            g = jnp.asarray(gz, jnp.float32)
            out = diag(g, 0)
            kept = int(_force(out["num_pairs"] * 1.0))
            ovf = int(_force(out["overflow"] * 1.0))
            assert ovf == 0, (gz, "full-bucket overflow — raise "
                              "--pair-capacity/--compact-capacity")
            choice = 0
            for b, f in ((2, 0.58), (1, 0.78)):
                if kept * 1.12 <= args.compact_capacity * f:
                    o2 = diag(g, b)
                    if int(_force(o2["overflow"] * 1.0)) == 0:
                        choice = b
                        break
            buckets[gz] = choice
            print(f"# {tag}: gaze={gz} kept={kept} bucket={choice}",
                  file=sys.stderr)
    fps, per_gaze = nine_gaze_fps(
        lambda gaze, gz: render(gaze, buckets.get(gz, 0)),
        cam, args.warmup, args.reps)
    return fps, per_gaze


def leg_mmfr(sc, cam, args):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from fovsplat.eval import mmfr as emm
    from fovsplat.ops.rasterize import RasterizeConfig
    n = sc["means"].shape[0]
    # Per-level models: level li keeps Gaussians with hl >= li (the
    # reference's MM models are independently pruned to the same pnum
    # counts; the pass structure — 4 full binning+blend passes per frame —
    # is the cost being measured).
    models = []
    hl = sc["highest_levels"]
    for li in range(4):
        keep = hl >= li
        colors = np.maximum(0.282095 * sc["shs_dcs"][:, li, :] + 0.5, 0.0)
        models.append(dict(
            xyz=jnp.asarray(sc["means"]), scaling=jnp.asarray(sc["scales"]),
            rotation=jnp.asarray(sc["rotations"]),
            opacity=jnp.asarray(sc["opacities4"][:, li] * keep),
            colors=jnp.asarray(np.minimum(colors, 1.0))))
    cfg = RasterizeConfig(pair_capacity=args.pair_capacity, chunk=4096,
                          backend=args.backend, pallas_chunk=args.blend_chunk,
                          pallas_fwd_only=True,
                          pallas_interpret=args.interpret)
    # One jit per level pass: the unrolled 4-model graph can OOM the
    # remote compile helper (SIGKILL'd in one run).
    fns = [jax.jit(lambda gz, m=m, li=li: emm.render_mmfr_level(
        m, cam, gz, 0.05, li, cfg)) for li, m in enumerate(models)]

    def render(gaze):
        total = fns[0](gaze)
        for f in fns[1:]:
            total = total + f(gaze)
        return total

    return nine_gaze_fps(lambda gaze, gz: render(gaze), cam,
                         max(1, args.warmup // 2), max(2, args.reps // 2))


def leg_train_step(args):
    """Full photometric train step (render fwd+bwd + Adam) at proxy scale,
    eval-style resolution — the reference's eff_finetune loop shape."""
    import jax.numpy as jnp
    import numpy as np
    from fovsplat.data import proxy
    from fovsplat.models import state as S
    from fovsplat.models.gaussians import GaussianParams
    from fovsplat.ops.rasterize import RasterizeConfig
    from fovsplat.train import loops

    sc = proxy.bicycle_proxy(n=args.n)
    n = args.n
    rng = np.random.default_rng(1)
    params = GaussianParams(
        xyz=jnp.asarray(sc["means"]),
        features_dc=jnp.asarray(sc["shs_dcs"][:, 0:1, :]),
        features_rest=jnp.asarray(sc["shs_rest"]),
        scaling=jnp.asarray(np.log(np.maximum(sc["scales"], 1e-9))),
        rotation=jnp.asarray(sc["rotations"]),
        opacity=jnp.asarray(np.log(sc["opacity"] / (1 - sc["opacity"]))
                            [:, None]))
    state = S.from_params(params)
    cam = proxy.proxy_camera()
    gt = jnp.asarray(rng.uniform(0, 1, (cam.height, cam.width, 3)),
                     jnp.float32)
    # Kept pairs measured 2.99M at this shape (no level cull): bound the
    # compacted buffer so the train sort + CAP-sized backward ops run at
    # ~3.4M lanes instead of 5.36M (overflow asserted 0 below).
    cfg = loops.LoopConfig(raster=RasterizeConfig(
        pair_capacity=1 << 22, chunk=4096, backend=args.backend,
        compact_capacity=3_407_872,
        pallas_chunk=256, pallas_interpret=args.interpret))
    step = loops.make_photometric_step(cfg)
    st, aux = step(state, cam, gt, jnp.int32(0), jnp.float32(0.0))
    loss0 = float(aux["loss"])
    assert int(aux["overflow"]) == 0
    reps = 10
    cur = st
    t0 = time.perf_counter()
    for i in range(reps):
        cur, aux = step(cur, cam, gt, jnp.int32(i), jnp.float32(0.0))
        float(aux["loss"])
    dt = (time.perf_counter() - t0) / reps
    # Backward SOL model (docs/ARCHITECTURE.md "Speed-of-light budget"):
    # useful blend fwd+bwd flops ~= kept_pairs * PIX * ~90 VPU flops at
    # ~2 Tflop/s VPU, + gradient segment-sum + preprocess chain (small).
    kept = 1.53e6
    useful_s = kept * 256 * 90 / 2.0e12
    return dt, loss0, useful_s / dt


def leg_parity(args):
    """Fused quantized path (TPU) vs the f32 XLA oracle (CPU), small proxy."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from fovsplat.data import proxy
    from fovsplat.ops import foveated as fov
    from fovsplat.ops.rasterize import RasterizeConfig

    n = 150_000
    sc = proxy.bicycle_proxy(n=n)
    cam = proxy.proxy_camera(width=656, height=528)
    gaze = jnp.array([0.5, 0.5], jnp.float32)
    fa = tuple(jnp.asarray(sc[k]) for k in
               ("means", "scales", "rotations", "opacities4", "shs_dcs",
                "shs_rest", "highest_levels"))
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        cfg_x = RasterizeConfig(pair_capacity=1 << 20, chunk=4096,
                                backend="xla", use_obb=True)
        oracle = np.asarray(jax.jit(lambda *a: fov.rasterize_fov(
            *a, cam, gaze=gaze, alpha=0.05, blending=True,
            config=cfg_x)["render"])(
                *[jax.device_put(a, cpu) for a in fa]))
    cfg_p = RasterizeConfig(pair_capacity=1 << 20, backend=args.backend,
                            pallas_fwd_only=True, compact_capacity=1 << 20,
                            pallas_interpret=args.interpret,
                            dummy_slack=n + 8192)
    img = np.asarray(jax.jit(lambda *a: fov.rasterize_fov(
        *a, cam, gaze=gaze, alpha=0.05, blending=True,
        config=cfg_p)["render"])(*fa))
    mse = float(np.mean((img.astype(np.float64)
                         - oracle.astype(np.float64)) ** 2))
    return 99.0 if mse == 0 else -10.0 * np.log10(mse)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_161_358)  # bicycle PS1 count
    # Proxy scene at 1237x822 (measured, scripts/calibrate_proxy.py):
    # candidates after level clip 2.24M, invalid rows 489k, kept 1.53M at
    # the center gaze. Headroom ~11/7/15%.
    ap.add_argument("--pair-capacity", type=int, default=2_490_368)
    ap.add_argument("--dummy-slack", type=int, default=524_288)
    ap.add_argument("--compact-capacity", type=int, default=1_769_472)
    ap.add_argument("--blend-chunk", type=int, default=256)
    ap.add_argument("--blend-batch", type=int, default=8)
    ap.add_argument("--expand-chunk", type=int, default=512)
    ap.add_argument("--expand-batch", type=int, default=16)
    ap.add_argument("--warmup", type=int, default=3)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--backend", default="pallas", choices=["pallas", "xla"])
    ap.add_argument("--interpret", action="store_true")
    ap.add_argument("--budget-s", type=float, default=1500.0,
                    help="wall-clock budget for AUX legs; the headline "
                         "always runs")
    ap.add_argument("--skip-aux", action="store_true")
    ap.add_argument("--ply", default=None,
                    help="real composed-model PLY replaces the proxy scene")
    args = ap.parse_args()

    from fovsplat.data import proxy

    if args.ply is not None:
        from fovsplat.models import gaussians as G
        import numpy as np
        params, extras = G.load_ply(args.ply)
        n = params.xyz.shape[0]
        nl = 4
        sc = {
            "means": params.xyz, "scales": params.get_scaling(),
            "rotations": params.get_rotation(),
            "opacity": params.get_opacity(),
            "opacities4": np.broadcast_to(
                np.asarray(params.get_opacity())[:, None], (n, nl)),
            "shs_dcs": np.broadcast_to(
                np.asarray(params.features_dc[:, 0:1, :]), (n, nl, 3)),
            "shs_rest": params.features_rest,
            "highest_levels": np.asarray(extras.get(
                "ecc_thresh", np.full((n,), nl - 1.0, np.float32))),
        }
        src = "real scene"
    else:
        sc = proxy.bicycle_proxy(n=args.n)
        src = "bicycle proxy"
    cam = proxy.proxy_camera()

    # ---------------- headline (run first so a budget overrun can't
    # starve it; its line is REPRINTED last for the driver parse) --------
    fps, per_gaze = leg_fov(sc, cam, args, "ours")
    headline = {
        "metric": f"foveated FPS ours (9 gazes, {cam.width}x{cam.height}, "
                  f"{args.n} gaussians, {src}, 1 chip)",
        "value": round(fps, 2), "unit": "frames/s",
        "vs_baseline": round(fps / BASELINE_FPS, 4),
        "rays_per_s": round(cam.width * cam.height * fps),
        "per_gaze": [round(f, 2) for f in per_gaze],
    }
    emit(headline)

    if not args.skip_aux:
        # Aux order: train-step and parity FIRST — they are the
        # BASELINE.json north-star legs (backward SOL, allclose parity)
        # and were starved by the budget behind the FPS baselines in
        # rounds 1-2 (round-2 verdict item 2). The naive/MM-FR baseline
        # rows run last.
        # ---- train step ----
        try:
            if budget_left(args):
                dt, loss0, sol = leg_train_step(args)
                emit({"metric": "train step fwd+bwd+Adam "
                                f"({cam.width}x{cam.height}, {args.n} "
                                "gaussians, ps1 f32 path)",
                      "value": round(dt * 1e3, 1), "unit": "ms",
                      "steps_per_s": round(1.0 / dt, 2),
                      "backward_sol_pct": round(100 * sol, 1),
                      "loss0": round(loss0, 4)})
        except Exception as e:
            emit({"metric": "train step", "error": str(e)[:300]})
        # ---- on-chip parity ----
        try:
            if budget_left(args):
                p = leg_parity(args)
                emit({"metric": "on-chip parity PSNR (fused quantized vs "
                                "f32 XLA oracle, 150k proxy)",
                      "value": round(p, 2), "unit": "dB",
                      "vs_baseline": round(p / 40.0, 3)})
        except Exception as e:
            emit({"metric": "parity", "error": str(e)[:300]})
        # ---- SM-FR (naive) ----
        try:
            if budget_left(args):
                f_n, _ = leg_fov(sc, cam, args, "naive", naive=True)
                emit({"metric": "foveated FPS SM-FR naive (9 gazes)",
                      "value": round(f_n, 2), "unit": "frames/s",
                      "vs_baseline": round(f_n / BASELINE_NAIVE, 4)})
        except Exception as e:
            emit({"metric": "naive FPS", "error": str(e)[:300]})
        # ---- MM-FR ----
        try:
            if budget_left(args):
                f_m, _ = leg_mmfr(sc, cam, args)
                emit({"metric": "foveated FPS MM-FR (9 gazes, 4 passes)",
                      "value": round(f_m, 2), "unit": "frames/s",
                      "vs_baseline": round(f_m / BASELINE_MMFR, 4)})
        except Exception as e:
            emit({"metric": "mmfr FPS", "error": str(e)[:300]})

    emit(headline)     # final line = the driver-parsed headline
    return 0


if __name__ == "__main__":
    sys.exit(main())
