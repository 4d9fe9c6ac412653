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
import functools
import json
import os
import sys
import threading
import time

BASELINE_FPS = 702.12     # ours-Q avg
BASELINE_NAIVE = 871.46   # SM-FR avg
BASELINE_MMFR = 293.53    # MM-FR avg
GAZES = [(x, y) for y in (0.2, 0.5, 0.8) for x in (0.2, 0.5, 0.8)]

T_START = time.time()
HEADLINE = None           # set once the headline leg lands (watchdog re-emits)


def budget_left(args):
    return (time.time() - T_START) < args.budget_s


def arm_watchdog(deadline_s: float):
    """Hard exit shortly before the driver's external timeout: re-emit the
    headline as the final stdout line and leave with rc=0 (the round-4
    driver record was rc=124 with the aux legs starved — an incomplete
    bench must still be a *valid* bench). Daemon thread: a hung TPU call
    cannot block it."""
    def fire():
        left = deadline_s - (time.time() - T_START)
        if left > 0:
            time.sleep(left)
        if HEADLINE is not None:
            print(json.dumps(HEADLINE), flush=True)
        print("# watchdog: wall budget exhausted, exiting", file=sys.stderr,
              flush=True)
        os._exit(0)
    threading.Thread(target=fire, daemon=True).start()


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


GRAN_CAND = 524_288      # candidate-axis capacity granule
GRAN_KEPT = 393_216      # kept-axis capacity granule


def build_fov_render(sc, cam, args, naive=False):
    """Returns (render(gaze, caps), diag(gaze, caps), probe_caps).

    MEASURED capacity buckets, decoupled per axis: the binning pipeline is
    sized by two static capacities — the candidate axis (pair expansion:
    cum total incl. dummy rows) and the kept axis (post-cull pairs: sort +
    blend lanes). Off-center gazes keep ~45-75% of the center gaze's
    pairs, and the two axes shrink by DIFFERENT factors (round 3 coupled
    them multiplicatively, so most gazes fell back to the full bucket on
    candidate overflow). Each gaze now gets capacities = its own measured
    counts rounded up to a granule (bounding distinct compiles), checked
    by the overflow counter on the actual frame. The reference's harness
    likewise resizes its buffers to measured counts and keeps them
    (rasterize_points.cu resizeFunctional). caps=None uses the full probe
    capacities."""
    import jax
    import jax.numpy as jnp
    from fovsplat.ops import foveated as fov
    from fovsplat.ops.rasterize import RasterizeConfig

    def mkcfg(caps):
        cand_cap, kept_cap, drop = caps
        return RasterizeConfig(
            pair_capacity=cand_cap, backend=args.backend,
            pallas_fwd_only=True, pallas_interpret=args.interpret,
            pallas_chunk=args.blend_chunk,
            pallas_blend_batch=args.blend_batch,
            expand_chunk=args.expand_chunk, expand_batch=args.expand_batch,
            dummy_slack=0, compact_capacity=kept_cap,
            expand_drop_invalid=drop)

    probe_caps = (args.pair_capacity + args.dummy_slack,
                  args.compact_capacity, False)
    opac4 = jnp.asarray(sc["opacities4"])
    dcs = jnp.asarray(sc["shs_dcs"])
    if naive:
        # SM-FR (reference N7): one shared color/opacity per Gaussian,
        # levels only gate participation. The shared packing uses the
        # 48-row table layout (25% smaller expansion matmul) — the naive
        # baseline is structurally cheaper than ours, as in the
        # reference (871 vs 702 FPS).
        opac4 = opac4[:, :1]
        dcs = dcs[:, :1, :]

    if args.backend != "pallas":
        if naive:    # the XLA fallback keeps the 4-level layout
            opac4 = jnp.broadcast_to(opac4, (opac4.shape[0], 4))
            dcs = jnp.broadcast_to(dcs, (dcs.shape[0], 4, 3))
        cfg = mkcfg(probe_caps)
        fn = jax.jit(lambda gz, o4, dc: fov.rasterize_fov(
            jnp.asarray(sc["means"]), jnp.asarray(sc["scales"]),
            jnp.asarray(sc["rotations"]), o4, dc,
            jnp.asarray(sc["shs_rest"]), jnp.asarray(sc["highest_levels"]),
            cam, gaze=gz, alpha=0.05, blending=True,
            config=cfg)["render"])
        return (lambda gz, caps=None: fn(gz, opac4, dcs)), None, probe_caps

    # SoA fast path: pack once per model (the reference loads its composed
    # model once per FPS run too). All big arrays are jit ARGUMENTS —
    # closure captures become inline HLO constants and blow the remote
    # compile service's request-size limit.
    model = jax.jit(functools.partial(fov.pack_fov_model,
                                      shared_colors=naive))(
        jnp.asarray(sc["means"]), jnp.asarray(sc["scales"]),
        jnp.asarray(sc["rotations"]), opac4, dcs,
        jnp.asarray(sc["shs_rest"]), jnp.asarray(sc["highest_levels"]))
    fns = {}

    def get_fn(caps):
        caps = probe_caps if caps is None else caps
        if caps not in fns:
            c = mkcfg(caps)
            fns[caps] = jax.jit(lambda mdl, gz, c=c: fov.rasterize_fov_soa(
                mdl, cam, gaze=gz, alpha=0.05, blending=True, config=c))
        return fns[caps]

    def render(gz, caps=None):
        return get_fn(caps)(model, gz)["render"]

    def diag(gz, caps=None):
        return get_fn(caps)(model, gz)

    return render, diag, probe_caps


def _round_up(v, gran):
    return (int(v) + gran - 1) // gran * gran


def leg_fov(sc, cam, args, tag, naive=False, caps_hint=None):
    """caps_hint: gaze->caps map from a sibling leg (ours/naive share the
    same geometry and cull, so their measured counts match); each hinted
    shape is still VERIFIED (overflow==0) on the real frame before timing.
    Returns (fps, per_gaze, gaze_caps)."""
    import jax.numpy as jnp
    render, diag, probe_caps = build_fov_render(sc, cam, args, naive=naive)
    gaze_caps = {}
    if diag is not None and caps_hint:
        for gz in GAZES:
            caps = caps_hint.get(gz, probe_caps)
            o = diag(jnp.asarray(gz, jnp.float32), caps)
            gaze_caps[gz] = caps if int(_force(o["overflow"] * 1.0)) == 0 \
                else probe_caps
            print(f"# {tag}: gaze={gz} caps(hint)={gaze_caps[gz]}",
                  file=sys.stderr)
    elif diag is not None:
        # Per-gaze capacity probing with a BOUNDED compile count: one
        # diag frame per gaze at the full probe capacities (1 compile)
        # reads the exact candidate/kept counts; ONE extra probe shape
        # (full caps + dummy-free expansion) decides drop-mode viability
        # for every gaze (window-miss behavior depends on the pair
        # stream, not on the capacity bounds — the round-4 scheme
        # compiled an intermediate (probe, kb, True) shape per distinct
        # kb for the same information). Final per-gaze caps = measured
        # counts rounded up to granules, verified overflow==0 on the
        # real frame before timing.
        drop_info = {}
        for gz in GAZES:
            g = jnp.asarray(gz, jnp.float32)
            out = diag(g, None)
            kept = int(_force(out["num_pairs"] * 1.0))
            cand = int(_force(out["candidates"] * 1.0))
            ovf = int(_force(out["overflow"] * 1.0))
            assert ovf == 0, (gz, "probe-capacity overflow — raise "
                              "--pair-capacity/--compact-capacity")
            od = diag(g, (probe_caps[0], probe_caps[1], True))
            if int(_force(od["overflow"] * 1.0)) == 0:
                drop_info[gz] = int(_force(od["candidates"] * 1.0))
            gaze_caps[gz] = (kept, cand)
        for gz in GAZES:
            kept, cand = gaze_caps[gz]
            kb = min(_round_up(kept, GRAN_KEPT), probe_caps[1])
            if gz in drop_info:
                caps = (min(_round_up(drop_info[gz], GRAN_CAND),
                            probe_caps[0]), kb, True)
            else:
                caps = (min(_round_up(cand, GRAN_CAND), probe_caps[0]),
                        kb, False)
            o2 = diag(jnp.asarray(gz, jnp.float32), caps)
            if int(_force(o2["overflow"] * 1.0)) != 0:
                caps = probe_caps    # never time an overflowing shape
            gaze_caps[gz] = caps
            print(f"# {tag}: gaze={gz} kept={kept} cand={cand} "
                  f"caps={caps}", file=sys.stderr)
    fps, per_gaze = nine_gaze_fps(
        lambda gaze, gz: render(gaze, gaze_caps.get(gz)),
        cam, args.warmup, args.reps)
    return fps, per_gaze, gaze_caps


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

    def mkcfg(caps):
        return RasterizeConfig(
            pair_capacity=caps[0], dummy_slack=0, chunk=4096,
            backend=args.backend, pallas_chunk=args.blend_chunk,
            pallas_blend_batch=args.blend_batch, pallas_fwd_only=True,
            compact_capacity=caps[1], pallas_interpret=args.interpret)

    # One jit per level pass (the unrolled 4-model graph OOMs the remote
    # compile helper), with the MODEL AS A JIT ARGUMENT — a closure
    # capture inlines the 1.16M-row arrays as HLO constants, and that
    # request size is what SIGKILLed the round-3 compile helper. Each
    # (level, capacity) pair compiles once; capacities come from the
    # measured per-level counts (L0 owns only the gaze box and keeps a
    # small fraction of the shared capacity).
    probe_caps = (args.pair_capacity + args.dummy_slack,
                  args.compact_capacity)
    fns = {}

    # ONE compiled fn per (level, caps): always return the diag dict —
    # the extra scalar outputs are free and halve the compile count
    # (round 4 compiled separate diag=True/False variants).
    def get_fn(li, caps):
        key = (li, caps)
        if key not in fns:
            cfg = mkcfg(caps)
            fns[key] = jax.jit(lambda m, gz: emm.render_mmfr_level(
                m, cam, gz, 0.05, li, cfg, return_diag=True))
        return fns[key]

    # Per-LEVEL capacity sizing (round 5): ONE caps tuple per level =
    # the max measured counts over all 9 gazes, rounded up. The round-4
    # per-(gaze, level) tuples compiled ~6 extra pipeline shapes and the
    # MM-FR leg alone ate ~25 min of the budget; per-level max sizing
    # costs a few % FPS on off-center gazes and caps the compile count
    # at 4 probe-diag + <=4 sized-diag + 4 render.
    need = {li: [0, 0] for li in range(4)}
    for gz in GAZES:
        g = jnp.asarray(gz, jnp.float32)
        for li in range(4):
            _, d = get_fn(li, probe_caps)(models[li], g)
            kept = int(_force(d["num_pairs"] * 1.0))
            cand = int(_force(d["candidates"] * 1.0))
            assert int(_force(d["overflow"] * 1.0)) == 0, (gz, li)
            need[li][0] = max(need[li][0], cand)
            need[li][1] = max(need[li][1], kept)
    level_caps = {}
    gc = jnp.asarray((0.5, 0.5), jnp.float32)
    for li in range(4):
        # max(., 1): a level that owns no pairs at probe time must still
        # get one granule of capacity (caps of 0 are invalid shapes).
        caps = (min(_round_up(max(need[li][0], 1), 786_432),
                    probe_caps[0]),
                min(_round_up(max(need[li][1], 1), 524_288),
                    probe_caps[1]))
        _, d2 = get_fn(li, caps)(models[li], gc)
        if int(_force(d2["overflow"] * 1.0)) != 0:
            caps = probe_caps
        for gz in GAZES:
            level_caps[(gz, li)] = caps
    print(f"# mmfr: per-level caps="
          f"{[level_caps[((0.5, 0.5), li)] for li in range(4)]}",
          file=sys.stderr)

    def render(gaze, gz):
        total = None
        for li in range(4):
            c = get_fn(li, level_caps[(gz, li)])(models[li], gaze)[0]
            total = c if total is None else total + c
        return total

    return nine_gaze_fps(render, cam,
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
    # One-time random row permutation (same rationale as the fov legs):
    # invalid rows cluster in natural model order; scattering them lets
    # the dummy-free expansion hold its window property.
    perm = np.random.default_rng(12345).permutation(n)
    sc = {k: (v[perm] if getattr(v, "ndim", 0) and len(v) == n else v)
          for k, v in sc.items()}
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
    # Kept measured 2.99M at this shape; 3.15M bound = kept + ~5%.
    # Dummy-free expansion is OPT-IN (--train-drop): at this exact shape
    # it was measured to MISS 3.9% of pairs (window too sparse even
    # after the permutation — docs/ARCHITECTURE.md round-5 notes), so
    # probing it by default costs a full-step compile for a known
    # fallback.
    def mkstep(drop):
        cfg = loops.LoopConfig(raster=RasterizeConfig(
            pair_capacity=1 << 22, chunk=4096, backend=args.backend,
            compact_capacity=3_145_728, expand_drop_invalid=drop,
            pallas_chunk=256, pallas_interpret=args.interpret))
        return loops.make_photometric_step(cfg)

    step = mkstep(args.train_drop and args.backend == "pallas")
    st, aux = step(state, cam, gt, jnp.int32(0), jnp.float32(0.0))
    if args.train_drop and args.backend == "pallas" \
            and int(aux["overflow"]) != 0:
        print("# train: dummy-free expansion missed pairs, falling back",
              file=sys.stderr)
        step = mkstep(False)
        st, aux = step(state, cam, gt, jnp.int32(0), jnp.float32(0.0))
    loss0 = float(aux["loss"])
    assert int(aux["overflow"]) == 0
    # Kept pairs measured from the step itself (round-3 hardcoded the
    # foveated center-gaze 1.53M here, understating SOL ~2x — this shape
    # has no level cull and keeps ~2.99M).
    kept = float(aux["num_pairs"])
    reps = 10
    cur = st
    # Chained dispatch, ONE host read at the end: a per-rep
    # float(aux['loss']) paid a full ~30 ms tunnel RTT every step and
    # inflated the recorded step ~15% in rounds 1-3.
    t0 = time.perf_counter()
    for i in range(reps):
        cur, aux = step(cur, cam, gt, jnp.int32(i), jnp.float32(0.0))
    float(aux["loss"])
    dt = (time.perf_counter() - t0) / reps
    # Backward SOL model (docs/ARCHITECTURE.md "Speed-of-light budget"):
    # useful blend fwd+bwd flops ~= kept_pairs * PIX * ~90 VPU flops at
    # ~2 Tflop/s VPU, + gradient segment-sum + preprocess chain (small).
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
    # The f32 XLA oracle is deterministic in the (seeded) proxy scene —
    # cache it on disk so the driver run skips the multi-minute CPU
    # render. The fingerprint ties the cache to the exact scene tensors;
    # any proxy/camera change recomputes.
    fp = np.array([float(np.sum(np.asarray(sc[k], np.float64)))
                   for k in ("means", "scales", "opacities4", "shs_dcs")]
                  + [n, cam.width, cam.height], np.float64)
    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "artifacts", "parity_oracle_v1.npz")
    oracle = None
    if os.path.exists(cache):
        try:
            z = np.load(cache)
            if z["fp"].shape == fp.shape and np.allclose(z["fp"], fp):
                oracle = z["oracle"]
        except Exception:
            oracle = None
    if oracle is None:
        cpu = jax.devices("cpu")[0]
        with jax.default_device(cpu):
            cfg_x = RasterizeConfig(pair_capacity=1 << 20, chunk=4096,
                                    backend="xla", use_obb=True)
            oracle = np.asarray(jax.jit(lambda *a: fov.rasterize_fov(
                *a, cam, gaze=gaze, alpha=0.05, blending=True,
                config=cfg_x)["render"])(
                    *[jax.device_put(a, cpu) for a in fa]))
        try:
            os.makedirs(os.path.dirname(cache), exist_ok=True)
            np.savez_compressed(cache, oracle=oracle, fp=fp)
        except Exception as e:
            print(f"# parity oracle cache write failed: {e}",
                  file=sys.stderr)
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


def leg_1080p(sc, args, center_caps=None):
    """North-star resolution leg (BASELINE.json: foveated rays/s per chip
    at 1080p), center gaze. ONE compiled shape when the ours leg's
    measured center-gaze capacities are available (scaled by the pixel
    ratio + 15% headroom, verified by the overflow counter on the real
    frame — a 1080p-capacity pipeline compile costs ~5 min on the
    tunnel); falls back to probe + right-size otherwise."""
    import jax.numpy as jnp
    from fovsplat.data import proxy
    cam = proxy.proxy_camera(width=1920, height=1080)
    import copy
    a2 = copy.copy(args)
    # ~2x the 1237x822 pixel count: scale the probe capacities.
    a2.pair_capacity = 4_980_736
    a2.dummy_slack = 524_288
    a2.compact_capacity = 3_538_944
    render, diag, probe_caps = build_fov_render(sc, cam, a2)
    gz = (0.5, 0.5)
    g = jnp.asarray(gz, jnp.float32)
    caps = None
    if center_caps is not None and diag is not None:
        # MEASURED counts for this exact (deterministic) proxy scene at
        # the default args (round-5 on-chip: kept 2,027,822, candidates
        # 3,742,362) — the overflow check on the real frame falls back
        # to the probe path if the scene or args changed.
        caps = (min(_round_up(3_742_362, GRAN_CAND), probe_caps[0]),
                min(_round_up(2_027_822, GRAN_KEPT), probe_caps[1]),
                False)
        if int(_force(diag(g, caps)["overflow"] * 1.0)) != 0:
            caps = None             # measured default missed: fall back
    if caps is None and diag is not None:
        out = diag(g, None)
        kept = int(_force(out["num_pairs"] * 1.0))
        cand = int(_force(out["candidates"] * 1.0))
        assert int(_force(out["overflow"] * 1.0)) == 0
        caps = (min(_round_up(cand, GRAN_CAND), probe_caps[0]),
                min(_round_up(kept, GRAN_KEPT), probe_caps[1]), False)
        if int(_force(diag(g, caps)["overflow"] * 1.0)) != 0:
            caps = probe_caps
    print(f"# 1080p: caps={caps}", file=sys.stderr)
    _force(render(g, caps))
    for _ in range(args.warmup):
        out = render(g, caps)
    _force(out)
    reps = max(4, args.reps // 2)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = render(g, caps)
    _force(out)
    fps = reps / (time.perf_counter() - t0)
    return fps, cam


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
    # 20 reps per gaze: the timed loop is chained-dispatch with ONE host
    # read at the end, so the ~25 ms tunnel RTT amortizes to RTT/reps.
    # The reference times 5 reps x 35 views per gaze (175 frames); 20
    # chained frames per gaze is well within its harness envelope.
    ap.add_argument("--reps", type=int, default=20)
    ap.add_argument("--backend", default="pallas", choices=["pallas", "xla"])
    ap.add_argument("--interpret", action="store_true")
    ap.add_argument("--budget-s", type=float, default=2600.0,
                    help="wall-clock budget for STARTING aux legs. The "
                         "round-4 default (4200) exceeded the driver's "
                         "external timeout and the record came back "
                         "rc=124 with legs missing; the budget now leaves "
                         "room for the slowest leg to finish inside "
                         "--hard-s")
    ap.add_argument("--hard-s", type=float, default=3250.0,
                    help="absolute wall deadline: a watchdog re-emits the "
                         "headline and exits 0 (driver timeout appears "
                         "to be ~3600 s; rc=124 must never happen again)")
    ap.add_argument("--skip-aux", action="store_true")
    ap.add_argument("--train-drop", action="store_true",
                    help="probe dummy-free expansion for the train leg "
                         "(measured nonviable at the default shape; "
                         "costs an extra full-step compile)")
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
    # One-time random row permutation (order is an implementation detail
    # of the model file): culled/invalid rows cluster in natural model
    # order (components here, densification order in real PLYs), and
    # scattering them is what lets dense gazes run the dummy-free
    # expansion with zero window misses.
    import numpy as _np
    _perm = _np.random.default_rng(12345).permutation(
        sc["means"].shape[0])
    sc = {k: (v[_perm] if getattr(v, "ndim", 0) and
              len(v) == len(_perm) else v) for k, v in sc.items()}
    cam = proxy.proxy_camera()

    arm_watchdog(args.hard_s)

    # ---------------- headline (run first so a budget overrun can't
    # starve it; its line is REPRINTED last for the driver parse) --------
    global HEADLINE
    fps, per_gaze, ours_caps = leg_fov(sc, cam, args, "ours")
    headline = HEADLINE = {
        "metric": f"foveated FPS ours (9 gazes, {cam.width}x{cam.height}, "
                  f"{args.n} gaussians, {src}, 1 chip)",
        "value": round(fps, 2), "unit": "frames/s",
        "vs_baseline": round(fps / BASELINE_FPS, 4),
        "rays_per_s": round(cam.width * cam.height * fps),
        "per_gaze": [round(f, 2) for f in per_gaze],
    }
    emit(headline)

    if not args.skip_aux:
        # Aux order (round-5): train step (north-star backward SOL), then
        # the two baseline FPS rows the round-4 record was missing (naive
        # reuses the ours leg's verified per-gaze capacities — no probe
        # compiles), then 1080p, then parity (oracle disk-cached). Every
        # leg re-emits the headline so the driver's final-line parse
        # survives a mid-leg kill.
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
        # Keep the LAST stdout line the headline even if the process is
        # killed mid-aux (the driver parses the final JSON line).
        emit(headline)
        # ---- on-chip parity (cheap: the f32 oracle is disk-cached) ----
        try:
            if budget_left(args):
                p = leg_parity(args)
                emit({"metric": "on-chip parity PSNR (fused quantized vs "
                                "f32 XLA oracle, 150k proxy)",
                      "value": round(p, 2), "unit": "dB",
                      "vs_baseline": round(p / 40.0, 3)})
        except Exception as e:
            emit({"metric": "parity", "error": str(e)[:300]})
        emit(headline)
        # ---- 1080p (north-star resolution; 2 compiles) ----
        try:
            if budget_left(args):
                f_hd, cam_hd = leg_1080p(
                    sc, args, center_caps=ours_caps.get((0.5, 0.5)))
                emit({"metric": "foveated FPS ours (center gaze, "
                                f"{cam_hd.width}x{cam_hd.height}, "
                                f"{args.n} gaussians, 1 chip)",
                      "value": round(f_hd, 2), "unit": "frames/s",
                      "rays_per_s": round(
                          cam_hd.width * cam_hd.height * f_hd)})
        except Exception as e:
            emit({"metric": "1080p FPS", "error": str(e)[:300]})
        emit(headline)
        # ---- SM-FR (naive; reuses ours caps, no probe compiles) ----
        try:
            if budget_left(args):
                f_n, _, _ = leg_fov(sc, cam, args, "naive", naive=True,
                                    caps_hint=ours_caps)
                emit({"metric": "foveated FPS SM-FR naive (9 gazes)",
                      "value": round(f_n, 2), "unit": "frames/s",
                      "vs_baseline": round(f_n / BASELINE_NAIVE, 4)})
        except Exception as e:
            emit({"metric": "naive FPS", "error": str(e)[:300]})
        emit(headline)
        # ---- MM-FR (most compiles; runs LAST — the round-5 validation
        # run spent ~25 min here and starved the legs that followed) ----
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
