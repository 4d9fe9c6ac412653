"""Foveated FPS benchmark — the reference's compose_gazes harness.

Parity with fov3dgs/render_compose_gazes_fps.py:25-121: a 3x3 grid of gazes
(0.2/0.5/0.8 in each axis), 10 warmups per gaze, 5 timed repetitions per
view, timing the rasterizer call only (device-time via block_until_ready —
the reference brackets with CUDA events). Also covers the SM-FR
(_naive) and MM-FR (_mmfr) harness variants via `mode`.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from fovsplat.ops import foveated as fov
from fovsplat.ops import rasterize as rast

GAZES = [(x, y) for y in (0.2, 0.5, 0.8) for x in (0.2, 0.5, 0.8)]


def make_fov_render(params, composed, config, fov_cfg=None, alpha=0.05,
                    blending=True, mode="ours"):
    """Returns jitted render(camera, gaze) for the composed model.

    mode: "ours" (per-level DC/opacity) or "naive" (SM-FR: shared color
    and opacity; levels only gate participation). The MM-FR baseline
    takes 4 single-level models instead — build its render function with
    make_mmfr_render and feed it to the same fps_benchmark harness.
    """
    from fovsplat.ops.foveation import FoveationConfig
    fov_cfg = fov_cfg or FoveationConfig()
    p = params
    live = jnp.asarray(composed.live)
    hl = jnp.asarray(composed.highest_levels)

    if mode == "ours":
        opac = jnp.asarray(composed.opacities)
        dcs = jnp.asarray(composed.shs_dcs)

        if config.backend == "pallas" and config.pallas_fused_expand:
            # SoA fast path; the live mask folds into highest_levels
            # (hl = -1 => level < hl+1 never holds => fully culled).
            model = fov.pack_fov_model(
                p.xyz, p.get_scaling(), p.get_rotation(), opac, dcs,
                p.features_rest, jnp.where(live, hl, -1.0))

            def render(camera, gaze):
                return fov.rasterize_fov_soa(
                    model, camera, gaze=gaze, alpha=alpha,
                    blending=blending, config=config,
                    fov_cfg=fov_cfg)["render"]
        else:
            def render(camera, gaze):
                return fov.rasterize_fov(
                    p.xyz, p.get_scaling(), p.get_rotation(), opac, dcs,
                    p.features_rest, hl, camera, gaze=gaze, alpha=alpha,
                    blending=blending, config=config, fov_cfg=fov_cfg,
                    live_mask=live)["render"]
    else:  # naive SM-FR: one shared color/opacity, levels only gate
        if config.backend == "pallas" and config.pallas_fused_expand:
            # Shared-color SoA packing: 48-row table layout (reference
            # N7's structural advantage — see pack_fov_model).
            model = fov.pack_fov_model(
                p.xyz, p.get_scaling(), p.get_rotation(),
                p.get_opacity()[:, None], p.features_dc[:, 0:1, :],
                p.features_rest, jnp.where(live, hl, -1.0),
                shared_colors=True)

            def render(camera, gaze):
                return fov.rasterize_fov_soa(
                    model, camera, gaze=gaze, alpha=alpha,
                    blending=blending, config=config,
                    fov_cfg=fov_cfg)["render"]
        else:
            def render(camera, gaze):
                return fov.rasterize_fov(
                    p.xyz, p.get_scaling(), p.get_rotation(), None,
                    None, p.features_rest, hl, camera, gaze=gaze,
                    alpha=alpha, blending=blending, config=config,
                    fov_cfg=fov_cfg, live_mask=live,
                    colors_override=jnp.broadcast_to(
                        fov.compute_fov_colors(
                            p.xyz, p.features_rest,
                            jnp.repeat(p.features_dc, fov_cfg.fov_num,
                                       axis=1),
                            camera.cam_center)[:, :1, :],
                        (p.num_points, fov_cfg.fov_num, 3)),
                    opacity_shared=p.get_opacity())["render"]

    return jax.jit(render)


def make_mmfr_render(models, config, fov_cfg=None, alpha=0.05):
    """Jitted render(camera, gaze) for the MM-FR baseline (reference N8 +
    gaussian_renderer_fov_mmfr/__init__.py:75-162): four single-level
    models, one rasterizer pass per level restricted to that level's
    tiles, images summed. `models`: list of 4 dicts with activated
    xyz/scaling/rotation/opacity/colors (eval/mmfr.render_mmfr format;
    train/multimodel.mm_render_models converts TrainerStates).

    Feed the result to fps_benchmark — the reference benches MM-FR with
    the same 9-gaze harness (render_compose_gazes_fps_mmfr.py)."""
    from fovsplat.eval import mmfr as emm
    from fovsplat.ops.foveation import FoveationConfig
    fov_cfg = fov_cfg or FoveationConfig()

    def render(camera, gaze):
        return emm.render_mmfr(models, camera, gaze, alpha, config,
                               fov_cfg=fov_cfg)

    return jax.jit(render)


def mmfr_models_from_composed(params, composed, camera_center=None,
                              sh_degree: int = 3):
    """Derive 4 single-level model dicts from a composed "ours" model:
    level li keeps Gaussians with highest_level >= li and uses their
    level-li DC/opacity. A stand-in when independently-pruned
    LightGaussian models (train/multimodel.generate_mm_models) are not on
    disk — the pass structure (and hence the FPS cost profile, the point
    of the MM-FR baseline) is identical; colors are evaluated per view
    inside render_mmfr's caller, so DC-only colors are used here."""
    from fovsplat.ops import sh as sh_mod
    live = jnp.asarray(composed.live)
    hl = jnp.asarray(composed.highest_levels)
    L = composed.opacities.shape[1]
    models = []
    for li in range(L):
        keep = live & (hl >= li)
        opac = jnp.where(keep, composed.opacities[:, li], 0.0)
        colors = jnp.maximum(
            sh_mod.SH_C0 * composed.shs_dcs[:, li, :] + 0.5, 0.0)
        models.append({
            "xyz": params.xyz, "scaling": params.get_scaling(),
            "rotation": params.get_rotation(),
            "opacity": opac, "colors": colors,
        })
    return models


def fps_benchmark(render_fn, cameras, gazes=GAZES, warmups: int = 10,
                  reps: int = 5, log=print) -> dict:
    """render_fn(camera, gaze (2,) f32) -> image. Returns per-gaze FPS means
    + overall average (the reference's .txt layout)."""
    def force(x):
        # A host read per rep: block_until_ready does not serialize under
        # the remote-TPU backend (memory: timing pitfall).
        return float(np.asarray(jax.device_get(x.ravel()[0])))

    per_gaze = []
    for gz in gazes:
        gaze = jnp.asarray(gz, jnp.float32)
        force(render_fn(cameras[0], gaze))
        for _ in range(warmups):
            force(render_fn(cameras[0], gaze))
        times = []
        for cam in cameras:
            t0 = time.perf_counter()
            for _ in range(reps):
                force(render_fn(cam, gaze))
            times.append((time.perf_counter() - t0) / reps)
        fps = 1.0 / float(np.mean(times))
        per_gaze.append(fps)
        log(f"[fps] gaze={gz} fps={fps:.1f}")
    return {"per_gaze": per_gaze, "avg": float(np.mean(per_gaze))}
