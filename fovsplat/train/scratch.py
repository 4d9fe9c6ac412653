"""From-scratch 3DGS training with densification.

Counterpart of LightGaussian/train_densify_prune.py (and the stock Inria
trainer it extends): photometric loss, clone/split densification every 100
iters in [500, 15000), opacity resets every 3000, optional
global-significance prune rounds (LightGaussian, at 16k/24k by default),
progressive SH degree (oneupSHdegree every 1000 iters).
"""

from __future__ import annotations

import dataclasses
import random
from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from fovsplat.models import densify as D
from fovsplat.models import state as S
from fovsplat.ops import rasterize as rast
from fovsplat.train import losses, loops, optim


@dataclasses.dataclass(frozen=True)
class ScratchConfig:
    iterations: int = 30_000
    densify_from: int = 500
    densify_until: int = 15_000
    densify_every: int = 100
    densify_grad_threshold: float = 2e-4
    opacity_reset_every: int = 3_000
    percent_dense: float = 0.01
    sh_up_every: int = 1_000
    prune_iterations: tuple = ()          # LightGaussian: (16_000, 24_000)
    prune_percent: float = 0.1
    prune_decay: float = 0.6
    v_pow: float = 0.1
    densify_budget: int = 16384


def make_scratch_step(cfg: loops.LoopConfig, sh_degree: int):
    def step(state: S.TrainerState, dstats: D.DensifyStats, camera, gt, it):
        offset0 = jnp.zeros((state.capacity, 2), jnp.float32)

        def objective(params, offset):
            st = dataclasses.replace(state, params=params)
            p = st.params
            out = rast.rasterize(p.xyz, p.get_scaling(), p.get_rotation(),
                                 p.get_opacity(), camera,
                                 shs=p.get_features(), sh_degree=sh_degree,
                                 config=cfg.raster, live_mask=st.live,
                                 mean2d_offset=offset)
            loss = losses.photometric_loss(out["render"], gt,
                                           cfg.lambda_dssim)
            return loss, out["radii"]

        (loss, radii), (grads, g_off) = jax.value_and_grad(
            objective, argnums=(0, 1), has_aux=True)(state.params, offset0)
        grads, n_bad = loops._mask_dead_grads(grads, state.live)
        lrs = optim.learning_rates(state.params, it, cfg.optim,
                                   cfg.spatial_lr_scale)
        params, opt = optim.apply_updates(state.params, grads, state.opt,
                                          lrs, cfg.optim)
        dstats = D.accumulate(dstats, g_off, radii, camera.width,
                              camera.height)
        return (dataclasses.replace(state, params=params, opt=opt), dstats,
                {"loss": loss, "nonfinite": n_bad})

    return jax.jit(step)


def v_importance_score(state: S.TrainerState, gs_count, important_score,
                       v_pow: float = 0.1):
    """LightGaussian calculate_v_imp_score (prune.py:112-128): importance *
    (volume / 90th-percentile-volume)^v_pow."""
    scale = state.params.get_scaling()
    volume = jnp.prod(scale, axis=1)
    live_vol = jnp.where(state.live, volume, 0.0)
    sorted_v = jnp.sort(live_vol)
    n_live = jnp.sum(state.live)
    idx90 = (state.capacity - n_live
             + (0.9 * n_live.astype(jnp.float32)).astype(jnp.int32))
    v90 = sorted_v[jnp.minimum(idx90, state.capacity - 1)]
    v_norm = volume / jnp.maximum(v90, 1e-12)
    return jnp.power(jnp.maximum(v_norm, 1e-12), v_pow) * important_score


def global_significance_scores(state: S.TrainerState, views, cfg: loops.LoopConfig):
    """LightGaussian prune_list (prune.py:133-157): accumulate per-Gaussian
    count and opacity-importance over all training views via the counting
    rasterizer."""
    from fovsplat.ops import stats as stats_ops

    @jax.jit
    def one(state, camera):
        p = state.params
        out = stats_ops.rasterize_stats(
            p.xyz, p.get_scaling(), p.get_rotation(), p.get_opacity(),
            camera, shs=p.get_features(), sh_degree=cfg.sh_degree,
            mode="count_opacity", config=cfg.raster, live_mask=state.live)
        return out["gs_count"], out["contribs"]

    gs_count = jnp.zeros(state.capacity, jnp.int32)
    imp = jnp.zeros(state.capacity, jnp.float32)
    for v in views:
        c, s = one(state, v.camera)
        gs_count = gs_count + c
        imp = imp + s
    return gs_count, imp


def lightgaussian_prune(state: S.TrainerState, views, cfg: loops.LoopConfig,
                        percent: float, prune_type: str = "v_important_score",
                        v_pow: float = 0.1) -> S.TrainerState:
    """prune_finetune.py:214-243 percentile prune by the chosen score."""
    gs_count, imp = global_significance_scores(state, views, cfg)
    if prune_type == "important_score":
        score = imp
    elif prune_type == "v_important_score":
        score = v_importance_score(state, gs_count, imp, v_pow)
    elif prune_type == "count":
        score = gs_count.astype(jnp.float32)
    elif prune_type == "opacity":
        score = jax.nn.sigmoid(state.params.opacity[:, 0])
    else:
        raise ValueError(prune_type)
    return S.metric_prune(state, score, percent)


def train_scratch(state: S.TrainerState, train_views: Sequence,
                  cfg: loops.LoopConfig, scfg: ScratchConfig = ScratchConfig(),
                  scene_extent: float = 1.0, start_iter: int = 0,
                  log: Callable = print, seed: int = 0,
                  log_every: int = 500) -> S.TrainerState:
    dstats = D.init_stats(state.capacity)
    rng = random.Random(seed)
    stack = []
    key = jax.random.PRNGKey(seed)
    active_sh = 0
    step_fn = make_scratch_step(cfg, active_sh)
    max_sh = state.params.sh_degree

    for it in range(start_iter + 1, start_iter + scfg.iterations + 1):
        if it % scfg.sh_up_every == 0 and active_sh < max_sh:
            active_sh += 1
            step_fn = make_scratch_step(cfg, active_sh)
        if not stack:
            stack = list(train_views)
            rng.shuffle(stack)
        v = stack.pop()
        state, dstats, aux = step_fn(state, dstats, v.camera,
                                     jnp.asarray(v.image), jnp.int32(it))
        if it % log_every == 0:
            log(f"[scratch] it={it} loss={float(aux['loss']):.4f} "
                f"live={int(state.live_count())}")

        if scfg.densify_from < it < scfg.densify_until:
            if it % scfg.densify_every == 0:
                key, k1 = jax.random.split(key)
                state, d1 = D.densify_and_clone(
                    state, dstats, scfg.densify_grad_threshold, scene_extent,
                    scfg.percent_dense, scfg.densify_budget)
                state, d2 = D.densify_and_split(
                    state, dstats, scfg.densify_grad_threshold, scene_extent,
                    scfg.percent_dense, scfg.densify_budget, key=k1)
                max_screen = 20.0 if it > scfg.opacity_reset_every else None
                state = D.prune_oversized(state, dstats, max_screen,
                                          scene_extent)
                dropped = int(d1) + int(d2)
                if dropped:
                    log(f"[scratch] it={it} densify dropped {dropped} "
                        "candidates (capacity)")
                dstats = D.init_stats(state.capacity)
            if it % scfg.opacity_reset_every == 0:
                state = D.reset_opacity(state, 0.01)

        if it in scfg.prune_iterations:
            i = list(scfg.prune_iterations).index(it)
            pct = scfg.prune_percent * (scfg.prune_decay ** i)
            state = lightgaussian_prune(state, train_views, cfg, pct,
                                        v_pow=scfg.v_pow)
            log(f"[scratch] it={it} LG prune {pct:.3f} -> "
                f"live={int(state.live_count())}")
    return state
