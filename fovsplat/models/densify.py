"""Densification (clone/split) and size pruning under capacity + live mask.

Counterpart of the reference's densify_and_prune family
(scene/gaussian_model.py:688-851: densify_and_clone, densify_and_split with
scale/1.6 resampling, prune by opacity/screen-size) and the gradient
accumulation driven from the render loop (add_densification_stats).

Fixed shapes: each densify event promotes at most `budget` candidates into
dead capacity rows (top-k by view-space positional gradient). If the
capacity runs out the lowest-priority candidates are dropped and counted —
never silently reordered.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from fovsplat.models import state as S
from fovsplat.models.gaussians import GaussianParams
from fovsplat.ops.projection import quat_to_rotmat
from fovsplat.train import optim
from fovsplat.utils.general import inverse_sigmoid


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class DensifyStats:
    grad_accum: Any    # (C,) sum of view-space grad norms
    denom: Any         # (C,) number of contributions
    max_radii: Any     # (C,) max screen radius seen


def init_stats(capacity: int) -> DensifyStats:
    z = jnp.zeros(capacity, jnp.float32)
    return DensifyStats(grad_accum=z, denom=z, max_radii=z)


def accumulate(stats: DensifyStats, mean2d_grad, radii, width, height) -> DensifyStats:
    """add_densification_stats: accumulate ||d mean2d|| for visible rows.
    The reference uses NDC-space gradients (viewspace_points); our pixel-
    space gradients are rescaled by 2/size to match the threshold scale."""
    gx = mean2d_grad[:, 0] * (2.0 / width)
    gy = mean2d_grad[:, 1] * (2.0 / height)
    norm = jnp.sqrt(gx * gx + gy * gy)
    vis = radii > 0
    return DensifyStats(
        grad_accum=stats.grad_accum + jnp.where(vis, norm, 0.0),
        denom=stats.denom + vis.astype(jnp.float32),
        max_radii=jnp.maximum(stats.max_radii, radii.astype(jnp.float32)))


def _place_rows(state: S.TrainerState, new_params: GaussianParams,
                priority: jnp.ndarray, want: jnp.ndarray, budget: int):
    """Scatter up to `budget` new rows (from per-candidate `new_params`,
    aligned with src_rows) into dead slots, highest `priority` first.
    Returns (state, placed_mask (budget,), dropped_count)."""
    cap = state.capacity
    # Top-`budget` candidates by priority among `want`.
    pr = jnp.where(want, priority, -jnp.inf)
    top_pr, cand_idx = jax.lax.top_k(pr, budget)
    cand_ok = top_pr > -jnp.inf
    # First `budget` dead slots.
    dead_score = jnp.where(state.live, -1.0, 1.0)
    slot_ok_score, slots = jax.lax.top_k(dead_score, budget)
    slot_ok = slot_ok_score > 0
    place = cand_ok & slot_ok
    n_want = jnp.sum(want)
    dropped = jnp.maximum(n_want - jnp.sum(place), 0)

    safe_slots = jnp.where(place, slots, cap)  # OOB rows dropped
    gathered = jax.tree.map(lambda x: x[cand_idx], new_params)

    def scatter(dst, src):
        return dst.at[safe_slots].set(src, mode='drop')

    params = jax.tree.map(scatter, state.params, gathered)
    live = state.live.at[safe_slots].set(True, mode='drop')
    zero_rows = lambda x: x.at[safe_slots].set(0.0, mode='drop')
    opt = optim.AdamState(mu=jax.tree.map(zero_rows, state.opt.mu),
                          nu=jax.tree.map(zero_rows, state.opt.nu),
                          count=state.opt.count)
    return (S.TrainerState(params=params, opt=opt, live=live),
            cand_idx, place, dropped)


def densify_and_split(state: S.TrainerState, stats: DensifyStats,
                      grad_threshold: float, scene_extent: float,
                      percent_dense: float = 0.01, budget: int = 16384,
                      key=None):
    """Split: large Gaussians with high positional gradient are replaced by
    two samples from the Gaussian, scales / 1.6 (gaussian_model.py:751-793).
    One of the two samples reuses the parent's row."""
    if key is None:
        key = jax.random.PRNGKey(0)
    p = state.params
    grads = stats.grad_accum / jnp.maximum(stats.denom, 1.0)
    scale = p.get_scaling()
    max_scale = jnp.max(scale, axis=1)
    want = (state.live & (grads >= grad_threshold)
            & (max_scale > percent_dense * scene_extent))

    R = quat_to_rotmat(p.get_rotation())
    noise = jax.random.normal(key, (2,) + p.xyz.shape)
    samples = p.xyz + jnp.einsum('nij,knj->kni', R, noise * scale)
    new_scaling = jnp.log(scale / (0.8 * 2))   # = log(scale/1.6)

    child = GaussianParams(
        xyz=samples[0], features_dc=p.features_dc,
        features_rest=p.features_rest, scaling=new_scaling,
        rotation=p.rotation, opacity=p.opacity)
    state2, cand_idx, place, dropped = _place_rows(
        state, child, grads, want, budget)
    # Parent rows that actually split: replace in-place with sample 1.
    placed_rows = jnp.where(place, cand_idx, state.capacity)
    parent = GaussianParams(
        xyz=samples[1], features_dc=p.features_dc,
        features_rest=p.features_rest, scaling=new_scaling,
        rotation=p.rotation, opacity=p.opacity)
    def upd(dst, src):
        return dst.at[placed_rows].set(src[cand_idx], mode='drop')
    params = jax.tree.map(upd, state2.params, parent)
    return dataclasses.replace(state2, params=params), dropped


def densify_and_clone(state: S.TrainerState, stats: DensifyStats,
                      grad_threshold: float, scene_extent: float,
                      percent_dense: float = 0.01, budget: int = 16384):
    """Clone: small Gaussians with high positional gradient are duplicated
    as-is (gaussian_model.py:795-812)."""
    p = state.params
    grads = stats.grad_accum / jnp.maximum(stats.denom, 1.0)
    max_scale = jnp.max(p.get_scaling(), axis=1)
    want = (state.live & (grads >= grad_threshold)
            & (max_scale <= percent_dense * scene_extent))
    state2, _, _, dropped = _place_rows(state, p, grads, want, budget)
    return state2, dropped


def prune_oversized(state: S.TrainerState, stats: DensifyStats,
                    max_screen_size: float | None, scene_extent: float,
                    opacity_threshold: float = 0.005) -> S.TrainerState:
    """densify_and_prune's prune: low opacity, huge screen radius, or
    world-size > 0.1 * extent (gaussian_model.py:814-834)."""
    p = state.params
    kill = jax.nn.sigmoid(p.opacity[:, 0]) < opacity_threshold
    if max_screen_size is not None:
        kill = kill | (stats.max_radii > max_screen_size)
        kill = kill | (jnp.max(p.get_scaling(), 1) > 0.1 * scene_extent)
    return S.prune_mask(state, state.live & kill)


def reset_opacity(state: S.TrainerState, value: float = 0.01) -> S.TrainerState:
    """reset_opacity (gaussian_model.py:421-425): clamp to <= value and
    refresh the opacity optimizer state."""
    new_op = inverse_sigmoid(jnp.minimum(
        jax.nn.sigmoid(state.params.opacity), value))
    params = dataclasses.replace(state.params, opacity=new_op)
    return S.TrainerState(params=params,
                          opt=optim.replace_field(state.opt, "opacity"),
                          live=state.live)
