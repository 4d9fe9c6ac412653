"""Capacity-padded training state with a live mask.

The reference physically shrinks tensors on every prune
(gaussian_model.py prune_points / _prune_optimizer), which on TPU would
recompile the jitted step each time (multi-minute compiles). Instead,
parameters stay at a fixed capacity and pruning flips rows of a boolean
`live` mask that the rasterizer's frustum cull consumes
(projection.preprocess live_mask). Compaction happens only at
checkpoint/export time.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from fovsplat.models import gaussians as G
from fovsplat.train import optim
from fovsplat.utils.general import inverse_sigmoid


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class TrainerState:
    params: G.GaussianParams
    opt: optim.AdamState
    live: Any                # (C,) bool

    @property
    def capacity(self) -> int:
        return self.params.num_points

    def live_count(self):
        return jnp.sum(self.live)


def from_params(params: G.GaussianParams, capacity: int | None = None) -> TrainerState:
    n = params.num_points
    cap = capacity or n
    if cap > n:
        def pad(x, fill=0.0):
            extra = jnp.full((cap - n,) + x.shape[1:], fill, x.dtype)
            return jnp.concatenate([x, extra], axis=0)
        # Padding rows must be NUMERICALLY SAFE, not just dead: an
        # all-zero quaternion hits rsqrt(0) in preprocess, and the
        # resulting NaN leaks into dead-row GRADIENTS through
        # where-masked values (0 * NaN = NaN), poisoning Adam moments.
        params = G.GaussianParams(
            xyz=pad(params.xyz),
            features_dc=pad(params.features_dc),
            features_rest=pad(params.features_rest),
            scaling=pad(params.scaling, -10.0),     # exp -> ~5e-5
            rotation=pad(params.rotation).at[n:, 0].set(1.0),
            opacity=pad(params.opacity, -10.0))     # sigmoid -> ~5e-5
    live = jnp.arange(cap) < n
    return TrainerState(params=params, opt=optim.init_state(params), live=live)


def compact(state: TrainerState) -> tuple[G.GaussianParams, np.ndarray]:
    """Drop dead rows (host-side). Returns (params, original_indices)."""
    live = np.asarray(state.live)
    idx = np.nonzero(live)[0]
    params = jax.tree.map(lambda x: jnp.asarray(np.asarray(x)[idx]),
                          state.params)
    return params, idx


def prune_mask(state: TrainerState, kill: jnp.ndarray) -> TrainerState:
    """Deactivate rows where `kill` is True; zero their Adam moments
    (mirrors _prune_optimizer keeping only survivor state)."""
    live = state.live & ~kill
    zero = lambda x: jnp.where(
        kill.reshape((-1,) + (1,) * (x.ndim - 1)), 0.0, x)
    opt = optim.AdamState(mu=jax.tree.map(zero, state.opt.mu),
                          nu=jax.tree.map(zero, state.opt.nu),
                          count=state.opt.count)
    return TrainerState(params=state.params, opt=opt, live=live)


def opacity_prune(state: TrainerState, threshold: float = 0.005) -> TrainerState:
    """prune(prune_method="opacity") — kill rows with activated opacity
    below threshold (prune.py:280)."""
    op = jax.nn.sigmoid(state.params.opacity[:, 0])
    return prune_mask(state, state.live & (op < threshold))


def reset_opacity_max(state: TrainerState, max_val: float = 0.1) -> TrainerState:
    """reset_opacity_max + replace_tensor_to_optimizer (fresh moments for
    the opacity group, gaussian_model.py:427-431,609-622)."""
    new_op = inverse_sigmoid(
        jnp.minimum(jax.nn.sigmoid(state.params.opacity), max_val))
    params = dataclasses.replace(state.params, opacity=new_op)
    opt = optim.replace_field(state.opt, "opacity")
    return TrainerState(params=params, opt=opt, live=state.live)


def metric_prune(state: TrainerState, scores: jnp.ndarray,
                 ratio: float) -> TrainerState:
    """Kill the lowest-scoring `ratio` fraction of live rows — EXACTLY
    k rows (metric_pruning, prune.py:101-110; the reference sorts and
    prunes the first k indices). Rank-based, not threshold-based: a
    threshold cut (`score <= quantile`) over-prunes catastrophically
    when scores tie — e.g. every Gaussian invisible in the scored views
    carries score 0, and one 2% prune event then wiped 88% of a proxy
    model on-chip. Ties break by row index (stable argsort), which is
    deterministic, unlike the reference's sort-order races."""
    cap = state.live.shape[0]
    n_live = jnp.sum(state.live)
    k = (n_live.astype(jnp.float32) * ratio).astype(jnp.int32)
    s = jnp.where(state.live, scores, jnp.inf)
    order = jnp.argsort(s, stable=True)
    rank = jnp.zeros(cap, jnp.int32).at[order].set(
        jnp.arange(cap, dtype=jnp.int32))
    kill = state.live & (rank < k)
    return prune_mask(state, kill)
