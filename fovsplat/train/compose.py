"""Model composition: fold PS-mask layers into the foveated model.

Counterparts of the reference's compose_models.py:39-80 (ours),
gen_naive_FR.py:30-60 (SM-FR baseline: random nested subsets sized like
ours' layers) and pnum_analyzer.py (per-layer counts).

With capacity-padded states the reference's PLY `index` column bookkeeping
disappears: every layer state shares row identity by construction, so
composition is three vectorized selects.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from fovsplat.models import state as S


@dataclasses.dataclass
class ComposedModel:
    """The foveated render model (compose_models.py outputs
    highest_levels.pt / shs_dcs.pt / opacities.pt)."""
    params: object            # GaussianParams (capacity rows; xyz/scale/rot/
                              # f_rest from the PS1 model)
    live: np.ndarray          # (C,) PS1 live mask
    highest_levels: np.ndarray  # (C,) float
    shs_dcs: np.ndarray       # (C, L, 3) raw DC coefficients per level
    opacities: np.ndarray     # (C, L) activated opacity per level


def compose_layers(layer_states: list[S.TrainerState]) -> ComposedModel:
    """layer_states[0] is the PS1 model; each subsequent state is the same
    capacity with a (nested) live mask and retrained DC/opacity."""
    base = layer_states[0]
    cap = base.capacity
    L = len(layer_states)
    shs_dcs = np.zeros((cap, L, 3), np.float32)
    opacities = np.ones((cap, L), np.float32)
    highest = np.zeros(cap, np.float32)

    for i, st in enumerate(layer_states):
        live = np.asarray(st.live)
        dc = np.asarray(st.params.features_dc)[:, 0, :]
        op = np.asarray(jax.nn.sigmoid(st.params.opacity))[:, 0]
        if i == 0:
            shs_dcs[:, 0, :] = dc
            opacities[:, 0] = op
        else:
            shs_dcs[:, i, :] = shs_dcs[:, i - 1, :]
            opacities[:, i] = opacities[:, i - 1]
            shs_dcs[live, i, :] = dc[live]
            opacities[live, i] = op[live]
            highest[live] = i
    return ComposedModel(params=base.params, live=np.asarray(base.live),
                         highest_levels=highest, shs_dcs=shs_dcs,
                         opacities=opacities)


def gen_naive_fr(ps1_state: S.TrainerState, layer_counts: list[int],
                 seed: int = 0) -> np.ndarray:
    """SM-FR baseline highest_levels: nested random subsets with the given
    per-layer survivor counts (gen_naive_FR.py:44-55). Returns (C,) floats
    over the capacity (dead rows 0)."""
    live = np.asarray(ps1_state.live)
    live_idx = np.nonzero(live)[0]
    rng = np.random.default_rng(seed)
    perm = rng.permutation(live_idx)
    highest = np.zeros(ps1_state.capacity, np.float32)
    current = perm
    for i, count in enumerate(layer_counts[1:], start=1):
        current = current[:count]
        highest[current] = i
    return highest


def layer_counts(layer_states: list[S.TrainerState]) -> list[int]:
    """pnum_analyzer.py equivalent."""
    return [int(np.asarray(st.live).sum()) for st in layer_states]


def save_composed(path_prefix: str, model: ComposedModel) -> None:
    np.savez(path_prefix + "_composed.npz",
             highest_levels=model.highest_levels, shs_dcs=model.shs_dcs,
             opacities=model.opacities, live=model.live)


def load_composed_arrays(path: str):
    z = np.load(path)
    return (z["highest_levels"], z["shs_dcs"], z["opacities"], z["live"])
