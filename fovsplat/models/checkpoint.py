"""Checkpoint IO: .npz trainer state + PLY export (reference interop).

The reference persists `chkpnt<iter>.pth` = (capture(), iter) with full Adam
state plus `point_cloud/iteration_N/point_cloud.ply` (SURVEY.md §5.4). Here
one .npz carries params + live mask + Adam moments + step; PLY export writes
the compacted cloud in the reference's schema for interop.
"""

from __future__ import annotations

import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from fovsplat.models import gaussians as G
from fovsplat.models import state as S
from fovsplat.train import optim

_FIELDS = ("xyz", "features_dc", "features_rest", "scaling", "rotation",
           "opacity")


def save(path: str, state: S.TrainerState, step: int = 0,
         extra: dict | None = None) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    arrs = {}
    for f in _FIELDS:
        arrs["p_" + f] = np.asarray(getattr(state.params, f))
        arrs["mu_" + f] = np.asarray(getattr(state.opt.mu, f))
        arrs["nu_" + f] = np.asarray(getattr(state.opt.nu, f))
    arrs["live"] = np.asarray(state.live)
    arrs["count"] = np.asarray(state.opt.count)
    arrs["step"] = np.asarray(step)
    if extra:
        arrs["extra_json"] = np.frombuffer(
            json.dumps(extra).encode(), dtype=np.uint8)
    np.savez(path, **arrs)


def load(path: str):
    """Returns (state, step, extra)."""
    z = np.load(path)
    def tree(prefix):
        return G.GaussianParams(**{
            f: jnp.asarray(z[prefix + f]) for f in _FIELDS})
    params = tree("p_")
    opt = optim.AdamState(mu=tree("mu_"), nu=tree("nu_"),
                          count=jnp.asarray(z["count"]))
    state = S.TrainerState(params=params, opt=opt,
                           live=jnp.asarray(z["live"]))
    extra = {}
    if "extra_json" in z:
        extra = json.loads(bytes(z["extra_json"]).decode())
    return state, int(z["step"]), extra


def export_ply(path: str, state: S.TrainerState,
               with_index: bool = False) -> None:
    """Compacted PLY in the reference schema; `with_index` writes the
    original capacity-row index (the cross-layer identity column,
    gaussian_model.py save_ply_index)."""
    params, idx = S.compact(state)
    G.save_ply(path, params,
               indexes=idx.astype(np.int32) if with_index else None)
