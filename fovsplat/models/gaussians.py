"""GaussianParams: the functional parameter store.

TPU-native counterpart of the reference ``GaussianModel``
(fov3dgs/scene/gaussian_model.py:24-867) re-designed as an immutable JAX
pytree + pure functions: activations are applied at read time
(exp / sigmoid / L2-normalize, gaussian_model.py:26-42), pruning/densify are
gathers/concats producing new pytrees (the optimizer-state surgery lives in
fovsplat.train.optim), and PLY interop lives in to_ply_arrays/from_ply_arrays
(3 schemas: plain / +index / composed).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from fovsplat.data import ply as plyio
from fovsplat.ops import knn, sh
from fovsplat.utils.general import inverse_sigmoid


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class GaussianParams:
    """Raw (pre-activation) parameters; shapes (N, ...)."""
    xyz: Any              # (N, 3)
    features_dc: Any      # (N, 1, 3)
    features_rest: Any    # (N, K-1, 3)
    scaling: Any          # (N, 3) log-scale
    rotation: Any         # (N, 4) unnormalized quat (wxyz)
    opacity: Any          # (N, 1) logit

    @property
    def num_points(self) -> int:
        return self.xyz.shape[0]

    @property
    def sh_degree(self) -> int:
        return int(round((self.features_rest.shape[1] + 1) ** 0.5)) - 1

    # Activations (gaussian_model.py:200-240).
    def get_scaling(self):
        return jnp.exp(self.scaling)

    def get_rotation(self):
        q = self.rotation
        return q / jnp.linalg.norm(q, axis=-1, keepdims=True)

    def get_opacity(self):
        return jax.nn.sigmoid(self.opacity)[..., 0]

    def get_features(self):
        return jnp.concatenate([self.features_dc, self.features_rest], axis=1)


def create_from_points(points: np.ndarray, colors: np.ndarray,
                       sh_degree: int = 3) -> GaussianParams:
    """Initialize from a colored point cloud (create_from_pcd,
    gaussian_model.py:246-270): scales from mean 3-NN distance, identity
    rotation, opacity sigmoid^-1(0.1)."""
    n = points.shape[0]
    k = sh.num_sh_coeffs(sh_degree)
    points = jnp.asarray(points, jnp.float32)
    dc = sh.rgb_to_sh_dc(jnp.asarray(colors, jnp.float32))[:, None, :]
    rest = jnp.zeros((n, k - 1, 3), jnp.float32)
    dist2 = jnp.maximum(knn.mean_knn_sqdist(points), 1e-7)
    scales = jnp.log(jnp.sqrt(dist2))[:, None].repeat(3, axis=1)
    rots = jnp.zeros((n, 4), jnp.float32).at[:, 0].set(1.0)
    opac = inverse_sigmoid(0.1 * jnp.ones((n, 1), jnp.float32))
    return GaussianParams(xyz=points, features_dc=dc, features_rest=rest,
                          scaling=scales, rotation=rots, opacity=opac)


def select(params: GaussianParams, idx: jnp.ndarray) -> GaussianParams:
    """Gather rows (prune keep-list, split/clone source list, ...)."""
    return jax.tree.map(lambda x: x[idx], params)


def concat(a: GaussianParams, b: GaussianParams) -> GaussianParams:
    return jax.tree.map(lambda x, y: jnp.concatenate([x, y], axis=0), a, b)


def reset_opacity_max(params: GaussianParams, max_val: float = 0.99) -> GaussianParams:
    """Clamp activated opacity to <= max_val (reset_opacity_max,
    gaussian_model.py:427-431)."""
    o = jnp.minimum(jax.nn.sigmoid(params.opacity), max_val)
    return dataclasses.replace(params, opacity=inverse_sigmoid(o))


# ---------------------------------------------------------------- PLY interop

def to_ply_arrays(params: GaussianParams, indexes: np.ndarray | None = None,
                  shs_dcs: np.ndarray | None = None,
                  ecc_threshs: np.ndarray | None = None) -> dict[str, np.ndarray]:
    """Column dict in the reference's save_ply layout (f_rest channel-major,
    gaussian_model.py:356-374). Pass `indexes` for the index schema,
    `shs_dcs`+`ecc_threshs` for the composed schema."""
    xyz = np.asarray(params.xyz, np.float32)
    n = xyz.shape[0]
    cols: dict[str, np.ndarray] = {
        "x": xyz[:, 0], "y": xyz[:, 1], "z": xyz[:, 2],
        "nx": np.zeros(n, np.float32), "ny": np.zeros(n, np.float32),
        "nz": np.zeros(n, np.float32),
    }
    f_dc = np.asarray(params.features_dc, np.float32).transpose(0, 2, 1).reshape(n, -1)
    for i in range(f_dc.shape[1]):
        cols[f"f_dc_{i}"] = f_dc[:, i]
    f_rest = np.asarray(params.features_rest, np.float32).transpose(0, 2, 1).reshape(n, -1)
    for i in range(f_rest.shape[1]):
        cols[f"f_rest_{i}"] = f_rest[:, i]
    cols["opacity"] = np.asarray(params.opacity, np.float32)[:, 0]
    sc = np.asarray(params.scaling, np.float32)
    for i in range(sc.shape[1]):
        cols[f"scale_{i}"] = sc[:, i]
    rot = np.asarray(params.rotation, np.float32)
    for i in range(rot.shape[1]):
        cols[f"rot_{i}"] = rot[:, i]
    if shs_dcs is not None:
        sd = np.asarray(shs_dcs, np.float32).transpose(0, 2, 1).reshape(n, -1)
        for i in range(sd.shape[1]):
            cols[f"shs_dc_{i}"] = sd[:, i]
        cols["ecc_thresh"] = np.asarray(ecc_threshs, np.float32).reshape(n)
    if indexes is not None:
        cols["index"] = np.asarray(indexes, np.int32).reshape(n)
    return cols


def save_ply(path: str, params: GaussianParams, **kw) -> None:
    plyio.write_ply(path, to_ply_arrays(params, **kw))


def from_ply_arrays(cols: dict[str, np.ndarray], sh_degree: int = 3):
    """Inverse of to_ply_arrays. Returns (params, extras) where extras may
    hold 'index', 'shs_dcs', 'ecc_thresh'."""
    n = len(cols["x"])
    xyz = np.stack([cols["x"], cols["y"], cols["z"]], -1).astype(np.float32)
    k = sh.num_sh_coeffs(sh_degree)
    n_dc = sum(1 for c in cols if c.startswith("f_dc_"))
    f_dc = np.stack([cols[f"f_dc_{i}"] for i in range(n_dc)], -1)
    f_dc = f_dc.reshape(n, 3, n_dc // 3).transpose(0, 2, 1)
    n_rest = sum(1 for c in cols if c.startswith("f_rest_"))
    if n_rest:
        f_rest = np.stack([cols[f"f_rest_{i}"] for i in range(n_rest)], -1)
        f_rest = f_rest.reshape(n, 3, n_rest // 3).transpose(0, 2, 1)
    else:
        f_rest = np.zeros((n, k - 1, 3), np.float32)
    n_sc = sum(1 for c in cols if c.startswith("scale_"))
    scaling = np.stack([cols[f"scale_{i}"] for i in range(n_sc)], -1)
    n_rot = sum(1 for c in cols if c.startswith("rot_"))
    rotation = np.stack([cols[f"rot_{i}"] for i in range(n_rot)], -1)
    params = GaussianParams(
        xyz=jnp.asarray(xyz),
        features_dc=jnp.asarray(f_dc.astype(np.float32)),
        features_rest=jnp.asarray(f_rest.astype(np.float32)),
        scaling=jnp.asarray(scaling.astype(np.float32)),
        rotation=jnp.asarray(rotation.astype(np.float32)),
        opacity=jnp.asarray(cols["opacity"].astype(np.float32))[:, None],
    )
    extras: dict[str, Any] = {}
    if "index" in cols:
        extras["index"] = cols["index"].astype(np.int32)
    n_sd = sum(1 for c in cols if c.startswith("shs_dc_"))
    if n_sd:
        sd = np.stack([cols[f"shs_dc_{i}"] for i in range(n_sd)], -1)
        extras["shs_dcs"] = sd.reshape(n, 3, n_sd // 3).transpose(0, 2, 1)
    if "ecc_thresh" in cols:
        extras["ecc_thresh"] = cols["ecc_thresh"].astype(np.float32)
    return params, extras


def load_ply(path: str, sh_degree: int = 3):
    data = plyio.read_ply(path)
    return from_ply_arrays(data["vertex"], sh_degree=sh_degree)
