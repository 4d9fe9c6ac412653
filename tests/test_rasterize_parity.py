"""Tile rasterizer vs dense oracle: forward pixels and input gradients.

This is the test the reference never had (SURVEY.md §4): the dense renderer
evaluates every Gaussian at every pixel with identical blend semantics, so
any disagreement isolates a binning/sort/segment bug in the tile path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fovsplat.ops import dense, rasterize
from tests.utils import make_test_camera, synthetic_cloud


@pytest.fixture(scope="module")
def cloud():
    return synthetic_cloud(n=512, seed=3)


@pytest.fixture(scope="module")
def cam():
    return make_test_camera(width=128, height=96)


def test_forward_matches_dense(cloud, cam):
    means, scales, quats, ops_, colors = cloud
    out_d = dense.render_dense(means, scales, quats, ops_, colors, cam,
                               bg_color=jnp.array([0.1, 0.2, 0.3]))
    cfg = rasterize.RasterizeConfig(pair_capacity=1 << 16, chunk=512)
    out_t = rasterize.rasterize(means, scales, quats, ops_, cam,
                                colors=colors,
                                bg_color=jnp.array([0.1, 0.2, 0.3]),
                                config=cfg)
    assert int(out_t["binned"].overflow) == 0
    np.testing.assert_allclose(np.asarray(out_t["final_T"]),
                               np.asarray(out_d["final_T"]),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(out_t["render"]),
                               np.asarray(out_d["render"]),
                               rtol=2e-4, atol=2e-4)


def test_radii_match(cloud, cam):
    means, scales, quats, ops_, colors = cloud
    out_d = dense.render_dense(means, scales, quats, ops_, colors, cam)
    out_t = rasterize.rasterize(means, scales, quats, ops_, cam, colors=colors)
    np.testing.assert_array_equal(np.asarray(out_t["radii"]),
                                  np.asarray(out_d["radii"]))


def test_gradients_match_dense(cloud, cam):
    means, scales, quats, ops_, colors = cloud
    bg = jnp.array([0.05, 0.05, 0.05])
    target = jnp.zeros((cam.height, cam.width, 3)) + 0.25

    def loss_dense(means, scales, quats, ops_, colors):
        img = dense.render_dense(means, scales, quats, ops_, colors, cam,
                                 bg_color=bg)["render"]
        return jnp.mean((img - target) ** 2)

    cfg = rasterize.RasterizeConfig(pair_capacity=1 << 16, chunk=512)

    def loss_tile(means, scales, quats, ops_, colors):
        img = rasterize.rasterize(means, scales, quats, ops_, cam,
                                  colors=colors, bg_color=bg,
                                  config=cfg)["render"]
        return jnp.mean((img - target) ** 2)

    gd = jax.grad(loss_dense, argnums=(0, 1, 2, 3, 4))(
        means, scales, quats, ops_, colors)
    gt = jax.grad(loss_tile, argnums=(0, 1, 2, 3, 4))(
        means, scales, quats, ops_, colors)
    names = ["means", "scales", "quats", "opacities", "colors"]
    for name, a, b in zip(names, gd, gt):
        a = np.asarray(a)
        b = np.asarray(b)
        scale = np.abs(a).max() + 1e-12
        np.testing.assert_allclose(b / scale, a / scale, rtol=5e-3, atol=5e-4,
                                   err_msg=f"grad mismatch: {name}")


def test_jit_and_shapes(cloud, cam):
    means, scales, quats, ops_, colors = cloud
    cfg = rasterize.RasterizeConfig(pair_capacity=1 << 16, chunk=512)
    f = jax.jit(lambda *a: rasterize.rasterize(*a, cam, colors=colors,
                                               config=cfg)["render"])
    img = f(means, scales, quats, ops_)
    assert img.shape == (cam.height, cam.width, 3)
    assert bool(jnp.all(jnp.isfinite(img)))


def test_fov_level_clip_invariant():
    """Pre-expansion level-rect clipping (ops/foveated.py) must not change
    the rendered image or the surviving pair count — it may only remove
    candidates the per-pair level mask rejects anyway."""
    from fovsplat.ops import foveated as fov
    rng = np.random.default_rng(7)
    n = 512
    means, scales, quats, ops_, _ = synthetic_cloud(n=n, seed=7)
    hl = rng.integers(0, 4, (n,)).astype(np.float32)
    shs_dcs = rng.normal(0, 0.6, (n, 4, 3)).astype(np.float32)
    opac4 = np.clip(ops_[:, None] + rng.normal(0, 0.1, (n, 4)),
                    0.05, 0.95).astype(np.float32)
    rest = rng.normal(0, 0.03, (n, 15, 3)).astype(np.float32)
    cam = make_test_camera(width=160, height=128)
    def run(clip):
        cfg = rasterize.RasterizeConfig(pair_capacity=1 << 14, chunk=256,
                                        clip_level_rects=clip)
        out = fov.rasterize_fov(
            jnp.asarray(means), jnp.asarray(scales), jnp.asarray(quats),
            jnp.asarray(opac4), jnp.asarray(shs_dcs), jnp.asarray(rest),
            jnp.asarray(hl), cam,
            gaze=jnp.array([0.3, 0.6], jnp.float32),  # off-center gaze
            alpha=0.3, blending=True, config=cfg)
        return out["render"], out["binned"].num_pairs

    img_c, np_c = jax.jit(lambda: run(True))()
    img_u, np_u = jax.jit(lambda: run(False))()
    assert int(np_c) == int(np_u)
    np.testing.assert_array_equal(np.asarray(img_c), np.asarray(img_u))
