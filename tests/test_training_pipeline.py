"""End-to-end mini pipeline on a synthetic scene (CPU, tiny budgets):
finetune -> efficiency prune -> HVS mask layer -> compose -> foveated render.

The synthetic "scene" renders a ground-truth image from a target cloud; a
jittered clone must recover it. Mirrors the stage chain of
combined_training_script.py at toy scale.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fovsplat.models import gaussians as G
from fovsplat.models import state as S
from fovsplat.ops import dense, rasterize
from fovsplat.train import compose, loops, optim
from tests.utils import make_test_camera, synthetic_cloud


@pytest.fixture(scope="module")
def scene():
    means, scales, quats, ops_, colors = synthetic_cloud(n=160, seed=9)
    cams = [make_test_camera(width=64, height=64, dist=d, fov=f)
            for d, f in ((4.0, 0.9), (4.4, 0.85), (3.8, 1.0), (4.2, 0.95))]
    views = []
    for cam in cams:
        img = dense.render_dense(means, scales, quats, ops_, colors, cam,
                                 bg_color=jnp.zeros(3))["render"]
        views.append(dataclasses.replace(
            _View(camera=cam, image=np.asarray(img))))
    params = G.GaussianParams(
        xyz=jnp.asarray(means), features_dc=jnp.asarray(
            ((colors - 0.5) / 0.28209479177387814)[:, None, :]),
        features_rest=jnp.zeros((160, 15, 3), jnp.float32),
        scaling=jnp.log(jnp.asarray(scales)),
        rotation=jnp.asarray(quats),
        opacity=jnp.asarray(np.log(ops_ / (1 - ops_))[:, None]),
    )
    return params, views


@dataclasses.dataclass
class _View:
    camera: object
    image: np.ndarray
    image_name: str = "v"


@pytest.fixture(scope="module")
def cfg():
    return loops.LoopConfig(
        raster=rasterize.RasterizeConfig(pair_capacity=1 << 13, chunk=256),
        optim=optim.OptimConfig(position_lr_max_steps=200))


def test_finetune_reduces_loss(scene, cfg):
    params, views = scene
    # Perturb colors; finetune should recover them.
    noisy = dataclasses.replace(
        params, features_dc=params.features_dc
        + 0.3 * jax.random.normal(jax.random.PRNGKey(0),
                                  params.features_dc.shape))
    state = S.from_params(noisy, capacity=200)
    step = loops.make_photometric_step(cfg)
    l0 = float(step(state, views[0].camera, jnp.asarray(views[0].image),
                    jnp.int32(1), jnp.float32(0.0))[1]["loss"])
    state = loops.finetune(state, views, iters=60, cfg=cfg, log=lambda *_: None)
    l1 = float(step(state, views[0].camera, jnp.asarray(views[0].image),
                    jnp.int32(61), jnp.float32(0.0))[1]["loss"])
    assert l1 < 0.6 * l0, (l0, l1)


def test_prune_training_gates(scene, cfg):
    params, views = scene
    state = S.from_params(params, capacity=200)
    eval_view, _ = loops.make_eval_fns(cfg)
    ssim0, psnr0 = loops.evaluate(state, views, eval_view)
    # The initial state IS the ground truth (psnr ~ 140): achievable targets
    # must be far below it, like run_prune.py's scaled targets.
    st = loops.prune_training(
        state, views, views, target_ssim=min(ssim0, 0.95) - 0.05,
        target_psnr=min(psnr0, 40.0) - 2.0, cfg=cfg, iters=30, pruning_iters=25,
        prune_interval=10, prune_ratio=0.05, per_prune_times=2,
        use_scale_decay=True, final_prune_rounds=1, log=lambda *_: None)
    assert int(st.live_count()) < 160          # something was pruned
    s1, p1 = loops.evaluate(st, views, eval_view)
    assert p1 >= 35.0                          # quality gate held (target 38)


def test_mask_and_compose(scene, cfg):
    params, views = scene
    ps1 = S.from_params(params, capacity=200)
    _, hvs_view = loops.make_eval_fns(cfg)
    hvs0 = float(hvs_view(ps1, views[0].camera,
                          jnp.asarray(views[0].image), 4.0))
    layer = loops.mask_training(
        ps1, views, pooling_size=4.0, target_hvs=hvs0 * 3.0, cfg=cfg,
        iters=16, masking_iters=12, prune_interval=8, prune_ratio=0.1,
        per_prune_times=1, log=lambda *_: None)
    # Masking must not touch geometry.
    np.testing.assert_array_equal(np.asarray(layer.params.xyz),
                                  np.asarray(ps1.params.xyz))
    assert int(layer.live_count()) <= int(ps1.live_count())

    model = compose.compose_layers([ps1, layer])
    live = np.asarray(ps1.live)
    hl = model.highest_levels
    assert ((hl[live] == 1) == np.asarray(layer.live)[live]).all()
    counts = compose.layer_counts([ps1, layer])
    assert counts[0] == 160

    # Foveated render with the composed model runs and is finite.
    from fovsplat.ops import foveated as fov
    p = ps1.params
    out = jax.jit(lambda: fov.rasterize_fov(
        p.xyz, p.get_scaling(), p.get_rotation(),
        jnp.asarray(np.tile(model.opacities[:, :2], (1, 2))),
        jnp.asarray(np.tile(model.shs_dcs[:, :2], (1, 2, 1))),
        p.features_rest, jnp.asarray(hl), views[0].camera,
        gaze=jnp.array([0.5, 0.5], jnp.float32), alpha=0.2,
        config=cfg.raster, live_mask=ps1.live))()
    assert bool(jnp.all(jnp.isfinite(out["render"])))

    naive_hl = compose.gen_naive_fr(ps1, counts)
    assert (naive_hl >= 0).all() and naive_hl.max() <= 1
    assert (naive_hl[~live] == 0).all()
