"""Data-parallel training over the 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fovsplat.models.gaussians import GaussianParams
from fovsplat.ops import rasterize
from fovsplat.parallel import data_parallel as dp
from fovsplat.train import optim, trainer
from tests.utils import make_test_camera, synthetic_cloud


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_dp_step_runs_and_reduces():
    n_dev = 8
    mesh = dp.make_mesh(n_dev)
    means, scales, quats, ops_, colors = synthetic_cloud(n=128, seed=4)
    params = GaussianParams(
        xyz=jnp.asarray(means),
        features_dc=jnp.asarray(((colors - 0.5) / 0.2821))[:, None, :],
        features_rest=jnp.zeros((128, 15, 3), jnp.float32),
        scaling=jnp.log(jnp.asarray(scales)),
        rotation=jnp.asarray(quats),
        opacity=jnp.asarray(np.log(ops_ / (1 - ops_)))[:, None],
    )
    opt_state = optim.init_state(params)
    cams = dp.stack_cameras([make_test_camera(width=48, height=48,
                                              dist=3.6 + 0.1 * i)
                             for i in range(n_dev)])
    gts = jnp.zeros((n_dev, 48, 48, 3), jnp.float32) + 0.4

    cfg = trainer.TrainConfig(
        raster=rasterize.RasterizeConfig(pair_capacity=1 << 12, chunk=256))
    step = dp.make_dp_train_step(mesh, cfg)
    p1, o1, aux1 = step(params, opt_state, cams, gts, jnp.int32(1))
    assert np.isfinite(float(aux1["loss"]))
    losses = [float(aux1["loss"])]
    p, o = p1, o1
    for it in range(2, 8):
        p, o, aux = step(p, o, cams, gts, jnp.int32(it))
        losses.append(float(aux["loss"]))
    assert losses[-1] < losses[0]
    # Params are replicated: identical on all devices.
    assert p.xyz.shape == params.xyz.shape


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_tile_sharded_render_matches_single():
    from fovsplat.parallel import tile_shard
    n = 256
    means, scales, quats, ops_, colors = synthetic_cloud(n=n, seed=17)
    cam = make_test_camera(width=96, height=64)
    mesh = dp.make_mesh(8)
    img, aux = tile_shard.render_tile_sharded(
        mesh, jnp.asarray(means), jnp.asarray(scales), jnp.asarray(quats),
        jnp.asarray(ops_), jnp.asarray(colors), cam,
        pair_capacity=1 << 14, chunk=256,
        bg_color=jnp.array([0.1, 0.2, 0.3]))
    assert int(aux["overflow"]) == 0

    ref = rasterize.rasterize(
        means, scales, quats, ops_, cam, colors=colors,
        bg_color=jnp.array([0.1, 0.2, 0.3]),
        config=rasterize.RasterizeConfig(pair_capacity=1 << 14, chunk=256))
    np.testing.assert_allclose(np.asarray(img), np.asarray(ref["render"]),
                               rtol=1e-4, atol=1e-4)


def test_tile_sharded_pallas_backend():
    """Tile-sharded render with the production Pallas blend kernel inside
    shard_map matches the XLA-blend tile-sharded path to the inference
    quantization tolerance."""
    import numpy as np
    import jax.numpy as jnp
    from fovsplat.parallel import tile_shard
    from fovsplat.parallel.data_parallel import make_mesh
    from tests.utils import make_test_camera, synthetic_cloud

    means, scales, quats, ops_, colors = synthetic_cloud(n=256, seed=91)
    cam = make_test_camera(width=96, height=64)
    mesh = make_mesh(4)
    args = (jnp.asarray(means), jnp.asarray(scales), jnp.asarray(quats),
            jnp.asarray(ops_), jnp.asarray(colors))
    img_x, aux_x = tile_shard.render_tile_sharded(
        mesh, *args, cam, pair_capacity=1 << 12)
    img_p, aux_p = tile_shard.render_tile_sharded(
        mesh, *args, cam, pair_capacity=1 << 12, backend="pallas",
        interpret=True)
    assert int(aux_x["overflow"]) == 0 and int(aux_p["overflow"]) == 0
    np.testing.assert_allclose(np.asarray(img_p), np.asarray(img_x),
                               rtol=0, atol=1.2e-2)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_tile_sharded_capacity_stress():
    """Non-toy shape (round-4): 128k clustered proxy Gaussians at 512x384
    over 8 devices, with a per-destination capacity tight enough that the
    skewed destination loads (central tiles live on few devices) fill
    multiple blend chunks per destination. Asserts (a) exact parity with
    the single-device renderer at a fitting capacity, and (b) that an
    undersized per-destination capacity is REPORTED via the overflow
    counter rather than silently dropping pairs."""
    from fovsplat.data import proxy
    from fovsplat.parallel import tile_shard
    n = 131_072
    sc = proxy.bicycle_proxy(n=n)
    cam = proxy.proxy_camera(width=512, height=384)
    mesh = dp.make_mesh(8)
    args = (jnp.asarray(sc["means"]), jnp.asarray(sc["scales"]),
            jnp.asarray(sc["rotations"]), jnp.asarray(sc["opacity"]),
            jnp.asarray(np.clip(
                0.5 + 0.282095 * sc["shs_dcs"][:, 0, :], 0.0, 1.0)))
    img, aux = tile_shard.render_tile_sharded(
        mesh, *args, cam, pair_capacity=1 << 19,
        per_dest_capacity=40_960, chunk=1024,
        bg_color=jnp.array([0.1, 0.2, 0.3]))
    assert int(aux["overflow"]) == 0

    ref = rasterize.rasterize(
        args[0], args[1], args[2], args[3], cam, colors=args[4],
        bg_color=jnp.array([0.1, 0.2, 0.3]),
        config=rasterize.RasterizeConfig(pair_capacity=1 << 19, chunk=4096))
    np.testing.assert_allclose(np.asarray(img), np.asarray(ref["render"]),
                               rtol=1e-4, atol=1e-4)

    # Undersized per-destination capacity: the all-to-all send buffers
    # truncate, and the overflow counter must say so.
    _, aux_small = tile_shard.render_tile_sharded(
        mesh, *args, cam, pair_capacity=1 << 19,
        per_dest_capacity=4_096, chunk=1024)
    assert int(aux_small["overflow"]) > 0


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_fov_tile_sharded_parity():
    """The PRODUCTION foveated pipeline (fused expand/cull/compact kernel +
    exact-depth fused-key sort + dual-transmittance blend kernel) sharded
    over Gaussians on the 8-device mesh matches the single-device
    rasterize_fov_soa image. Both paths use identical quantization and the
    exact 2-key order, so the tolerance is roundoff, not quantization."""
    from fovsplat.data import proxy
    from fovsplat.ops import foveated as fov
    from fovsplat.ops.rasterize import RasterizeConfig
    from fovsplat.parallel import fov_shard

    n = 4096
    sc = proxy.bicycle_proxy(n=n)
    cam = proxy.proxy_camera(width=128, height=96)
    gaze = jnp.asarray([0.5, 0.5], jnp.float32)
    model = fov.pack_fov_model(
        jnp.asarray(sc["means"]), jnp.asarray(sc["scales"]),
        jnp.asarray(sc["rotations"]), jnp.asarray(sc["opacities4"]),
        jnp.asarray(sc["shs_dcs"]), jnp.asarray(sc["shs_rest"]),
        jnp.asarray(sc["highest_levels"]))

    cfg = RasterizeConfig(
        pair_capacity=1 << 14, backend="pallas", pallas_fwd_only=True,
        pallas_chunk=128, pallas_interpret=True, sort_exact_depth=True,
        pallas_table_kernel=False, expand_chunk=128, expand_batch=4)
    ref = fov.rasterize_fov_soa(model, cam, gaze, 0.05, blending=True,
                                config=cfg)
    assert int(ref["overflow"]) == 0

    mesh = dp.make_mesh(8)
    img, aux = fov_shard.render_fov_tile_sharded(
        mesh, model, cam, gaze, alpha=0.05, pair_capacity=1 << 14,
        per_dest_capacity=4096, expand_chunk=128, expand_batch=4,
        blend_chunk=128, interpret=True)
    assert int(aux["overflow"]) == 0
    np.testing.assert_allclose(np.asarray(img), np.asarray(ref["render"]),
                               rtol=0, atol=2e-4)

    # Undersized per-destination capacity must be REPORTED.
    _, aux_small = fov_shard.render_fov_tile_sharded(
        mesh, model, cam, gaze, alpha=0.05, pair_capacity=1 << 14,
        per_dest_capacity=256, expand_chunk=128, expand_batch=4,
        blend_chunk=128, interpret=True)
    assert int(aux_small["overflow"]) > 0
