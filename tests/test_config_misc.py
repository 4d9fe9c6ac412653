"""Config reflection, profiling harness, MM-FR renderer, video paths."""

import argparse
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from fovsplat.train import loops
from fovsplat.utils import config as cfg_mod


def test_config_reflection_roundtrip(tmp_path):
    cfg = loops.LoopConfig()
    parser = argparse.ArgumentParser()
    cfg_mod.add_dataclass_args(parser, loops.LoopConfig)
    ns = parser.parse_args(["--lambda-dssim", "0.3",
                            "--raster.pair-capacity", "4096"])
    cfg2 = cfg_mod.apply_args(cfg, ns)
    assert cfg2.lambda_dssim == 0.3
    assert cfg2.raster.pair_capacity == 4096
    assert cfg2.sh_degree == cfg.sh_degree

    path = str(tmp_path / "cfg_args.json")
    cfg_mod.save_config(path, cfg2)
    cfg3 = cfg_mod.load_config(path, loops.LoopConfig)
    assert cfg3 == cfg2

    # get_combined_args semantics: persisted config + CLI override.
    ns2 = parser.parse_args(["--sh-degree", "2"])
    cfg4 = cfg_mod.combined_config(loops.LoopConfig, str(tmp_path), ns2)
    assert cfg4.sh_degree == 2
    assert cfg4.lambda_dssim == 0.3          # from persisted file


def test_mmfr_render_runs():
    from fovsplat.eval import mmfr
    from fovsplat.ops.rasterize import RasterizeConfig
    from tests.utils import make_test_camera, synthetic_cloud

    cam = make_test_camera(width=64, height=64)
    models = []
    for seed in range(4):
        means, scales, quats, ops_, colors = synthetic_cloud(n=64, seed=seed)
        models.append({"xyz": jnp.asarray(means),
                       "scaling": jnp.asarray(scales),
                       "rotation": jnp.asarray(quats),
                       "opacity": jnp.asarray(ops_),
                       "colors": jnp.asarray(colors)})
    img = mmfr.render_mmfr(models, cam, jnp.array([0.5, 0.5], jnp.float32),
                           alpha=0.3,
                           config=RasterizeConfig(pair_capacity=1 << 12,
                                                  chunk=256),
                           bg_color=jnp.zeros(3))
    assert img.shape == (64, 64, 3)
    assert bool(jnp.all(jnp.isfinite(img)))


def test_video_path():
    from fovsplat.eval import video
    from tests.utils import make_test_camera

    class V:
        def __init__(self, cam):
            self.camera = cam

    views = [V(make_test_camera(width=32, height=32, dist=3.0 + 0.2 * i))
             for i in range(6)]
    cams = video.ellipse_path(views, n_frames=8)
    assert len(cams) == 8
    assert cams[0].width == 32


def test_mmfr_fused_matches_xla():
    """MM-FR fused route (bin once + segment-masked blend — the
    reference's tile_skips) vs the per-pair tile-mask XLA route."""
    import numpy as np
    from fovsplat.eval import mmfr
    from fovsplat.ops.rasterize import RasterizeConfig
    from tests.utils import make_test_camera, synthetic_cloud

    rng = np.random.default_rng(7)
    cam = make_test_camera(width=96, height=64)
    models = []
    for li in range(4):
        n = 160 - 30 * li
        means, scales, quats, ops_, colors = synthetic_cloud(n=n,
                                                             seed=100 + li)
        models.append(dict(xyz=jnp.asarray(means),
                           scaling=jnp.asarray(scales),
                           rotation=jnp.asarray(quats),
                           opacity=jnp.asarray(ops_),
                           colors=jnp.asarray(colors)))
    gaze = jnp.array([0.4, 0.6], jnp.float32)
    img_x = jax.jit(lambda: mmfr.render_mmfr(
        models, cam, gaze, 0.3,
        RasterizeConfig(pair_capacity=1 << 12, chunk=256)))()
    img_p = jax.jit(lambda: mmfr.render_mmfr(
        models, cam, gaze, 0.3,
        RasterizeConfig(pair_capacity=1 << 12, chunk=256,
                        backend="pallas", pallas_chunk=128,
                        pallas_interpret=True, pallas_fwd_only=True)))()
    np.testing.assert_allclose(np.asarray(img_p), np.asarray(img_x),
                               rtol=0, atol=1.2e-2)
