"""TPU (Mosaic) lowering regression tests — no TPU required.

Pallas TPU kernels are verified by Mosaic *client-side* during StableHLO
lowering: dtype-mismatched DMAs, misaligned sublane windows, unsupported
dot precisions, etc. all surface from ``jit(f).trace(...).lower(
lowering_platforms=('tpu',))`` on a CPU-only host. Through the remote-TPU
tunnel those same errors are otherwise invisible until an expensive remote
compile fails (often reported as a bare HTTP 500), so this test pins the
production inference pipelines to "lowers cleanly for TPU".

Covers the two driver-facing paths:
  * the foveated SoA pipeline (bench.py / scripts/bench_fps_ninegaze.py),
  * the single-level ps1 pallas path (__graft_entry__.entry on TPU).

Shapes are scaled-down but alignment-class-identical to the bench defaults
(capacities multiples of chunk*batch, 8-row sublane padding, <2^24).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fovsplat.data.cameras import look_at_camera
from fovsplat.ops import foveated as fov
from fovsplat.ops import rasterize as rast


def _cloud(n, levels=True, seed=0):
    rng = np.random.default_rng(seed)
    means = jnp.asarray(rng.normal(0, 1.2, (n, 3)), jnp.float32)
    scales = jnp.asarray(rng.uniform(0.002, 0.012, (n, 3)), jnp.float32)
    quats = rng.normal(0, 1, (n, 4))
    quats /= np.linalg.norm(quats, axis=1, keepdims=True)
    quats = jnp.asarray(quats, jnp.float32)
    out = [means, scales, quats]
    if levels:
        hl = jnp.asarray(rng.choice(4, size=(n,)), jnp.float32)
        shs_dcs = jnp.asarray(rng.normal(0, 0.8, (n, 4, 3)), jnp.float32)
        opac4 = jnp.asarray(rng.uniform(0.2, 0.95, (n, 4)), jnp.float32)
        rest = jnp.asarray(rng.normal(0, 0.05, (n, 15, 3)), jnp.float32)
        out += [opac4, shs_dcs, rest, hl]
    else:
        out += [jnp.asarray(rng.uniform(0.2, 0.95, (n,)), jnp.float32),
                jnp.asarray(rng.uniform(0, 1, (n, 3)), jnp.float32)]
    return out


def _cam(w=640, h=384):
    return look_at_camera([0.4, -0.3, -4.0], [0, 0, 0], [0, -1, 0],
                          fovx=1.1, fovy=0.76, width=w, height=h)


def test_fov_soa_pipeline_lowers_for_tpu():
    n = 50_000
    means, scales, quats, opac4, shs_dcs, rest, hl = _cloud(n)
    cam = _cam()
    cfg = rast.RasterizeConfig(
        pair_capacity=262_144, chunk=4096, backend="pallas",
        pallas_chunk=256, pallas_fwd_only=True,
        dummy_slack=65_536, compact_capacity=229_376)
    model = jax.jit(fov.pack_fov_model)(
        means, scales, quats, opac4, shs_dcs, rest, hl)
    f = jax.jit(lambda mdl, gz: fov.rasterize_fov_soa(
        mdl, cam, gaze=gz, alpha=0.05, blending=True,
        config=cfg)["render"])
    lowered = f.trace(model, jnp.asarray([0.5, 0.5], jnp.float32)).lower(
        lowering_platforms=("tpu",))
    assert "tpu_custom_call" in lowered.as_text()


def test_ps1_pallas_path_lowers_for_tpu():
    n = 50_000
    means, scales, quats, opac, colors = _cloud(n, levels=False)
    cam = _cam()
    cfg = rast.RasterizeConfig(
        pair_capacity=1 << 18, chunk=4096, backend="pallas",
        pallas_chunk=256, pallas_fwd_only=True)
    f = jax.jit(lambda m, s, q, o, c: rast.rasterize(
        m, s, q, o, cam, colors=c, config=cfg)["render"])
    lowered = f.trace(means, scales, quats, opac, colors).lower(
        lowering_platforms=("tpu",))
    assert "tpu_custom_call" in lowered.as_text()


def test_ps1_soa_path_lowers_for_tpu():
    n = 50_000
    means, scales, quats, opac, colors = _cloud(n, levels=False, seed=2)
    dc = ((colors - 0.5) / 0.28209479177387814)[:, None, :]
    rest = jnp.zeros((n, 15, 3), jnp.float32)
    cam = _cam()
    cfg = rast.RasterizeConfig(
        pair_capacity=1 << 18, chunk=4096, backend="pallas",
        pallas_chunk=256, pallas_fwd_only=True)
    model = jax.jit(rast.pack_ps1_model)(means, scales, quats, opac, dc,
                                         rest)
    f = jax.jit(lambda m: rast.rasterize_ps1_soa(m, cam,
                                                 config=cfg)["render"])
    lowered = f.trace(model).lower(lowering_platforms=("tpu",))
    assert "tpu_custom_call" in lowered.as_text()


def test_train_step_lowers_for_tpu():
    """Fused training path (train-mode expand kernel + unaligned blend
    fwd+bwd) lowers cleanly for TPU, including the gradient graph."""
    n = 20_000
    means, scales, quats, opac, colors = _cloud(n, levels=False, seed=3)
    cam = _cam(320, 192)
    cfg = rast.RasterizeConfig(
        pair_capacity=1 << 16, chunk=4096, backend="pallas",
        pallas_chunk=256)
    target = jnp.zeros((cam.height, cam.width, 3), jnp.float32)

    def loss(m, s, q, o, c):
        out = rast.rasterize(m, s, q, o, cam, colors=c, config=cfg)
        return jnp.mean((out["render"] - target) ** 2)

    g = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3, 4)))
    lowered = g.trace(means, scales, quats, opac, colors).lower(
        lowering_platforms=("tpu",))
    assert lowered.as_text().count("tpu_custom_call") >= 3


def test_stats_path_lowers_for_tpu():
    from fovsplat.ops import stats
    n = 20_000
    means, scales, quats, opac, colors = _cloud(n, levels=False, seed=4)
    cam = _cam(320, 192)
    cfg = rast.RasterizeConfig(
        pair_capacity=1 << 16, chunk=4096, backend="pallas",
        pallas_chunk=256)
    f = jax.jit(lambda m, s, q, o, c: stats.rasterize_stats(
        m, s, q, o, cam, colors=c, mode="loss_weighted_max_count",
        config=cfg)["contribs"])
    lowered = f.trace(means, scales, quats, opac, colors).lower(
        lowering_platforms=("tpu",))
    assert "tpu_custom_call" in lowered.as_text()
