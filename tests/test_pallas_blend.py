"""Pallas blend kernel (interpret mode) vs the XLA reference blend."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fovsplat.ops import binning, blend, projection, rasterize
from fovsplat.ops.pallas import blend_fwd
from tests.utils import make_test_camera, synthetic_cloud


def test_pallas_blend_matches_xla():
    means, scales, quats, ops_, colors = synthetic_cloud(n=300, seed=21)
    cam = make_test_camera(width=96, height=64)
    gx = (cam.width + 15) // 16
    gy = (cam.height + 15) // 16
    num_tiles = gx * gy
    cap = 1 << 13
    chunk = 128

    prep = jax.jit(lambda m, s, q: projection.preprocess(m, s, q, cam))(
        means, scales, quats)
    bn = jax.jit(lambda p: binning.bin_gaussians(p, gx, gy, cap))(prep)
    gid = jnp.minimum(bn.pair_gauss, means.shape[0] - 1)
    m2d = prep.mean2d[gid]
    con = prep.conic[gid]
    op = jnp.asarray(ops_)[gid]
    col = jnp.asarray(colors)[gid]

    ref_color, ref_T, ref_nc = jax.jit(
        lambda *a: blend._blend_forward_impl(*a, gx, gy, 256, -4.5))(
        bn.pair_tile, m2d, con, op, col, bn.seg_start, bn.num_pairs)

    acap = ((cap + num_tiles * chunk + chunk - 1) // chunk) * chunk
    bn2 = jax.jit(lambda b: binning.align_segments(b, chunk, num_tiles,
                                                   acap))(bn)
    gid2 = jnp.minimum(bn2.pair_gauss, means.shape[0] - 1)
    packed = blend_fwd.pack_pairs(prep.mean2d[gid2], prep.conic[gid2],
                                  jnp.asarray(ops_)[gid2],
                                  jnp.asarray(colors)[gid2])
    pal_color, pal_T, pal_nc = blend_fwd.blend_pallas(
        packed, bn2.seg_start, bn2.seg_end, gx, gy, chunk, -4.5, True)

    np.testing.assert_allclose(np.asarray(pal_T), np.asarray(ref_T),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(pal_color), np.asarray(ref_color),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(pal_nc), np.asarray(ref_nc))


def test_pallas_backend_full_parity():
    """rasterize(backend='pallas', interpret) vs backend='xla': pixels AND
    gradients."""
    means, scales, quats, ops_, colors = synthetic_cloud(n=220, seed=33)
    cam = make_test_camera(width=80, height=64)
    cfg_x = rasterize.RasterizeConfig(pair_capacity=1 << 13, chunk=256)
    cfg_p = rasterize.RasterizeConfig(pair_capacity=1 << 13, chunk=256,
                                      backend="pallas", pallas_chunk=128,
                                      pallas_interpret=True)

    def run(cfg, m, s, q, o, c):
        out = rasterize.rasterize(m, s, q, o, cam, colors=c,
                                  bg_color=jnp.array([0.2, 0.1, 0.0]),
                                  config=cfg)
        return out["render"], out["final_T"]

    img_x, T_x = jax.jit(lambda *a: run(cfg_x, *a))(
        means, scales, quats, ops_, colors)
    img_p, T_p = jax.jit(lambda *a: run(cfg_p, *a))(
        means, scales, quats, ops_, colors)
    np.testing.assert_allclose(np.asarray(T_p), np.asarray(T_x),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(img_p), np.asarray(img_x),
                               rtol=1e-4, atol=1e-5)

    target = jnp.zeros((cam.height, cam.width, 3)) + 0.3

    def loss(cfg, m, s, q, o, c):
        img, _ = run(cfg, m, s, q, o, c)
        return jnp.mean((img - target) ** 2)

    gx_ = jax.jit(jax.grad(lambda *a: loss(cfg_x, *a), argnums=(0, 1, 2, 3, 4)))(
        means, scales, quats, ops_, colors)
    gp_ = jax.jit(jax.grad(lambda *a: loss(cfg_p, *a), argnums=(0, 1, 2, 3, 4)))(
        means, scales, quats, ops_, colors)
    for name, a, b in zip(["means", "scales", "quats", "op", "col"], gx_, gp_):
        a = np.asarray(a)
        b = np.asarray(b)
        scale = np.abs(a).max() + 1e-12
        np.testing.assert_allclose(b / scale, a / scale, rtol=2e-3,
                                   atol=2e-4, err_msg=name)


def test_pallas_fwd_only_unaligned():
    means, scales, quats, ops_, colors = synthetic_cloud(n=220, seed=33)
    cam = make_test_camera(width=80, height=64)
    base = dict(pair_capacity=1 << 13, chunk=256)
    cfg_x = rasterize.RasterizeConfig(**base)
    cfg_f = rasterize.RasterizeConfig(**base, backend="pallas",
                                      pallas_chunk=128, pallas_interpret=True,
                                      pallas_fwd_only=True)
    out_x = jax.jit(lambda *a: rasterize.rasterize(
        *a, cam, colors=colors, config=cfg_x)["render"])(
        means, scales, quats, ops_)
    out_f = jax.jit(lambda *a: rasterize.rasterize(
        *a, cam, colors=colors, config=cfg_f)["render"])(
        means, scales, quats, ops_)
    # The fwd-only (inference) kernel evaluates power via a bf16x2 MXU
    # bilinear form (~2e-4 absolute in power) and rides the quantized pair
    # rows (expand_ps1_pallas ladder: ca split-bf16, cb/cc bf16, opacity
    # u8 at the 1/255 ALPHA_MIN step, colors u8): worst pixels sit within
    # ~3 8-bit display LSBs of the f32 oracle. The training kernel
    # (test_pallas_blend_matches) keeps exact f32 rows + elementwise power
    # and stays at tight tolerance.
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_x),
                               rtol=0, atol=1.2e-2)


def test_pallas_fov_matches_xla():
    from fovsplat.ops import foveated as fov
    rng = np.random.default_rng(41)
    n = 256
    means, scales, quats, ops_, colors = synthetic_cloud(n=n, seed=41)
    hl = rng.integers(0, 4, (n,)).astype(np.float32)
    shs_dcs = rng.normal(0, 0.6, (n, 4, 3)).astype(np.float32)
    opac4 = np.clip(ops_[:, None] + rng.normal(0, 0.1, (n, 4)),
                    0.05, 0.95).astype(np.float32)
    rest = rng.normal(0, 0.03, (n, 15, 3)).astype(np.float32)
    cam = make_test_camera(width=96, height=64)
    base = dict(pair_capacity=1 << 13, chunk=256)
    cfg_x = rasterize.RasterizeConfig(**base)
    cfg_p = rasterize.RasterizeConfig(**base, backend="pallas",
                                      pallas_chunk=128, pallas_interpret=True)

    def run(cfg):
        return fov.rasterize_fov(
            jnp.asarray(means), jnp.asarray(scales), jnp.asarray(quats),
            jnp.asarray(opac4), jnp.asarray(shs_dcs), jnp.asarray(rest),
            jnp.asarray(hl), cam, gaze=jnp.array([0.5, 0.5], jnp.float32),
            alpha=0.3, blending=True, bg_color=jnp.array([0.1, 0.0, 0.2]),
            config=cfg)["render"]

    out_x = jax.jit(lambda: run(cfg_x))()
    out_p = jax.jit(lambda: run(cfg_p))()
    # The pallas fov paths pack opacity/color sort payloads as bf16 pairs
    # (inference-only quantization, expand_fov.py module docstring): pixel
    # error is bounded by a few 2^-9 relative steps — far below one 8-bit
    # display LSB (1/255 ~ 4e-3) in practice, while the XLA oracle is f32.
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_x),
                               rtol=0, atol=8e-3)


def test_fov_soa_matches_plain():
    """rasterize_fov_soa (packed SoA model) == rasterize_fov (same kernels,
    different input layout)."""
    from fovsplat.ops import foveated as fov
    rng = np.random.default_rng(43)
    n = 300
    means, scales, quats, ops_, colors = synthetic_cloud(n=n, seed=43)
    hl = rng.integers(0, 4, (n,)).astype(np.float32)
    shs_dcs = rng.normal(0, 0.6, (n, 4, 3)).astype(np.float32)
    opac4 = np.clip(ops_[:, None] + rng.normal(0, 0.1, (n, 4)),
                    0.05, 0.95).astype(np.float32)
    rest = rng.normal(0, 0.03, (n, 15, 3)).astype(np.float32)
    cam = make_test_camera(width=96, height=64)
    cfg = rasterize.RasterizeConfig(pair_capacity=1 << 13, chunk=256,
                                    backend="pallas", pallas_chunk=128,
                                    pallas_interpret=True)
    gaze = jnp.array([0.45, 0.55], jnp.float32)
    bg = jnp.array([0.1, 0.0, 0.2])

    out_p = jax.jit(lambda: fov.rasterize_fov(
        jnp.asarray(means), jnp.asarray(scales), jnp.asarray(quats),
        jnp.asarray(opac4), jnp.asarray(shs_dcs), jnp.asarray(rest),
        jnp.asarray(hl), cam, gaze=gaze, alpha=0.3, blending=True,
        bg_color=bg, config=cfg)["render"])()

    model = fov.pack_fov_model(means, scales, quats, opac4, shs_dcs, rest,
                               hl)
    out_s = jax.jit(lambda: fov.rasterize_fov_soa(
        model, cam, gaze=gaze, alpha=0.3, blending=True, bg_color=bg,
        config=cfg)["render"])()
    # pack_fov_model stores SH/color/opacity rows bf16 (inference packing;
    # the plain path reads f32 inputs), so colors differ by ~2^-9 relative
    # before the shared u8/bf16 dtable quantization: pixel deltas stay
    # within ~2 8-bit display LSBs.
    np.testing.assert_allclose(np.asarray(out_s), np.asarray(out_p),
                               rtol=0, atol=1e-2)


def test_fov_unfused_expand_matches_xla():
    """The non-fused pallas expansion (pair_fn payload path,
    pallas_fused_expand=False) stays equivalent to the XLA reference."""
    from fovsplat.ops import foveated as fov
    rng = np.random.default_rng(44)
    n = 256
    means, scales, quats, ops_, colors = synthetic_cloud(n=n, seed=44)
    hl = rng.integers(0, 4, (n,)).astype(np.float32)
    shs_dcs = rng.normal(0, 0.6, (n, 4, 3)).astype(np.float32)
    opac4 = np.clip(ops_[:, None] + rng.normal(0, 0.1, (n, 4)),
                    0.05, 0.95).astype(np.float32)
    rest = rng.normal(0, 0.03, (n, 15, 3)).astype(np.float32)
    cam = make_test_camera(width=96, height=64)
    base = dict(pair_capacity=1 << 13, chunk=256)
    cfg_x = rasterize.RasterizeConfig(**base)
    cfg_p = rasterize.RasterizeConfig(**base, backend="pallas",
                                      pallas_chunk=128, pallas_interpret=True,
                                      pallas_fused_expand=False)

    def run(cfg):
        return fov.rasterize_fov(
            jnp.asarray(means), jnp.asarray(scales), jnp.asarray(quats),
            jnp.asarray(opac4), jnp.asarray(shs_dcs), jnp.asarray(rest),
            jnp.asarray(hl), cam, gaze=jnp.array([0.4, 0.6], jnp.float32),
            alpha=0.3, blending=True, config=cfg)["render"]

    out_x = jax.jit(lambda: run(cfg_x))()
    out_p = jax.jit(lambda: run(cfg_p))()
    # bf16 payload packing tolerance — see test_pallas_fov_matches_xla.
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_x),
                               rtol=0, atol=8e-3)


def test_fov_dummy_slack_budget():
    """config.dummy_slack: an exact invalid-row budget must reproduce the
    always-safe (+N) default bit-for-bit, report overflow=0, and a
    too-small total capacity must trip the overflow counter (never
    silently drop pairs)."""
    from fovsplat.ops import foveated as fov
    from fovsplat.ops import projection
    rng = np.random.default_rng(45)
    n = 256
    means, scales, quats, ops_, colors = synthetic_cloud(n=n, seed=45)
    # Push a block of Gaussians behind the camera -> invalid rows that the
    # fused path represents as dummy pairs.
    means[:48, 2] = -50.0
    hl = rng.integers(0, 4, (n,)).astype(np.float32)
    shs_dcs = rng.normal(0, 0.6, (n, 4, 3)).astype(np.float32)
    opac4 = np.clip(ops_[:, None] + rng.normal(0, 0.1, (n, 4)),
                    0.05, 0.95).astype(np.float32)
    rest = rng.normal(0, 0.03, (n, 15, 3)).astype(np.float32)
    cam = make_test_camera(width=96, height=64)

    prep = jax.jit(lambda m, s, q: projection.preprocess(m, s, q, cam))(
        means, scales, quats)
    n_invalid = int(np.sum(~np.asarray(prep.valid)))
    assert n_invalid >= 48

    base = dict(pair_capacity=1 << 13, chunk=256, backend="pallas",
                pallas_chunk=128, pallas_interpret=True)
    cfg_def = rasterize.RasterizeConfig(**base)
    cfg_exact = rasterize.RasterizeConfig(**base, dummy_slack=n_invalid)

    def run(cfg):
        out = fov.rasterize_fov(
            jnp.asarray(means), jnp.asarray(scales), jnp.asarray(quats),
            jnp.asarray(opac4), jnp.asarray(shs_dcs), jnp.asarray(rest),
            jnp.asarray(hl), cam, gaze=jnp.array([0.5, 0.5], jnp.float32),
            alpha=0.3, blending=True, config=cfg)
        return out["render"], out["binned"].overflow

    img_def, ov_def = jax.jit(lambda: run(cfg_def))()
    img_ex, ov_ex = jax.jit(lambda: run(cfg_exact))()
    assert int(ov_def) == 0 and int(ov_ex) == 0
    np.testing.assert_array_equal(np.asarray(img_ex), np.asarray(img_def))

    # Starved capacity: CAP2 floors at one kernel macro-chunk (4096); make
    # the candidate total exceed it and require the counter to fire.
    total = int(np.sum(np.asarray(prep.tiles_touched))) + n_invalid
    if total > 4096:
        cfg_tiny = rasterize.RasterizeConfig(
            pair_capacity=1, chunk=256, backend="pallas", pallas_chunk=128,
            pallas_interpret=True, dummy_slack=0)
        _, ov_tiny = jax.jit(lambda: run(cfg_tiny))()
        assert int(ov_tiny) == total - 4096


def test_fov_prefix_scan_matches_logmm():
    """blend_fov_pallas(prefix_mode='scan') — Hillis-Steele prefix product
    — must match the default log-space MXU prefix within the bf16 log-term
    tolerance (scan is exact f32; logmm rounds each log to bf16)."""
    from fovsplat.ops import foveated as fov
    from fovsplat.ops.pallas import blend_fov as pkf
    rng = np.random.default_rng(46)
    n = 300
    means, scales, quats, ops_, colors = synthetic_cloud(n=n, seed=46)
    hl = rng.integers(0, 4, (n,)).astype(np.float32)
    shs_dcs = rng.normal(0, 0.6, (n, 4, 3)).astype(np.float32)
    opac4 = np.clip(ops_[:, None] + rng.normal(0, 0.1, (n, 4)),
                    0.05, 0.95).astype(np.float32)
    rest = rng.normal(0, 0.03, (n, 15, 3)).astype(np.float32)
    cam = make_test_camera(width=96, height=64)
    cfg = rasterize.RasterizeConfig(pair_capacity=1 << 13, chunk=256,
                                    backend="pallas", pallas_chunk=128,
                                    pallas_interpret=True)
    model = fov.pack_fov_model(means, scales, quats, opac4, shs_dcs, rest,
                               hl)
    gaze = jnp.array([0.5, 0.5], jnp.float32)

    outs = {}
    for mode in ("logmm", "scan"):
        orig = pkf.blend_fov_pallas

        def patched(*a, _mode=mode, **kw):
            kw["prefix_mode"] = _mode
            return orig(*a, **kw)

        pkf_dict = pkf.__dict__
        pkf_dict["blend_fov_pallas"] = patched
        try:
            outs[mode] = jax.jit(lambda: fov.rasterize_fov_soa(
                model, cam, gaze=gaze, alpha=0.3, blending=True,
                config=cfg)["render"])()
        finally:
            pkf_dict["blend_fov_pallas"] = orig
    np.testing.assert_allclose(np.asarray(outs["scan"]),
                               np.asarray(outs["logmm"]),
                               rtol=0, atol=5e-3)


def test_fov_compact_capacity():
    """compact_capacity: a tight kept-pair budget reproduces the unshrunk
    output bit-for-bit with overflow=0; a starved budget trips the
    overflow counter (pairs drop, never reorder)."""
    from fovsplat.ops import foveated as fov
    rng = np.random.default_rng(47)
    n = 300
    means, scales, quats, ops_, colors = synthetic_cloud(n=n, seed=47)
    hl = rng.integers(0, 4, (n,)).astype(np.float32)
    shs_dcs = rng.normal(0, 0.6, (n, 4, 3)).astype(np.float32)
    opac4 = np.clip(ops_[:, None] + rng.normal(0, 0.1, (n, 4)),
                    0.05, 0.95).astype(np.float32)
    rest = rng.normal(0, 0.03, (n, 15, 3)).astype(np.float32)
    cam = make_test_camera(width=96, height=64)
    base = dict(pair_capacity=1 << 13, chunk=256, backend="pallas",
                pallas_chunk=128, pallas_interpret=True)
    model = fov.pack_fov_model(means, scales, quats, opac4, shs_dcs, rest,
                               hl)
    gaze = jnp.array([0.5, 0.5], jnp.float32)

    def run(cfg):
        out = fov.rasterize_fov_soa(model, cam, gaze=gaze, alpha=0.3,
                                    blending=True, config=cfg)
        return out["render"], out["num_pairs"], out["overflow"]

    img0, np0, ov0 = jax.jit(
        lambda: run(rasterize.RasterizeConfig(**base)))()
    kept = int(np0)
    assert kept > 0 and int(ov0) == 0
    # The kernel's unusable write margin is expand_chunk + 128.
    margin = rasterize.RasterizeConfig(**base).expand_chunk + 128
    # Tight: kept + margin, rounded up to 128.
    tight = ((kept + margin + 127) // 128) * 128
    img1, np1, ov1 = jax.jit(lambda: run(
        rasterize.RasterizeConfig(**base, compact_capacity=tight)))()
    assert int(ov1) == 0 and int(np1) == kept
    np.testing.assert_array_equal(np.asarray(img1), np.asarray(img0))

    starved = 1024
    if kept > starved - margin:
        img2, np2, ov2 = jax.jit(lambda: run(
            rasterize.RasterizeConfig(**base, compact_capacity=starved)))()
        assert int(ov2) == kept - (starved - margin)
        assert int(np2) <= starved - margin


def test_split3_reconstruction_exact():
    """_split3 parts must each be bf16-representable and sum back to the
    f32 input bit-exactly — the whole split-row kernel design rests on
    this (expand_fov module docstring)."""
    from fovsplat.ops.foveated import _split3
    rng = np.random.default_rng(3)
    vals = np.concatenate([
        rng.normal(0, 1e3, 20000).astype(np.float32),
        rng.uniform(0, 1 << 24, 20000).astype(np.float32).round(),
        np.float32([0.0, 1.0, -1.0, 0.01, 1e-20, 1e20, 3.14159265,
                    (1 << 24) - 1, 8191.0]),
    ])
    hi, mid, lo = jax.jit(_split3)(jnp.asarray(vals))
    hi, mid, lo = (np.asarray(v) for v in (hi, mid, lo))
    for part in (hi, mid, lo):
        as_bf16 = part.astype(jnp.bfloat16).astype(np.float32)
        np.testing.assert_array_equal(as_bf16, part)
    np.testing.assert_array_equal(hi + mid + lo, vals)


def test_quantized_inference_psnr():
    """Aggregate quality bound for the inference quantization ladder
    (u8 colors/opacities, bf16 conic, bf16 SH storage): the pallas paths
    must stay above 40 dB PSNR vs the f32 XLA oracle — far beyond the
    reference's own eval regime (PS1 renders score ~25 dB vs ground
    truth, BASELINE.md), so the ladder is invisible in any reported
    metric. Complements the worst-pixel atol tests above."""
    from fovsplat.ops import foveated as fov
    rng = np.random.default_rng(77)
    n = 1500
    means, scales, quats, ops_, colors = synthetic_cloud(n=n, seed=77)
    hl = rng.integers(0, 4, (n,)).astype(np.float32)
    shs_dcs = rng.normal(0, 0.6, (n, 4, 3)).astype(np.float32)
    opac4 = np.clip(ops_[:, None] + rng.normal(0, 0.1, (n, 4)),
                    0.05, 0.95).astype(np.float32)
    rest = rng.normal(0, 0.03, (n, 15, 3)).astype(np.float32)
    cam = make_test_camera(width=128, height=96)
    base = dict(pair_capacity=1 << 14, chunk=256)
    gaze = jnp.array([0.5, 0.5], jnp.float32)

    out_x = jax.jit(lambda: fov.rasterize_fov(
        jnp.asarray(means), jnp.asarray(scales), jnp.asarray(quats),
        jnp.asarray(opac4), jnp.asarray(shs_dcs), jnp.asarray(rest),
        jnp.asarray(hl), cam, gaze=gaze, alpha=0.3, blending=True,
        config=rasterize.RasterizeConfig(**base))["render"])()

    model = fov.pack_fov_model(means, scales, quats, opac4, shs_dcs, rest,
                               hl)
    out_p = jax.jit(lambda: fov.rasterize_fov_soa(
        model, cam, gaze=gaze, alpha=0.3, blending=True,
        config=rasterize.RasterizeConfig(
            **base, backend="pallas", pallas_chunk=128,
            pallas_interpret=True))["render"])()

    mse = float(jnp.mean((out_p - out_x) ** 2))
    psnr = 10.0 * np.log10(1.0 / max(mse, 1e-12))
    assert psnr > 40.0, f"quantized-path PSNR {psnr:.1f} dB < 40 dB"

    # ps1 single-level path: same bound.
    out_x1 = jax.jit(lambda: rasterize.rasterize(
        jnp.asarray(means), jnp.asarray(scales), jnp.asarray(quats),
        jnp.asarray(ops_), cam, colors=jnp.asarray(colors),
        config=rasterize.RasterizeConfig(**base))["render"])()
    out_p1 = jax.jit(lambda: rasterize.rasterize(
        jnp.asarray(means), jnp.asarray(scales), jnp.asarray(quats),
        jnp.asarray(ops_), cam, colors=jnp.asarray(colors),
        config=rasterize.RasterizeConfig(
            **base, backend="pallas", pallas_chunk=128,
            pallas_interpret=True, pallas_fwd_only=True))["render"])()
    mse1 = float(jnp.mean((out_p1 - out_x1) ** 2))
    psnr1 = 10.0 * np.log10(1.0 / max(mse1, 1e-12))
    assert psnr1 > 40.0, f"ps1 quantized-path PSNR {psnr1:.1f} dB < 40 dB"


def test_ps1_soa_matches_xla():
    """rasterize_ps1_soa (packed model + fused table kernel) vs the f32
    XLA oracle — same quantization ladder tolerance as the row-input
    fwd-only path (test_pallas_fwd_only_unaligned)."""
    rng = np.random.default_rng(88)
    n = 400
    means, scales, quats, ops_, colors = synthetic_cloud(n=n, seed=88)
    # SH model whose sh_to_rgb matches `colors`: dc = (colors - 0.5) / C0.
    from fovsplat.ops import sh as shm
    dc = ((np.asarray(colors) - 0.5) / shm.SH_C0)[:, None, :]
    rest = rng.normal(0, 0.03, (n, 15, 3)).astype(np.float32)
    cam = make_test_camera(width=96, height=64)
    base = dict(pair_capacity=1 << 13, chunk=256)
    bg = jnp.array([0.15, 0.05, 0.1])

    out_x = jax.jit(lambda: rasterize.rasterize(
        jnp.asarray(means), jnp.asarray(scales), jnp.asarray(quats),
        jnp.asarray(ops_), cam, shs=jnp.concatenate(
            [jnp.asarray(dc, jnp.float32), jnp.asarray(rest)], axis=1),
        bg_color=bg, config=rasterize.RasterizeConfig(**base))["render"])()

    model = rasterize.pack_ps1_model(means, scales, quats, ops_, dc, rest)
    out_p = jax.jit(lambda m: rasterize.rasterize_ps1_soa(
        m, cam, bg_color=bg, config=rasterize.RasterizeConfig(
            **base, backend="pallas", pallas_chunk=128,
            pallas_interpret=True, pallas_fwd_only=True))["render"])(model)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_x),
                               rtol=0, atol=1.2e-2)


def test_blend_pallas_unaligned_gradients():
    """blend_pallas over the RAW (unaligned) tile-sorted pair list must
    reproduce the chunk-aligned path bit-for-bit in forward AND gradients:
    the backward's boundary chunks are read-merge-written (grid programs
    run sequentially and every gradient write completes synchronously), so
    align_segments is no longer a correctness requirement."""
    means, scales, quats, ops_, colors = synthetic_cloud(n=300, seed=55)
    cam = make_test_camera(width=96, height=64)
    gx = (cam.width + 15) // 16
    gy = (cam.height + 15) // 16
    num_tiles = gx * gy
    cap = 1 << 13
    chunk = 128

    prep = jax.jit(lambda m, s, q: projection.preprocess(m, s, q, cam))(
        means, scales, quats)
    bn = jax.jit(lambda p: binning.bin_gaussians(p, gx, gy, cap))(prep)

    def packed_for(gid):
        g = jnp.minimum(gid, means.shape[0] - 1)
        return blend_fwd.pack_pairs(prep.mean2d[g], prep.conic[g],
                                    jnp.asarray(ops_)[g],
                                    jnp.asarray(colors)[g])

    def loss(packed, ss, se):
        c, T, _ = blend_fwd.blend_pallas(packed, ss, se, gx, gy, chunk,
                                         -4.5, True)
        return jnp.sum(c * jnp.cos(c)) + jnp.sum(T * 0.3), (c, T)

    # Aligned reference.
    acap = ((cap + num_tiles * chunk + chunk - 1) // chunk) * chunk
    bn2 = jax.jit(lambda b: binning.align_segments(b, chunk, num_tiles,
                                                   acap))(bn)
    pa = packed_for(bn2.pair_gauss)
    (la, (ca_, Ta)), ga = jax.value_and_grad(loss, has_aux=True)(
        pa, bn2.seg_start, bn2.seg_end)

    # Unaligned path.
    pu = packed_for(bn.pair_gauss)
    (lu, (cu, Tu)), gu = jax.value_and_grad(loss, has_aux=True)(
        pu, bn.seg_start[:-1], bn.seg_start[1:])

    np.testing.assert_allclose(np.asarray(cu), np.asarray(ca_),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(Tu), np.asarray(Ta),
                               rtol=1e-5, atol=1e-6)
    # Per-pair gradients: compare after scattering back to Gaussians
    # (the two layouts order pairs differently only by padding).
    from fovsplat.ops.pallas.blend_fwd import unpack_grads
    n = means.shape[0]

    def to_gauss(g, gid, valid_len):
        dm, dc, do, dcol = unpack_grads(g)
        gid = jnp.minimum(gid, n - 1)
        seg = lambda x: jax.ops.segment_sum(x, gid, num_segments=n)
        return (seg(dm), seg(dc), seg(do), seg(dcol))
    ga_g = to_gauss(ga, bn2.pair_gauss, None)
    gu_g = to_gauss(gu, bn.pair_gauss, None)
    for a, u in zip(ga_g, gu_g):
        np.testing.assert_allclose(np.asarray(u), np.asarray(a),
                                   rtol=1e-4, atol=1e-5)


def test_deep_saturated_segment_gradients_finite():
    """Hundreds of near-opaque pairs stacked in ONE tile: the pixel
    saturates (T < 1e-4) a few pairs in, n_contrib stays small, and the
    backward's T recovery must stay bounded. The round-2 backward
    recovered T as exp(+|chunk log-suffix|), which overflows f32 once a
    chunk stacks ~>=19 contributing pairs at alpha ~0.99; the round-3
    form divides by the running suffix product (backward.cu:503) and
    clamps at 1. Gradients must be finite and match the XLA oracle."""
    gx = gy = 1
    num_tiles = 1
    n_pairs = 600
    cap = 768  # unaligned segment start exercises the window floor
    start, end = 37, 37 + n_pairs
    rng = np.random.default_rng(7)

    mean2d = jnp.asarray(rng.uniform(2, 14, (cap, 2)), jnp.float32)
    conic = jnp.asarray(
        np.stack([rng.uniform(0.02, 0.06, cap),
                  np.zeros(cap),
                  rng.uniform(0.02, 0.06, cap)], -1), jnp.float32)
    op = jnp.asarray(rng.uniform(0.9, 0.99, cap), jnp.float32)
    col = jnp.asarray(rng.uniform(0, 1, (cap, 3)), jnp.float32)
    tile = jnp.where((jnp.arange(cap) >= start) & (jnp.arange(cap) < end),
                     0, num_tiles).astype(jnp.int32)
    seg = jnp.asarray([start, end], jnp.int32)

    def loss_x(m, c, o, cl):
        out = blend.blend(tile, m, c, o, cl, seg, jnp.int32(end),
                          gx, gy, 256, -4.5)
        return jnp.sum(out[0] * out[0]) + jnp.sum(out[1])

    def loss_p(m, c, o, cl):
        packed = blend_fwd.pack_pairs(m, c, o, cl)
        out = blend_fwd.blend_pallas(packed, seg[:1], seg[1:], gx, gy,
                                     128, -4.5, True)
        return jnp.sum(out[0] * out[0]) + jnp.sum(out[1])

    gx_ = jax.jit(jax.grad(loss_x, argnums=(0, 1, 2, 3)))(
        mean2d, conic, op, col)
    gp_ = jax.jit(jax.grad(loss_p, argnums=(0, 1, 2, 3)))(
        mean2d, conic, op, col)
    for a, b in zip(jax.tree.leaves(gx_), jax.tree.leaves(gp_)):
        assert np.all(np.isfinite(np.asarray(b)))
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-4, atol=1e-5)


def test_segment_reduce_matches_segment_sum():
    """Windowed interval-reduce over a sorted gid stream (the train
    backward's scatter replacement) vs jax.ops.segment_sum, including
    sparse gid jumps that force multi-block window advances."""
    from fovsplat.ops.pallas import segment_reduce as psr
    rng = np.random.default_rng(11)
    cap = 512 * 16 * 2
    n = 9000
    # clustered + sparse gids (long empty stretches), ascending. The
    # cluster sizes are deliberately NOT multiples of chunk=512, so the
    # jumps land strictly INSIDE a chunk — including one jump (40 ->
    # 2000 -> 8992) much wider than the kernel's WOUT window straddled
    # within a single 512-lane chunk (the round-3 silent-drop bug).
    n0, n1, n2 = cap // 2 + 17, cap // 4 - 300, 283
    raw = np.concatenate([
        rng.integers(0, 40, n0),
        rng.integers(2000, 2050, n1),
        rng.integers(5000, 5004, n2),
        rng.integers(n - 8, n, cap - n0 - n1 - n2)])
    gid = np.sort(raw).astype(np.int32)
    vals = rng.normal(0, 1, (9, cap)).astype(np.float32)
    rows = np.zeros((16, cap), np.float32)
    rows[0] = gid
    rows[1:10] = vals
    n_pad = ((n + 1 + psr.FLUSH - 1) // psr.FLUSH) * psr.FLUSH
    out = psr.reduce_by_sorted_gid(jnp.asarray(rows), n_pad=n_pad,
                                   interpret=True)
    for r in range(9):
        ref = jax.ops.segment_sum(jnp.asarray(vals[r]), jnp.asarray(gid),
                                  num_segments=n)
        np.testing.assert_allclose(np.asarray(out[1 + r, :n]),
                                   np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_camera_plane_gaussian_stays_finite():
    """A Gaussian sitting ON the camera plane (projective w ~ 0) produces
    inf/NaN projective values on its (culled) table row. The TPU MXU
    propagates NaN operands through ZERO one-hot columns (verified
    on-chip), so an unsanitized table row poisons every pair of its
    expansion chunk — this seeded the r3 pipeline run's non-finite
    gradient events. Render AND gradients must stay finite."""
    from fovsplat.data.cameras import look_at_camera
    means, scales, quats, ops_, colors = synthetic_cloud(n=200, seed=5)
    cam = look_at_camera([0.0, 0.0, -4.0], [0, 0, 0], [0, -1, 0],
                         fovx=1.1, fovy=0.9, width=96, height=64)
    # Row 0: exactly on the camera plane (view z = 0); row 1: just behind.
    means = jnp.asarray(means).at[0].set(jnp.asarray([1.0, 0.5, -4.0]))
    means = means.at[1].set(jnp.asarray([0.2, -0.1, -4.05]))
    cfg = rasterize.RasterizeConfig(pair_capacity=1 << 13, chunk=256,
                                    backend="pallas", pallas_chunk=128,
                                    pallas_interpret=True)

    def loss(m, s, q, o, c):
        out = rasterize.rasterize(m, s, q, o, cam, colors=c, config=cfg)
        return jnp.sum(out["render"] ** 2) + jnp.sum(out["final_T"])

    val, grads = jax.jit(jax.value_and_grad(
        loss, argnums=(0, 1, 2, 3, 4)))(means, scales, quats, ops_, colors)
    assert np.isfinite(float(val))
    for g in jax.tree.leaves(grads):
        assert np.all(np.isfinite(np.asarray(g)))


def test_fov_soa_compact_table_invariant():
    """compact_table=True (dummy-row drop, ops/pallas/compact_table) must
    not change the SoA render (parked perf experiment — keep it correct)."""
    means, scales, quats, ops_, colors = synthetic_cloud(n=260, seed=9)
    rng = np.random.default_rng(9)
    hl = jnp.asarray(rng.choice(4, size=(260,)), jnp.float32)
    dcs = jnp.asarray(rng.normal(0, 0.6, (260, 4, 3)), jnp.float32)
    op4 = jnp.asarray(rng.uniform(0.2, 0.95, (260, 4)), jnp.float32)
    rest = jnp.asarray(rng.normal(0, 0.04, (260, 15, 3)), jnp.float32)
    from tests.utils import make_test_camera
    cam = make_test_camera(width=96, height=64)
    from fovsplat.ops import foveated as fov
    model = fov.pack_fov_model(means, scales, quats, op4, dcs, rest, hl)
    base = dict(pair_capacity=1 << 13, backend="pallas", pallas_chunk=128,
                pallas_interpret=True, pallas_fwd_only=True,
                dummy_slack=8192)
    imgs = []
    for flag in (False, True):
        cfg = rasterize.RasterizeConfig(**base, compact_table=flag)
        out = jax.jit(lambda m, gz, c=cfg: fov.rasterize_fov_soa(
            m, cam, gaze=gz, alpha=0.05, blending=True, config=c))(
            model, jnp.array([0.5, 0.5], jnp.float32))
        imgs.append(np.asarray(out["render"]))
    np.testing.assert_allclose(imgs[1], imgs[0], rtol=0, atol=1e-6)


def test_compact_table_near_full_live():
    """compact_table with ~ALL rows valid: the live count fills n_pad, so
    the final staged block extends past n_pad. With the old default
    cap_out=n_pad the dst clamp shifted that block 128+ lanes low,
    overwriting the previous block's tail (round-3 advisor finding)."""
    from fovsplat.ops.pallas import compact_table as pct
    rng = np.random.default_rng(5)
    n_pad = 8192
    valid = np.ones(n_pad, bool)
    valid[[37, 4100, 8000]] = False          # live = n_pad - 3
    tnum = rng.integers(1, 9, n_pad).astype(np.float32) * valid
    dt = np.zeros((64, n_pad), np.float32)
    payload_rows = [r for r in range(64) if r not in (3, 4, 5, 45)]
    dt[payload_rows] = np.float32(np.float16(
        rng.normal(0, 1, (len(payload_rows), n_pad))))
    dt[45] = valid.astype(np.float32)
    dtb = jnp.asarray(dt).astype(jnp.bfloat16)
    dtc, live, total = pct.compact_table_pallas(
        dtb, jnp.asarray(tnum)[None, :], flag_row=45, flag_thresh=0.5,
        interpret=True)
    live = int(live)
    assert live == int(valid.sum())
    assert int(total) == int(tnum.sum())
    keep_idx = np.nonzero(valid)[0]
    out = np.asarray(dtc, np.float32)
    # Payload rows (everything but the rebuilt cum splits 3-5) must be an
    # exact permutation-compaction of the surviving input columns.
    for r in payload_rows + [45]:
        ref = np.asarray(dtb[r], np.float32)[keep_idx]
        np.testing.assert_array_equal(out[r, :live], ref)
    # Rebuilt cum rows: exclusive prefix of the kept tnums, exact.
    cum = out[3, :live] + out[4, :live] + out[5, :live]
    ref_cum = np.concatenate([[0.0], np.cumsum(tnum[keep_idx])[:-1]])
    np.testing.assert_array_equal(cum, ref_cum.astype(np.float32))
    # Lanes in [live, ceil128(live)+zero-tail) must be zeroed (NaN there
    # would poison the expand one-hot matmul).
    assert np.all(out[:, ((live + 127) // 128) * 128:] == 0.0)


def test_naive_shared_layout_matches_broadcast():
    """SM-FR shared-color SoA packing (pack_fov_model(shared_colors=True),
    48-row table, fov_num layout 1 / cull 4) must render the same image as
    the broadcast emulation (per-level arrays all equal) on the 64-row
    layout — the naive baseline's structural speedup must be
    output-invariant."""
    from fovsplat.ops import foveated as fov
    rng = np.random.default_rng(47)
    n = 300
    means, scales, quats, ops_, colors = synthetic_cloud(n=n, seed=47)
    hl = jnp.asarray(rng.choice(4, size=(n,)), jnp.float32)
    dc1 = jnp.asarray(rng.normal(0, 0.6, (n, 1, 3)), jnp.float32)
    op1 = jnp.asarray(rng.uniform(0.2, 0.95, (n, 1)), jnp.float32)
    rest = jnp.asarray(rng.normal(0, 0.04, (n, 15, 3)), jnp.float32)
    from tests.utils import make_test_camera
    cam = make_test_camera(width=96, height=64)
    cfg = rasterize.RasterizeConfig(pair_capacity=1 << 13, backend="pallas",
                                    pallas_chunk=128, pallas_interpret=True,
                                    pallas_fwd_only=True, dummy_slack=8192)
    args = (means, scales, quats)
    m_shared = fov.pack_fov_model(*args, op1, dc1, rest, hl,
                                  shared_colors=True)
    assert m_shared.col_t.shape[0] == 64      # CROWS padding
    m_bcast = fov.pack_fov_model(
        *args, jnp.broadcast_to(op1, (n, 4)),
        jnp.broadcast_to(dc1, (n, 4, 3)), rest, hl)
    gaze = jnp.array([0.45, 0.55], jnp.float32)
    imgs = []
    for m in (m_shared, m_bcast):
        out = jax.jit(lambda mm, gz: fov.rasterize_fov_soa(
            mm, cam, gaze=gz, alpha=0.05, blending=True, config=cfg))(
            m, gaze)
        assert int(out["overflow"]) == 0
        imgs.append(np.asarray(out["render"]))
    np.testing.assert_allclose(imgs[0], imgs[1], rtol=0, atol=1e-5)


def test_fov_soa_drop_invalid_invariant():
    """expand_drop_invalid=True (no dummy pairs for invalid rows; window
    marker guard) must render identically to the dummy scheme, with a
    zero window-miss count, on a cloud with plenty of invalid rows
    (dead hl=-1 rows + off-frustum Gaussians)."""
    from fovsplat.ops import foveated as fov
    rng = np.random.default_rng(53)
    n = 400
    means, scales, quats, ops_, colors = synthetic_cloud(n=n, seed=53)
    means = np.asarray(means).copy()
    means[150:210] += 40.0              # off-frustum -> invalid rows
    hl = rng.choice(4, size=(n,)).astype(np.float32)
    hl[300:350] = -1.0                  # dead rows (live-mask fold)
    dcs = rng.normal(0, 0.6, (n, 4, 3)).astype(np.float32)
    op4 = rng.uniform(0.2, 0.95, (n, 4)).astype(np.float32)
    rest = rng.normal(0, 0.04, (n, 15, 3)).astype(np.float32)
    from tests.utils import make_test_camera
    cam = make_test_camera(width=96, height=64)
    model = fov.pack_fov_model(jnp.asarray(means), scales, quats,
                               jnp.asarray(op4), jnp.asarray(dcs),
                               jnp.asarray(rest), jnp.asarray(hl))
    base = dict(pair_capacity=1 << 13, backend="pallas", pallas_chunk=128,
                pallas_interpret=True, pallas_fwd_only=True,
                dummy_slack=8192)
    outs = []
    for flag in (False, True):
        cfg = rasterize.RasterizeConfig(**base, expand_drop_invalid=flag)
        out = jax.jit(lambda m, gz, c=cfg: fov.rasterize_fov_soa(
            m, cam, gaze=gz, alpha=0.05, blending=True, config=c))(
            model, jnp.array([0.5, 0.5], jnp.float32))
        assert int(out["overflow"]) == 0     # no window misses
        outs.append(out)
    assert int(outs[1]["num_pairs"]) == int(outs[0]["num_pairs"])
    assert int(outs[1]["candidates"]) < int(outs[0]["candidates"])
    np.testing.assert_allclose(np.asarray(outs[1]["render"]),
                               np.asarray(outs[0]["render"]),
                               rtol=0, atol=1e-6)


def test_train_drop_invalid_invariant():
    """The TRAIN path's dummy-free expansion (round 5): with scattered
    invalid rows (off-frustum + dead live-mask rows), drop_invalid=True
    must produce bitwise-identical images AND gradients to the dummy
    scheme, with zero window misses; the candidate stream must shrink."""
    rng = np.random.default_rng(77)
    n = 512
    means, scales, quats, ops_, colors = synthetic_cloud(n=n, seed=77)
    means = np.asarray(means).copy()
    means[100:160] += 40.0              # off-frustum -> invalid rows
    live = np.ones(n, bool)
    live[400:460] = False               # dead rows
    from tests.utils import make_test_camera
    cam = make_test_camera(width=96, height=64)
    base = dict(pair_capacity=1 << 13, backend="pallas", pallas_chunk=128,
                pallas_interpret=True, dummy_slack=None)

    def loss_for(flag):
        cfg = rasterize.RasterizeConfig(**base, expand_drop_invalid=flag)

        def f(m, s, q, o, c):
            out = rasterize.rasterize(m, s, q, o, cam, colors=c,
                                      config=cfg,
                                      live_mask=jnp.asarray(live))
            return (jnp.sum(out["render"] ** 2) + jnp.sum(out["final_T"]),
                    out)
        args = (jnp.asarray(means), scales, quats, ops_, colors)
        (val, out), grads = jax.jit(
            lambda *a: jax.value_and_grad(f, argnums=(0, 3),
                                          has_aux=True)(*a))(*args)
        return val, out, grads

    v0, out0, g0 = loss_for(False)
    v1, out1, g1 = loss_for(True)
    assert int(out0["binned"].overflow) == 0
    assert int(out1["binned"].overflow) == 0      # no window misses
    assert int(out1["binned"].num_pairs) == int(out0["binned"].num_pairs)
    np.testing.assert_array_equal(np.asarray(out1["render"]),
                                  np.asarray(out0["render"]))
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
