"""End-to-end CLI pipeline smoke test on a synthetic Blender-format scene.

Builds a tiny NeRF-synthetic-style scene on disk (transforms_train.json +
PNGs rendered by the dense oracle), then runs the full pipeline driver with
--small budgets and checks every stage artifact appears (the reference's
filesystem-idempotency contract), then re-runs to confirm stages skip.
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fovsplat.ops import dense
from tests.utils import synthetic_cloud


def _build_scene(root, n_views=3, res=48):
    from PIL import Image

    means, scales, quats, ops_, colors = synthetic_cloud(n=200, seed=23)
    os.makedirs(os.path.join(root, "train"), exist_ok=True)
    frames = []
    for i in range(n_views):
        th = 2 * np.pi * i / n_views
        eye = np.array([3.5 * np.sin(th), 0.4, -3.5 * np.cos(th)])
        fwd = -eye / np.linalg.norm(eye)
        right = np.cross(fwd, [0, 1.0, 0])
        right /= np.linalg.norm(right)
        down = np.cross(fwd, right)
        # COLMAP cam axes -> c2w with Blender flip (see dataset.py reader).
        R_c2w = np.stack([right, down, fwd], axis=1)
        c2w = np.eye(4)
        c2w[:3, :3] = R_c2w
        c2w[:3, 3] = eye
        c2w_blender = c2w.copy()
        c2w_blender[:3, 1:3] *= -1
        frames.append({"file_path": f"train/r_{i}",
                       "transform_matrix": c2w_blender.tolist()})

        from fovsplat.data.cameras import make_camera
        w2c = np.linalg.inv(c2w)
        cam = make_camera(w2c[:3, :3].T, w2c[:3, 3], 0.9, 0.9, res, res)
        img = np.asarray(dense.render_dense(
            means, scales, quats, ops_, colors, cam,
            bg_color=jnp.zeros(3))["render"])
        Image.fromarray((np.clip(img, 0, 1) * 255).astype(np.uint8)).save(
            os.path.join(root, f"train/r_{i}.png"))

    meta = {"camera_angle_x": 0.9, "frames": frames}
    for split in ("train", "test"):
        with open(os.path.join(root, f"transforms_{split}.json"), "w") as f:
            json.dump(meta if split == "train" else
                      {"camera_angle_x": 0.9, "frames": frames[:1]}, f)
    return root


def test_pipeline_smoke(tmp_path, monkeypatch):
    """Default-suite orchestrator coverage (round-2 verdict #8): the REAL
    run_pipeline driver over a tiny scene with the heavy TRAINING LOOPS
    stubbed to identity (each loop's own math is covered by
    test_training_pipeline.py; compiling them all takes ~20 min on this
    4-core box — the full-compute variants stay @slow). What this
    exercises by default: scene load, stage chaining, ckpt save/load +
    PLY export, index tracking, compose, pnum/naive-FR generation, and
    the filesystem-idempotency resume contract
    (combined_training_script.py:82-149)."""
    from fovsplat import pipeline
    from fovsplat.models import state as S
    from fovsplat.ops.rasterize import RasterizeConfig
    from fovsplat.train import loops, optim

    from fovsplat.train import scratch

    # Identity stubs preserving each loop's signature/return shape; the
    # mask stub kills a fixed fraction so compose/pnum see a real ladder.
    monkeypatch.setattr(loops, "finetune",
                        lambda state, *a, **k: state)
    monkeypatch.setattr(scratch, "train_scratch",
                        lambda state, *a, **k: state)
    monkeypatch.setattr(loops, "prune_training",
                        lambda state, *a, **k: S.opacity_prune(state, 0.0))

    def fake_mask(state, *a, **k):
        scores = jnp.arange(state.capacity, dtype=jnp.float32)
        return S.metric_prune(state, scores, 0.25)

    monkeypatch.setattr(loops, "mask_training", fake_mask)
    monkeypatch.setattr(loops, "evaluate", lambda *a, **k: (0.9, 30.0))
    monkeypatch.setattr(
        loops, "make_eval_fns",
        lambda cfg: (lambda *a: {"ssim": 0.9, "psnr": 30.0},
                     lambda *a: 1e-5))

    scene_dir = _build_scene(str(tmp_path / "scene"), n_views=2, res=32)
    out_dir = str(tmp_path / "out")
    cfg = pipeline.PipelineConfig(scratch_iters=2, finetune_iters=1,
                                  hvs_ft_iters=1, masking_budget=3,
                                  eval_views_cap=1)
    lcfg = loops.LoopConfig(
        raster=RasterizeConfig(pair_capacity=1 << 12, chunk=256),
        optim=optim.OptimConfig(position_lr_max_steps=50))
    model, layers = pipeline.run_pipeline(scene_dir, out_dir, cfg=cfg,
                                          loop_cfg=lcfg, small=True)

    for artifact in ("base.npz", "pruned.npz", "ps1.npz",
                     "point_cloud_ps1.ply", "ours_composed.npz", "pnum.txt",
                     "naive_fr.npz", "log.txt"):
        assert os.path.exists(os.path.join(out_dir, artifact)), artifact
    assert model.shs_dcs.shape[1] == 4
    assert len(layers) == 4
    counts = [int(st.live_count()) for st in layers]
    assert counts[0] > counts[1] > counts[2] > counts[3] > 0

    # Idempotent resume: stages must skip.
    pipeline.run_pipeline(scene_dir, out_dir, cfg=cfg, loop_cfg=lcfg,
                          small=True)
    log = open(os.path.join(out_dir, "log.txt")).read()
    assert "[skip] base model exists" in log
    assert "[skip] pruned model exists" in log


@pytest.mark.slow
def test_pipeline_small(tmp_path):
    from fovsplat import pipeline
    from fovsplat.ops.rasterize import RasterizeConfig
    from fovsplat.train import loops, optim

    scene_dir = _build_scene(str(tmp_path / "scene"))
    out_dir = str(tmp_path / "out")
    cfg = pipeline.PipelineConfig(scratch_iters=40, finetune_iters=20,
                                  hvs_ft_iters=10, masking_budget=30,
                                  eval_views_cap=2)
    lcfg = loops.LoopConfig(
        raster=RasterizeConfig(pair_capacity=1 << 13, chunk=256),
        optim=optim.OptimConfig(position_lr_max_steps=100))
    model, layers = pipeline.run_pipeline(scene_dir, out_dir, cfg=cfg,
                                          loop_cfg=lcfg, small=True)

    for artifact in ("base.npz", "pruned.npz", "ps1.npz",
                     "point_cloud_ps1.ply", "ours_composed.npz", "pnum.txt",
                     "naive_fr.npz", "log.txt"):
        assert os.path.exists(os.path.join(out_dir, artifact)), artifact
    assert model.shs_dcs.shape[1] == 4
    assert len(layers) == 4

    # Idempotent resume: stages must skip.
    pipeline.run_pipeline(scene_dir, out_dir, cfg=cfg, loop_cfg=lcfg,
                          small=True)
    log = open(os.path.join(out_dir, "log.txt")).read()
    assert "[skip] base model exists" in log
    assert "[skip] pruned model exists" in log
