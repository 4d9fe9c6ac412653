"""Multi-chip training: replicated params, view-sharded batch, psum grads.

The reference is strictly single-GPU (SURVEY.md §2.5) — this axis is new
design. The primary scaling mode for Gaussian-splat *training* on a TPU
slice is data parallelism over camera views: parameters (the Gaussian cloud)
are replicated, each device renders a different view of the same scene, and
gradients are all-reduced over ICI (`jax.lax.pmean` inside `shard_map`,
overlapped with the backward by XLA async collectives). This multiplies
training throughput by the device count — the reference processes one view
per step.

Gaussian/tile-sharded single-frame rendering (latency scaling) lives in
fovsplat.parallel.tile_shard.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from fovsplat.data.cameras import Camera
from fovsplat.models.gaussians import GaussianParams
from fovsplat.train import optim, trainer


def make_mesh(n_devices: int | None = None, axis: str = "data") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(devs, (axis,))


def stack_cameras(cams: list[Camera]) -> Camera:
    """Stack equal-resolution cameras into one batched Camera pytree."""
    assert len({(c.width, c.height) for c in cams}) == 1, \
        "batched cameras must share resolution"
    import numpy as np
    return Camera(
        world_view=np.stack([np.asarray(c.world_view) for c in cams]),
        full_proj=np.stack([np.asarray(c.full_proj) for c in cams]),
        cam_center=np.stack([np.asarray(c.cam_center) for c in cams]),
        tan_fovx=np.stack([np.asarray(c.tan_fovx) for c in cams]),
        tan_fovy=np.stack([np.asarray(c.tan_fovy) for c in cams]),
        width=cams[0].width, height=cams[0].height,
    )


def _index_camera(cams: Camera, i) -> Camera:
    return Camera(world_view=cams.world_view[i], full_proj=cams.full_proj[i],
                  cam_center=cams.cam_center[i], tan_fovx=cams.tan_fovx[i],
                  tan_fovy=cams.tan_fovy[i], width=cams.width,
                  height=cams.height)


def make_dp_train_step(mesh: Mesh, cfg: trainer.TrainConfig, axis: str = "data"):
    """Jitted data-parallel step: (params, opt_state, batched_cams (B,...),
    gts (B,H,W,3), step) -> (params, opt_state, aux). B must equal the mesh
    size; each device renders its local view(s) sequentially via lax.map."""
    inner = trainer.make_train_step(cfg, axis_name=axis)

    def device_step(params, opt_state, cams, gts, step_idx):
        # cams/gts here are the per-device shards (B_local, ...).
        def one_view(i):
            cam = _index_camera(cams, i)

            def objective(p):
                out = trainer.render_params(p, cam, cfg)
                from fovsplat.train import losses
                return losses.photometric_loss(out["render"], gts[i],
                                               cfg.lambda_dssim)

            return jax.value_and_grad(objective)(params)

        b_local = gts.shape[0]
        if b_local == 1:
            loss, grads = one_view(0)
        else:
            # lax.map over the local views: ONE traced body regardless of
            # B_local (a Python loop grew the graph — and compile time —
            # linearly in the per-device batch).
            losses_v, grads_v = jax.lax.map(
                one_view, jnp.arange(b_local, dtype=jnp.int32))
            loss = jnp.mean(losses_v)
            grads = jax.tree.map(lambda g: jnp.mean(g, axis=0), grads_v)
        grads = jax.lax.pmean(grads, axis)
        loss = jax.lax.pmean(loss, axis)
        lrs = optim.learning_rates(params, step_idx, cfg.optim,
                                   cfg.spatial_lr_scale)
        new_params, new_state = optim.apply_updates(params, grads, opt_state,
                                                    lrs, cfg.optim)
        return new_params, new_state, {"loss": loss}

    del inner
    spec_rep = P()
    spec_batch = P(axis)

    def step(params, opt_state, cams, gts, step_idx):
        # Build specs with the same pytree structure as the inputs (the
        # Camera pytree carries static width/height aux data, so specs must
        # be constructed from the actual instance).
        rep = lambda tree: jax.tree.map(lambda _: spec_rep, tree)
        cam_specs = jax.tree.map(lambda _: spec_batch, cams)
        sharded = jax.shard_map(
            device_step, mesh=mesh,
            in_specs=(rep(params), rep(opt_state), cam_specs, spec_batch,
                      spec_rep),
            out_specs=(rep(params), rep(opt_state), {"loss": spec_rep}),
            check_vma=False)
        return sharded(params, opt_state, cams, gts, step_idx)

    return jax.jit(step)
