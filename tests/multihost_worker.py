"""Worker process for the 2-process multi-host integration test.

Launched by tests/test_multihost.py as `python tests/multihost_worker.py
<port> <num_procs> <pid>` with a clean CPU-backend env (2 virtual devices
per process). Initializes jax.distributed against the shared localhost
coordinator, then proves the two cross-host code paths:

  1. DP train step (parallel/data_parallel.make_dp_train_step) over the
     4-device global mesh — gradient pmean rides the process boundary.
  2. Tile-sharded forward render (parallel/tile_shard) — the pair
     all-to-all and image all-gather ride the process boundary.

Prints one line `OK <loss> <maxdiff>`; the launcher asserts rc=0 on both
workers and identical loss values (replicated outputs must agree)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    port, nproc, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    os.environ["FOVSPLAT_COORDINATOR"] = f"127.0.0.1:{port}"
    os.environ["FOVSPLAT_NUM_PROCESSES"] = str(nproc)
    os.environ["FOVSPLAT_PROCESS_ID"] = str(pid)

    import jax
    jax.config.update("jax_platforms", "cpu")
    from fovsplat.parallel import multihost

    assert multihost.initialize_from_env()
    assert jax.process_count() == nproc, jax.process_count()
    ndev = jax.device_count()
    nloc = jax.local_device_count()
    assert ndev == nproc * nloc, (ndev, nloc)

    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P
    from fovsplat.models.gaussians import GaussianParams
    from fovsplat.ops import rasterize
    from fovsplat.parallel import data_parallel as dp, tile_shard
    from fovsplat.train import optim, trainer
    from tests.utils import make_test_camera, synthetic_cloud

    mesh = multihost.global_mesh()

    # ---- 1. DP train step across processes -------------------------------
    n = 128
    means, scales, quats, ops_, colors = synthetic_cloud(n=n, seed=4)
    params_h = GaussianParams(
        xyz=jnp.asarray(means),
        features_dc=jnp.asarray(((colors - 0.5) / 0.2821))[:, None, :],
        features_rest=jnp.zeros((n, 15, 3), jnp.float32),
        scaling=jnp.log(jnp.asarray(scales)),
        rotation=jnp.asarray(quats),
        opacity=jnp.asarray(np.log(ops_ / (1 - ops_)))[:, None])
    params = multihost.replicate_tree(mesh, params_h)
    opt_state = multihost.replicate_tree(mesh, optim.init_state(params_h))
    cams_h = dp.stack_cameras([make_test_camera(width=48, height=48,
                                                dist=3.6 + 0.1 * i)
                               for i in range(ndev)])
    lo = pid * nloc

    def shard_cam(x):
        return multihost.to_global(mesh, P("data"),
                                   np.asarray(x)[lo:lo + nloc])

    import dataclasses
    cams = dataclasses.replace(
        cams_h,
        world_view=shard_cam(cams_h.world_view),
        full_proj=shard_cam(cams_h.full_proj),
        cam_center=shard_cam(cams_h.cam_center),
        tan_fovx=shard_cam(cams_h.tan_fovx),
        tan_fovy=shard_cam(cams_h.tan_fovy))
    gts = multihost.to_global(
        mesh, P("data"),
        np.full((nloc, 48, 48, 3), 0.4, np.float32))

    cfg = trainer.TrainConfig(
        raster=rasterize.RasterizeConfig(pair_capacity=1 << 12, chunk=256))
    step = dp.make_dp_train_step(mesh, cfg)
    _, _, aux = step(params, opt_state, cams, gts,
                     multihost.to_global(mesh, P(), np.int32(1)))
    loss = float(np.asarray(jax.device_get(
        aux["loss"].addressable_data(0))))
    assert np.isfinite(loss), loss

    # ---- 2. tile-sharded render across processes -------------------------
    cam = make_test_camera(width=96, height=64)
    shard_rows = lambda x: multihost.to_global(
        mesh, P("data"), np.asarray(x).reshape(ndev, -1,
                                               *np.asarray(x).shape[1:])
        [lo:lo + nloc].reshape(nloc * (n // ndev),
                               *np.asarray(x).shape[1:]))
    img, aux_r = tile_shard.render_tile_sharded(
        mesh, shard_rows(means), shard_rows(scales), shard_rows(quats),
        shard_rows(ops_), shard_rows(colors), cam,
        pair_capacity=1 << 12)
    ovf = int(np.asarray(jax.device_get(aux_r["overflow"]
                                        .addressable_data(0))))
    assert ovf == 0, ovf
    img_local = np.asarray(jax.device_get(img.addressable_data(0)))

    # Single-process reference, computed locally on one device.
    ref = rasterize.rasterize(
        jnp.asarray(means), jnp.asarray(scales), jnp.asarray(quats),
        jnp.asarray(ops_), cam, colors=jnp.asarray(colors),
        config=rasterize.RasterizeConfig(pair_capacity=1 << 14, chunk=256))
    ref_img = np.asarray(jax.device_get(ref["render"]))
    maxdiff = float(np.max(np.abs(img_local - ref_img)))
    assert maxdiff < 1e-4, maxdiff

    print(f"OK {loss:.6f} {maxdiff:.2e}", flush=True)


if __name__ == "__main__":
    main()
