"""On-chip numerical parity: fused-Pallas foveated render (TPU) vs the
XLA oracle path (CPU) on one scene.

VERDICT round-1 item #3: the Pallas kernels were parity-tested only in
interpret mode on CPU; this script proves the same numerics where they
ship. Reports pixel PSNR (fused path quantizes colors to u8 / conics to
bf16 — docstring of ops/pallas/expand_fov — so the bar is >40 dB, not
bitwise), kept-pair counts, and runs the production expand configs.

Run with no JAX_PLATFORMS override so both the TPU and CPU backends load.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from fovsplat.data.cameras import look_at_camera
from fovsplat.ops import foveated as fov
from fovsplat.ops.rasterize import RasterizeConfig


def make_scene(n=80_000, seed=0):
    rng = np.random.default_rng(seed)
    means = rng.normal(0, 1.2, (n, 3)).astype(np.float32)
    scales = rng.uniform(0.004, 0.04, (n, 3)).astype(np.float32)
    quats = rng.normal(0, 1, (n, 4))
    quats = (quats / np.linalg.norm(quats, axis=1, keepdims=True)).astype(
        np.float32)
    hl = rng.choice(4, size=(n,),
                    p=[0.5992, 0.1832, 0.0434, 0.1742]).astype(np.float32)
    shs_dcs = rng.normal(0, 0.8, (n, 4, 3)).astype(np.float32)
    opac4 = rng.uniform(0.2, 0.95, (n, 4)).astype(np.float32)
    rest = rng.normal(0, 0.05, (n, 15, 3)).astype(np.float32)
    return means, scales, quats, opac4, shs_dcs, rest, hl


def psnr(a, b):
    mse = float(np.mean((np.asarray(a, np.float64) - np.asarray(b, np.float64)) ** 2))
    return 99.0 if mse == 0 else -10.0 * np.log10(mse)


def main():
    n = int(os.environ.get("PARITY_N", 80_000))
    W, H = 656, 528
    means, scales, quats, opac4, shs_dcs, rest, hl = make_scene(n)
    cam = look_at_camera([0.4, -0.3, -4.0], [0, 0, 0], [0, -1, 0],
                         fovx=1.1, fovy=0.9, width=W, height=H)
    gaze = jnp.array([0.5, 0.5], jnp.float32)
    alpha = 0.05

    cpu = jax.devices("cpu")[0]
    tpu = [d for d in jax.devices() if d.platform != "cpu"]
    tpu = tpu[0] if tpu else cpu
    print(f"oracle on {cpu}, pallas on {tpu}", flush=True)

    args = (means, scales, quats, opac4, shs_dcs, rest, hl)

    with jax.default_device(cpu):
        cfg_x = RasterizeConfig(pair_capacity=1 << 20, chunk=4096,
                                backend="xla", use_obb=True)
        oracle = np.asarray(jax.jit(lambda *a: fov.rasterize_fov(
            *a, cam, gaze=gaze, alpha=alpha, blending=True,
            config=cfg_x)["render"])(*a_cpu(args, cpu)))
    print("oracle done", flush=True)

    def report(tag, img, kept, ovf, dt):
        p = psnr(img, oracle)
        d = np.abs(np.asarray(img, np.float64) - np.asarray(oracle,
                                                            np.float64))
        print(f"{tag}: PSNR={p:.2f} dB kept={kept} overflow={ovf} "
              f"maxdiff={d.max():.4f} p99.9={np.percentile(d, 99.9):.5f} "
              f"frac>1/64={float((d > 1/64).mean()):.2e} "
              f"({dt:.1f}s)", flush=True)
        return p

    results = {}
    for chunk, batch in [(512, 16), (256, 16)]:
        cfg_p = RasterizeConfig(
            pair_capacity=1 << 20, backend="pallas", pallas_fwd_only=True,
            expand_chunk=chunk, expand_batch=batch,
            compact_capacity=1 << 20, dummy_slack=n + 8192)
        with jax.default_device(tpu):
            f = jax.jit(lambda *a: fov.rasterize_fov(
                *a, cam, gaze=gaze, alpha=alpha, blending=True,
                config=cfg_p))
            t0 = time.time()
            out = f(*a_cpu(args, tpu))
            img = np.asarray(out["render"])
            bn = out["binned"]
            kept = int(np.asarray(bn.num_pairs))
            ovf = int(np.asarray(bn.overflow))
        results[(chunk, batch)] = report(
            f"chunk={chunk} batch={batch}", img, kept, ovf, time.time() - t0)

    # Production SoA path (table kernel + fused expand) — what bench.py
    # actually times.
    cfg_s = RasterizeConfig(
        pair_capacity=1 << 20, backend="pallas", pallas_fwd_only=True,
        compact_capacity=1 << 20, dummy_slack=n + 8192)
    with jax.default_device(tpu):
        margs = a_cpu(args, tpu)
        model = jax.jit(fov.pack_fov_model)(
            margs[0], margs[1], margs[2], margs[3], margs[4], margs[5],
            margs[6])
        f = jax.jit(lambda m: fov.rasterize_fov_soa(
            m, cam, gaze=gaze, alpha=alpha, blending=True, config=cfg_s))
        t0 = time.time()
        out = f(model)
        img = np.asarray(out["render"])
        kept = int(np.asarray(out["num_pairs"]))
        ovf = int(np.asarray(out["overflow"]))
    results["soa"] = report("SoA/table-kernel", img, kept, ovf,
                            time.time() - t0)
    return results


def a_cpu(args, dev):
    return tuple(jax.device_put(jnp.asarray(a), dev) for a in args)


if __name__ == "__main__":
    main()
