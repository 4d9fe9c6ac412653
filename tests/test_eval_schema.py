"""LPIPS graph validation (synthetic weights vs an independent torch
oracle) + result-JSON schema pins against the reference's checked-in
full_eval_results/layers_eval_results files (VERDICT r4 item 8).

The LPIPS weights file itself cannot be provisioned here (zero egress),
so the test proves the GRAPH — tap layout, z-score normalization,
channel-unit-normalize, 1x1 linear head, spatial mean, tap sum — with
small random weights against a from-scratch torch implementation of the
reference spec (lpipsPyTorch/modules/{lpips,networks,utils}.py). A real
weights drop-in at FOVSPLAT_LPIPS_WEIGHTS is then turnkey.
"""

import json
import os

import numpy as np
import pytest

REF = "/root/reference/fov3dgs"


def _synthetic_vgg_weights(rng):
    from fovsplat.eval import lpips_jax as L
    w = {}
    cin = 3
    taps = []
    for layer in L._VGG_LAYERS:
        if layer == "pool":
            continue
        name, cout = layer
        # He-ish scale keeps activations O(1) through 13 layers.
        w[name + "_w"] = rng.normal(
            0, 1.0 / np.sqrt(9 * cin), (3, 3, cin, cout)).astype(np.float32)
        w[name + "_b"] = rng.normal(0, 0.05, (cout,)).astype(np.float32)
        if name in L._TAPS:
            taps.append(cout)
        cin = cout
    for i, c in enumerate(taps):
        w[f"lin{i}_w"] = np.abs(rng.normal(0, 1.0 / c, (1, 1, c, 1))
                                ).astype(np.float32)
    return w


def _torch_lpips_oracle(w, a, b):
    """Independent implementation of the reference lpipsPyTorch spec
    (networks.py BaseNet.forward + utils.normalize_activation +
    lpips.py LPIPS.forward) in torch NCHW."""
    import torch
    from fovsplat.eval import lpips_jax as L

    def feats(x_np):
        x = torch.from_numpy(x_np.transpose(2, 0, 1))[None]   # (1,3,H,W)
        mean = torch.tensor(L._SHIFT)[None, :, None, None]
        std = torch.tensor(L._SCALE)[None, :, None, None]
        h = (x - mean) / std             # z_score on [0,1] input (quirk!)
        out = []
        for layer in L._VGG_LAYERS:
            if layer == "pool":
                h = torch.nn.functional.max_pool2d(h, 2, 2)
                continue
            name, _ = layer
            kw = torch.from_numpy(w[name + "_w"].transpose(3, 2, 0, 1))
            kb = torch.from_numpy(w[name + "_b"])
            h = torch.nn.functional.conv2d(h, kw, kb, padding=1)
            h = torch.relu(h)
            if name in L._TAPS:
                nrm = torch.sqrt(torch.sum(h ** 2, dim=1, keepdim=True))
                out.append(h / (nrm + 1e-10))
        return out

    fa, fb = feats(a), feats(b)
    total = 0.0
    for i, (x, y) in enumerate(zip(fa, fb)):
        d = (x - y) ** 2
        lin = torch.from_numpy(w[f"lin{i}_w"].reshape(-1))
        d = (d * lin[None, :, None, None]).sum(1, keepdim=True)
        total = total + d.mean().item()
    return total


def test_lpips_graph_matches_torch_oracle(tmp_path):
    from fovsplat.eval import lpips_jax
    rng = np.random.default_rng(7)
    w = _synthetic_vgg_weights(rng)
    path = tmp_path / "lpips_synth.npz"
    np.savez(path, **w)

    net = lpips_jax.LPIPS(str(path))
    a = rng.uniform(0, 1, (32, 32, 3)).astype(np.float32)
    b = np.clip(a + rng.normal(0, 0.1, a.shape), 0, 1).astype(np.float32)
    ours = float(net(a, b))
    ref = _torch_lpips_oracle(w, a, b)
    assert ours > 0
    np.testing.assert_allclose(ours, ref, rtol=2e-3, atol=1e-6)
    # Identical inputs -> 0 distance.
    assert abs(float(net(a, a))) < 1e-8


class _View:
    def __init__(self, camera, image, name):
        self.camera = camera
        self.image = image
        self.image_name = name


def _schema(x):
    """Nested key layout (dict keys; leaves -> type class)."""
    if isinstance(x, dict):
        return {k: _schema(v) for k, v in x.items()}
    return "leaf"


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference absent")
def test_quality_json_matches_reference_schema(tmp_path):
    """quality_eval's output files must have the reference's exact key
    layout (full_eval_results/ours-Q/bicycle_quality.json +
    bicycle_quality_per.json) so downstream tooling can switch without
    changes. LPIPS leaves may be null (weight-gated) — layout only."""
    from fovsplat.eval import quality

    rng = np.random.default_rng(3)
    gt = rng.uniform(0, 1, (64, 64, 3)).astype(np.float32)
    views = [_View(camera=None, image=gt, name=f"{i:05d}.png")
             for i in range(2)]
    quality.quality_eval(
        lambda cam: np.clip(gt + 0.01, 0, 1), views, str(tmp_path),
        "bicycle", hvs_pooling=1.0, tag="ps1")

    ours = json.load(open(tmp_path / "bicycle_quality.json"))
    ref = json.load(open(
        f"{REF}/full_eval_results/ours-Q/bicycle_quality.json"))
    assert _schema(ours) == _schema(ref), (ours, ref)

    ours_p = json.load(open(tmp_path / "bicycle_quality_per.json"))
    ref_p = json.load(open(
        f"{REF}/full_eval_results/ours-Q/bicycle_quality_per.json"))
    assert set(ours_p) == set(ref_p) == {"ps1"}
    assert set(ours_p["ps1"]) == set(ref_p["ps1"])
    for key in ref_p["ps1"]:
        # Same per-image mapping shape: image-name keys -> scalars.
        assert set(map(type, ours_p["ps1"][key])) <= {str}


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference absent")
def test_layer_json_matches_reference_schema(tmp_path):
    from fovsplat.eval import layers

    rng = np.random.default_rng(4)
    gt = rng.uniform(0, 1, (64, 64, 3)).astype(np.float32)
    views = [_View(camera=None, image=gt, name="00000.png")]

    def render_for_layer(i):
        return lambda cam: np.clip(gt + 0.01 * (i + 1), 0, 1)

    layers.eval_layers(render_for_layer, views, [1, 3], str(tmp_path),
                       "bicycle")
    ours = json.load(open(tmp_path / "bicycle_3.json"))
    ref = json.load(open(
        f"{REF}/layers_eval_results/naiveFR/bicycle_3.json"))
    assert _schema(ours) == _schema(ref), (ours, ref)
