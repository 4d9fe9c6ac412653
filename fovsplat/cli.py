"""fovsplat command-line interface.

Replaces the reference's script zoo (prune.py, eff_finetune.py,
metric_mask_learn.py, combined_training_script.py, render.py,
quality_eval.py, render_compose_gazes_fps*.py CLIs) with one entry point:

  python -m fovsplat.cli pipeline -s <scene> -m <out>   full MetaSapiens chain
  python -m fovsplat.cli render   -m <out> [--ply ...]  render test views
  python -m fovsplat.cli eval     -m <out> -s <scene>   quality JSONs
  python -m fovsplat.cli fps      -m <out> -s <scene>   foveated FPS bench
  python -m fovsplat.cli dryrun   [--devices N]         multi-chip dry run
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def _add_common(p):
    p.add_argument("-s", "--source", required=False, help="scene directory")
    p.add_argument("-m", "--model", required=True, help="model/output dir")
    p.add_argument("-r", "--resolution", type=int, default=-1)
    p.add_argument("--pair-capacity", type=int, default=1 << 21)
    p.add_argument("--chunk", type=int, default=2048)


def main(argv=None):
    ap = argparse.ArgumentParser(prog="fovsplat")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("pipeline", help="full training pipeline")
    _add_common(p)
    p.add_argument("--pretrained-ply", default=None)
    p.add_argument("--small", action="store_true",
                   help="tiny iteration budgets (smoke test)")

    p = sub.add_parser("render", help="render test views to PNG")
    _add_common(p)

    p = sub.add_parser("eval", help="quality eval -> JSON")
    _add_common(p)

    p = sub.add_parser("fps", help="foveated FPS benchmark")
    _add_common(p)
    p.add_argument("--mode", default="ours",
                   choices=["ours", "naive", "mmfr"])
    p.add_argument("--alpha", type=float, default=0.05)

    p = sub.add_parser("dryrun", help="multi-chip dry run")
    p.add_argument("--devices", type=int, default=8)

    p = sub.add_parser("vq", help="VQ-compress a checkpoint")
    _add_common(p)
    p.add_argument("--vq-ratio", type=float, default=0.6)
    p.add_argument("--codebook-size", type=int, default=8192)

    p = sub.add_parser("video", help="render an ellipse-path video")
    _add_common(p)
    p.add_argument("--frames", type=int, default=120)

    p = sub.add_parser("eval-layers", help="per-PS-layer quality eval")
    _add_common(p)

    args = ap.parse_args(argv)

    if args.cmd == "dryrun":
        os.environ.setdefault("XLA_FLAGS",
                              "--xla_force_host_platform_device_count="
                              f"{args.devices}")
        sys.path.insert(0, os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
        import __graft_entry__
        __graft_entry__.dryrun_multichip(args.devices)
        return 0

    from fovsplat.ops.rasterize import RasterizeConfig
    from fovsplat.train import loops as loops_mod
    rcfg = RasterizeConfig(pair_capacity=args.pair_capacity, chunk=args.chunk)

    if args.cmd == "pipeline":
        from fovsplat import pipeline
        pipeline.run_pipeline(args.source, args.model,
                              pretrained_ply=args.pretrained_ply,
                              resolution=args.resolution, small=args.small,
                              loop_cfg=None)
        return 0

    from fovsplat.data import dataset
    from fovsplat.models import checkpoint as ckpt
    scene = dataset.load_scene(args.source, resolution=args.resolution)
    lcfg = loops_mod.LoopConfig(raster=rcfg)

    if args.cmd in ("render", "eval"):
        from fovsplat.eval import quality
        state, _, _ = ckpt.load(os.path.join(args.model, "ps1.npz"))
        render = quality.make_ps1_render(state, rcfg)
        views = scene.test_views or scene.train_views
        if args.cmd == "render":
            from PIL import Image
            import numpy as np
            rd = os.path.join(args.model, "renders")
            os.makedirs(rd, exist_ok=True)
            for v in views:
                img = np.clip(np.asarray(render(v.camera)), 0, 1)
                Image.fromarray((img * 255).astype("uint8")).save(
                    os.path.join(rd, v.image_name + ".png"))
            print(f"wrote {len(views)} renders to {rd}")
        else:
            res = quality.quality_eval(render, views, args.model, "scene")
            print(json.dumps(res, indent=2))
        return 0

    if args.cmd == "vq":
        import numpy as np
        from fovsplat.models import checkpoint as ckpt_mod
        from fovsplat.models import state as S
        from fovsplat.models import vq as vq_mod
        from fovsplat.train import loops as lp, scratch
        state, _, _ = ckpt_mod.load(os.path.join(args.model, "ps1.npz"))
        gs, imp = scratch.global_significance_scores(
            state, scene.train_views[:10], lcfg)
        params, idx = S.compact(state)
        comp = vq_mod.compress(params, np.asarray(imp)[idx],
                               vq_ratio=args.vq_ratio,
                               codebook_size=args.codebook_size)
        out = os.path.join(args.model, "vq_compressed.npz")
        np.savez_compressed(out, **comp)
        raw = sum(np.asarray(getattr(params, f)).nbytes for f in
                  ("xyz", "features_dc", "features_rest", "scaling",
                   "rotation", "opacity"))
        print(json.dumps({"out": out,
                          "compressed_bytes": vq_mod.compressed_size_bytes(comp),
                          "raw_bytes": raw,
                          "ratio": raw / vq_mod.compressed_size_bytes(comp)}))
        return 0

    if args.cmd == "video":
        from fovsplat.eval import quality, video
        from fovsplat.models import checkpoint as ckpt_mod
        state, _, _ = ckpt_mod.load(os.path.join(args.model, "ps1.npz"))
        render = quality.make_ps1_render(state, rcfg)
        cams = video.ellipse_path(scene.train_views, n_frames=args.frames)
        n = video.render_video(render, cams,
                               os.path.join(args.model, "video"))
        print(f"wrote {n} frames")
        return 0

    if args.cmd == "eval-layers":
        from fovsplat.eval import layers as layers_mod
        from fovsplat.models import checkpoint as ckpt_mod
        from fovsplat.train import compose as compose_mod
        from fovsplat import pipeline as pl_mod
        state, _, _ = ckpt_mod.load(os.path.join(args.model, "ps1.npz"))
        hl, dcs, opc, live = compose_mod.load_composed_arrays(
            os.path.join(args.model, "ours_composed.npz"))
        model = compose_mod.ComposedModel(params=state.params, live=live,
                                          highest_levels=hl, shs_dcs=dcs,
                                          opacities=opc)
        ladder = pl_mod.pooling_ladder(pl_mod.PipelineConfig())
        res = layers_mod.eval_layers(
            lambda i: layers_mod.layer_render_ours(state.params, live, model,
                                                   i, rcfg),
            scene.test_views or scene.train_views, ladder,
            os.path.join(args.model, "layers_eval"), "scene")
        print(json.dumps({str(k): v for k, v in res.items()}))
        return 0

    if args.cmd == "fps":
        import jax.numpy as jnp
        from fovsplat.eval import fps as fps_mod
        from fovsplat.train import compose as compose_mod
        state, _, _ = ckpt.load(os.path.join(args.model, "ps1.npz"))
        hl, dcs, opac, live = compose_mod.load_composed_arrays(
            os.path.join(args.model, "ours_composed.npz"))
        model = compose_mod.ComposedModel(
            params=state.params, live=live, highest_levels=hl,
            shs_dcs=dcs, opacities=opac)
        if args.mode == "mmfr":
            models = fps_mod.mmfr_models_from_composed(state.params, model)
            render = fps_mod.make_mmfr_render(models, rcfg,
                                              alpha=args.alpha)
        else:
            render = fps_mod.make_fov_render(state.params, model, rcfg,
                                             alpha=args.alpha,
                                             mode=args.mode)
        cams = [v.camera for v in (scene.test_views or scene.train_views)]
        res = fps_mod.fps_benchmark(render, cams)
        print(json.dumps(res))
        with open(os.path.join(args.model, f"fps_{args.mode}.json"), "w") as f:
            json.dump(res, f)
        return 0


if __name__ == "__main__":
    sys.exit(main())
