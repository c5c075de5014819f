#!/usr/bin/env python
"""Export per-slide attention heatmaps from a trained checkpoint.

Counterpart of CLAM's heatmap CLI (reference: CLAM/create_heatmaps.py) for the
features-only pipeline: loads a fold checkpoint, runs the model's attention
forward over every slide, and writes ``<out>/<slide>_attn.{npy,csv}`` grids
(utils/heatmap.py).

    python tools/export_attention.py --ckpt out/fold_0_model_best.ckpt \
        --model abmil --csv_path labels.csv --dataset_root store/ --out attn/

With ``--image_dir`` (raster slide images) it additionally writes blended
``<slide>_overlay.png`` heatmaps and a ``<slide>_rois.csv`` of sampled ROIs
(reference CLAM/create_heatmaps.py:35-437 + wsi_utils.py:138 sample_rois).
"""

from __future__ import annotations

import argparse
import os
import sys
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mhim_mil_tpu.utils.platform import honor_env_platform  # noqa: E402

honor_env_platform()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default=None,
                    help="fold checkpoint; omitted = random init (smoke runs)")
    ap.add_argument("--out", required=True)
    ap.add_argument("--model", default="abmil")
    ap.add_argument("--baseline", default="selfattn")
    ap.add_argument("--csv_path", default=None)
    ap.add_argument("--dataset_root", default=None)
    ap.add_argument("--datasets", default="c16")
    ap.add_argument("--input_dim", type=int, default=1024)
    ap.add_argument("--inner_dim", type=int, default=512)
    ap.add_argument("--image_dir", default=None,
                    help="raster slide images: also render blended overlays")
    ap.add_argument("--patch_size", type=int, default=256)
    ap.add_argument("--vis_level", type=int, default=-1,
                    help="pyramid level for the blended overlay (banded "
                    "renderer); -1 = thumbnail path (reference "
                    "create_heatmaps.py vis_level)")
    ap.add_argument("--alpha", type=float, default=0.4)
    ap.add_argument("--cmap", default="coolwarm")
    ap.add_argument("--sample_rois", default=None,
                    choices=[None, "topk", "reverse_topk", "range_sample"])
    ap.add_argument("--roi_k", type=int, default=5)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from mhim_mil_tpu.config import load_config
    from mhim_mil_tpu.models import build_model
    from mhim_mil_tpu.utils.checkpoint import load_checkpoint
    from mhim_mil_tpu.utils.heatmap import export_heatmap

    cfg = load_config(
        [], model=args.model, baseline=args.baseline, input_dim=args.input_dim,
        inner_dim=args.inner_dim, datasets=args.datasets, csv_path=args.csv_path,
        dataset_root=args.dataset_root,
    )
    model, family = build_model(cfg)
    if args.ckpt:
        payload = load_checkpoint(args.ckpt)
        variables = {"params": payload["params"], **payload["model_state"]}
    else:
        print("WARNING: no --ckpt given — exporting attention of a RANDOM "
              "init (smoke-test mode)")
        init_kw = {}
        if family in ("mhim", "mhim_pure"):
            from mhim_mil_tpu.models.mhim import MHIM

            init_kw["method"] = MHIM.forward_test
        variables = jax.jit(partial(model.init, **init_kw))(
            jax.random.PRNGKey(0),
            jnp.zeros((1, 8, cfg.input_dim), jnp.float32),
            jnp.ones((1, 8), bool),
        )

    if family in ("mhim", "mhim_pure"):
        from mhim_mil_tpu.models.mhim import MHIM

        fwd = jax.jit(
            lambda x, m: model.apply(
                variables, x, m, return_attn=True, method=MHIM.forward_test
            )
        )
    else:
        fwd = jax.jit(
            lambda x, m: model.apply(variables, x, m, training=False, return_attn=True)
        )

    from mhim_mil_tpu.data.readers import FeatureBagStore, build_cls_slides
    from mhim_mil_tpu.data.splits import read_csv

    df = read_csv(cfg.csv_path)
    store = FeatureBagStore(cfg.dataset_root)
    slides = build_cls_slides(
        store, df["ID"].tolist(), df["Label"].tolist(), cfg.datasets, with_pos=True
    )
    for s in slides:
        feats = jnp.asarray(s["feats"][None])
        mask = jnp.ones((1, feats.shape[1]), bool)
        out = fwd(feats, mask)
        attn = np.asarray(out["attn"], np.float32)
        if attn.ndim == 3:  # [B,H,N] multi-head -> mean over heads
            attn = attn.mean(axis=1)
        sid = os.path.splitext(s["slide"])[0]
        scores = attn[0][: feats.shape[1]]
        export_heatmap(args.out, sid, scores, s.get("pos"))
        # blended overlay + ROI sampling when the raster image and level-0
        # pixel coords are available
        px_coords = store.pixel_coords(s["slide"])
        if args.image_dir and px_coords is not None:
            from PIL import Image

            from mhim_mil_tpu.utils.heatmap import (
                render_heatmap_overlay,
                sample_rois,
            )

            for ext in (".png", ".jpg", ".jpeg", ".tif", ".tiff", ".svs"):
                ip = os.path.join(args.image_dir, sid + ext)
                if os.path.exists(ip):
                    # pyramidal TIFFs render on a downsampled level through
                    # the native reader; coords scale with it (reference
                    # visHeatmap downscales the same way,
                    # WholeSlideImage.py:523-540)
                    from mhim_mil_tpu.preprocess.tiff import open_slide

                    slide = open_slide(ip)
                    if 0 <= args.vis_level < slide.level_count and hasattr(
                        slide, "_read_level"
                    ):
                        # banded render at the requested pyramid level
                        # (reference visHeatmap blends block-wise at
                        # vis_level, WholeSlideImage.py:487-677)
                        from mhim_mil_tpu.utils.heatmap import (
                            render_heatmap_pyramidal,
                        )

                        over = render_heatmap_pyramidal(
                            slide, px_coords, scores,
                            patch_size=args.patch_size,
                            vis_level=args.vis_level,
                            alpha=args.alpha, cmap=args.cmap,
                        )
                    else:
                        img = slide.get_thumbnail(4096)
                        scale = max(
                            1, int(round(slide.dimensions[0] / img.shape[1]))
                        )
                        over = render_heatmap_overlay(
                            img, px_coords // scale, scores,
                            max(args.patch_size // scale, 1),
                            alpha=args.alpha, cmap=args.cmap,
                        )
                    slide.close()
                    op = os.path.join(args.out, f"{sid}_overlay.png")
                    Image.fromarray(over).save(op)
                    print(f"  overlay -> {op}")
                    break
            if args.sample_rois:
                rois = sample_rois(
                    scores, px_coords, k=args.roi_k, mode=args.sample_rois
                )
                rp = os.path.join(args.out, f"{sid}_rois.csv")
                with open(rp, "w") as f:
                    f.write("x,y,score\n")
                    for (x, y), sc in zip(
                        rois["sampled_coords"], rois["sampled_scores"]
                    ):
                        f.write(f"{x},{y},{sc}\n")
        print(f"exported {sid}")


if __name__ == "__main__":
    main()
