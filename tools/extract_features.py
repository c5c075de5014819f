"""Raster-image preprocessing CLI: segment → patch coords → encoder sweep →
CLAM-layout feature store (pt_files/ + h5_files/).

The framework equivalent of the reference's two offline CLIs
(`CLAM/create_patches_fp.py:48-286` seg+patch and
`CLAM/extract_features_fp.py:83-177` encoder sweep), for plain raster images
(PNG/JPEG/TIFF readable by PIL). Pyramidal WSI decode (OpenSlide) is not
available in this environment — point ``--source`` at level-0 exports or use
the published CPathPatchFeature stores (reference README:61-64).

Usage:
  python tools/extract_features.py --source DIR_OF_IMAGES --save_dir OUT \
      --encoder resnet50_trunc [--ckpt_path w.pt] [--patch_size 256] \
      [--step_size 256] [--batch_size 256] [--coverage 0.5]

Produces OUT/pt_files/<id>.pt and OUT/h5_files/<id>.h5 (+coords/attrs) —
exactly what data/readers.py consumes for training.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mhim_mil_tpu.preprocess.encoders import get_encoder  # noqa: E402
from mhim_mil_tpu.preprocess.extract import (  # noqa: E402
    extract_features,
    save_feature_store,
)
from mhim_mil_tpu.preprocess.segment import (  # noqa: E402
    generate_patch_coords,
    segment_tissue,
)

IMG_EXTS = (".png", ".jpg", ".jpeg", ".tif", ".tiff", ".bmp")


def process_slide(path, fn, norm, args):
    from PIL import Image

    img = np.asarray(Image.open(path).convert("RGB"))
    # Segment on a bounded thumbnail (reference segments at a low pyramid
    # level, WholeSlideImage.py:91-183).
    thumb_max = 2048
    scale = max(1, max(img.shape[:2]) // thumb_max)
    thumb = img[::scale, ::scale]
    mask = segment_tissue(thumb, sthresh=args.sthresh)
    grid = generate_patch_coords(
        mask, img.shape[:2], args.patch_size, args.step_size, args.coverage
    )
    coords = grid["coords"]
    if len(coords) == 0:
        return None, 0
    feats = extract_features(
        fn, img, coords, args.patch_size, args.batch_size, norm
    )
    sid = os.path.splitext(os.path.basename(path))[0]
    save_feature_store(
        args.save_dir,
        sid,
        feats,
        coords,
        attrs={
            "patch_size": args.patch_size,
            "downsample": grid["downsample"],
            "level_dim": np.asarray([img.shape[1], img.shape[0]]),
        },
    )
    return sid, len(coords)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--source", required=True, help="directory of raster images")
    p.add_argument("--save_dir", required=True)
    p.add_argument("--encoder", default="resnet50_trunc")
    p.add_argument("--ckpt_path", default=None, help="torch state_dict for the encoder")
    p.add_argument("--patch_size", type=int, default=256)
    p.add_argument("--step_size", type=int, default=256)
    p.add_argument("--batch_size", type=int, default=256)
    p.add_argument("--coverage", type=float, default=0.5)
    p.add_argument("--sthresh", type=int, default=0, help="0 = Otsu")
    args = p.parse_args(argv)

    fn, norm = get_encoder(args.encoder, args.ckpt_path)
    paths = sorted(
        os.path.join(args.source, f)
        for f in os.listdir(args.source)
        if f.lower().endswith(IMG_EXTS)
    )
    if not paths:
        raise SystemExit(f"no images in {args.source}")
    os.makedirs(args.save_dir, exist_ok=True)
    for i, path in enumerate(paths):
        t0 = time.time()
        sid, n = process_slide(path, fn, norm, args)
        if sid is None:
            print(f"[{i + 1}/{len(paths)}] {path}: no tissue found, skipped")
        else:
            print(
                f"[{i + 1}/{len(paths)}] {sid}: {n} patches -> "
                f"{args.save_dir}/pt_files/{sid}.pt ({time.time() - t0:.1f}s)"
            )


if __name__ == "__main__":
    main()
