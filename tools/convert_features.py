#!/usr/bin/env python
"""Feature-store converter: h5 ↔ pt ↔ npy bags, CLAM layout.

Consuming published feature sets (UNI / CHIEF / ResNet-50 CPathPatchFeature
releases) usually means normalising whatever container they ship into the
``root/pt_files/*.pt`` (+ ``root/h5_files/*.h5`` coords) layout this
framework and the reference both read. Usage:

    python tools/convert_features.py --src feats_h5/ --src_format h5 \
        --dst store/ [--with_coords]
    python tools/convert_features.py --src store_npy/ --src_format npy --dst store/
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mhim_mil_tpu.utils.platform import honor_env_platform  # noqa: E402

honor_env_platform()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", required=True)
    ap.add_argument("--dst", required=True)
    ap.add_argument("--src_format", choices=["h5", "npy", "pt"], required=True)
    ap.add_argument("--with_coords", action="store_true")
    args = ap.parse_args()

    from mhim_mil_tpu.preprocess.extract import save_feature_store

    exts = {"h5": ".h5", "npy": ".npy", "pt": ".pt"}
    files = sorted(
        f for f in os.listdir(args.src) if f.endswith(exts[args.src_format])
    )
    print(f"converting {len(files)} {args.src_format} bags -> {args.dst}")
    for f in files:
        sid = os.path.splitext(f)[0]
        path = os.path.join(args.src, f)
        coords = attrs = None
        if args.src_format == "h5":
            from mhim_mil_tpu.data.readers import load_h5_features

            feats, coords, attrs = load_h5_features(path)
            if feats is None:
                raise ValueError(f"{path}: no 'features' dataset")
        elif args.src_format == "npy":
            feats = np.load(path).astype(np.float32)
        else:
            from mhim_mil_tpu.data.readers import load_pt_features

            feats = load_pt_features(path)
        save_feature_store(
            args.dst, sid, feats,
            coords=coords if args.with_coords else None, attrs=attrs,
        )
    print("done")


if __name__ == "__main__":
    main()
