#!/usr/bin/env python
"""Export a trained checkpoint as a hermetic StableHLO serving bundle.

The TPU-native counterpart of a torchscript/ONNX deployment export (the
reference serves by re-running the eager module, main.py:384-413): the jitted
inference function — weights baked in — is serialized per instance-bucket
with a symbolic batch dimension, lowered for cpu+tpu.

    python tools/export_serving.py --ckpt out/fold_0_model_best.ckpt \
        --model mhim --baseline selfattn --out serving_bundle/ \
        --buckets 1024,4096,10240

Score without this package (only jax needed):

    from mhim_mil_tpu.utils.serving import load_bundle   # or inline the
    load_bundle("serving_bundle/").score(feats)          # ~40-line loader
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mhim_mil_tpu.utils.platform import honor_env_platform  # noqa: E402

honor_env_platform()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--model", default="mhim")
    ap.add_argument("--baseline", default="selfattn")
    ap.add_argument("--input_dim", type=int, default=1024)
    ap.add_argument("--inner_dim", type=int, default=512)
    ap.add_argument("--n_classes", type=int, default=2)
    ap.add_argument("--buckets", default="1024,4096,10240")
    ap.add_argument("--platforms", default="cpu,tpu")
    ap.add_argument("--use_teacher", action="store_true",
                    help="export the EMA teacher weights instead of the student")
    args = ap.parse_args()

    from mhim_mil_tpu.config import load_config
    from mhim_mil_tpu.models import build_model
    from mhim_mil_tpu.utils.checkpoint import load_checkpoint
    from mhim_mil_tpu.utils.serving import export_serving_bundle

    cfg = load_config(
        [], model=args.model, baseline=args.baseline, input_dim=args.input_dim,
        inner_dim=args.inner_dim, n_classes=args.n_classes,
    )
    model, family = build_model(cfg)
    payload = load_checkpoint(args.ckpt)
    params = payload["params"]
    if args.use_teacher:
        if payload.get("teacher_params") is None:
            raise SystemExit("--use_teacher: checkpoint has no teacher_params")
        params = payload["teacher_params"]
    variables = {"params": params, **payload.get("model_state", {})}

    manifest = export_serving_bundle(
        cfg, model, family, variables, args.out,
        buckets=[int(x) for x in args.buckets.split(",")],
        platforms=[p.strip() for p in args.platforms.split(",")],
    )
    sizes = {
        f: os.path.getsize(os.path.join(args.out, f))
        for f in sorted(os.listdir(args.out))
    }
    print({"manifest": manifest, "files": sizes})


if __name__ == "__main__":
    main()
