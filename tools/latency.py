#!/usr/bin/env python
"""Per-model inference latency + FLOPs harness.

Counterpart of the reference's ``benchmark.py`` (CUDA-event latency loop,
:25-72/:94-109) and ``flops.ipynb`` (thop at a 1×9000×1024 bag): measures
p50/p90 single-bag latency on the current device and reports XLA's
cost-analysis FLOPs per forward.

    python tools/latency.py --models abmil,transmil,mhim --bag_size 9000
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mhim_mil_tpu.utils.platform import honor_env_platform  # noqa: E402

honor_env_platform()


def measure(model_key: str, bag_size: int, input_dim: int, repeats: int, warmup: int):
    import jax
    import jax.numpy as jnp

    from mhim_mil_tpu.config import load_config
    from mhim_mil_tpu.models import build_model

    cfg = load_config(
        [], model=model_key, input_dim=input_dim,
        baseline="selfattn" if model_key.startswith("mhim") else "attn",
        mask_ratio_h=0.03, merge_enable=True, merge_ratio=0.2,
    )
    model, family = build_model(cfg)
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.normal(size=(1, bag_size, input_dim)), jnp.float32)
    mask = jnp.ones((1, bag_size), bool)
    variables = jax.jit(model.init, static_argnames=("training",))(
        jax.random.PRNGKey(0), feats, mask, training=False
    )

    if family in ("mhim", "mhim_pure"):
        from mhim_mil_tpu.models.mhim import MHIM

        fwd = jax.jit(
            lambda v, x, m: model.apply(v, x, m, method=MHIM.forward_test)["logits"]
        )
    else:
        fwd = jax.jit(
            lambda v, x, m: model.apply(v, x, m, training=False)["logits"]
        )

    flops = None
    try:
        cost = fwd.lower(variables, feats, mask).compile().cost_analysis()
        if cost and "flops" in cost:
            flops = float(cost["flops"])
    except Exception:
        pass

    for _ in range(warmup):
        out = fwd(variables, feats, mask)
    float(out.sum())
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = fwd(variables, feats, mask)
        float(out.sum())  # host fetch = reliable sync on the remote backend
        times.append(time.perf_counter() - t0)
    times = np.asarray(times) * 1000
    return {
        "model": model_key,
        "p50_ms": float(np.percentile(times, 50)),
        "p90_ms": float(np.percentile(times, 90)),
        "mean_ms": float(times.mean()),
        "gflops_fwd": None if flops is None else flops / 1e9,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--models", default="abmil,gabmil,transmil,dsmil,clam_sb,dtfd,mhim")
    ap.add_argument("--bag_size", type=int, default=9000)
    ap.add_argument("--input_dim", type=int, default=1024)
    ap.add_argument("--repeats", type=int, default=100)
    ap.add_argument("--warmup", type=int, default=10)
    args = ap.parse_args()

    print(f"{'model':<10} {'p50 ms':>8} {'p90 ms':>8} {'mean ms':>8} {'GFLOP':>8}")
    for key in args.models.split(","):
        r = measure(key, args.bag_size, args.input_dim, args.repeats, args.warmup)
        g = f"{r['gflops_fwd']:.2f}" if r["gflops_fwd"] else "-"
        print(
            f"{r['model']:<10} {r['p50_ms']:>8.2f} {r['p90_ms']:>8.2f} "
            f"{r['mean_ms']:>8.2f} {g:>8}"
        )


if __name__ == "__main__":
    main()
