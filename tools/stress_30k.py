"""30k-instance stress fixture: the largest real-data regime (CAMELYON16
slides reach ~30-50k patches at 20x) without the data.

Runs the fused MHIM train step and the batch-1 inference step at a
32,768-instance bucket on the attached TPU and prints one JSON line with
compile time, step time and bags/sec — the capacity-planning numbers for the
real CAMELYON16/TCGA runs documented in docs/REAL_DATA.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mhim_mil_tpu.utils.platform import honor_env_platform  # noqa: E402

honor_env_platform()

BAG = 32768
DIM = 1024
BATCH = 2


def main() -> None:
    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass

    from mhim_mil_tpu.config import load_config
    from mhim_mil_tpu.models import build_model
    from mhim_mil_tpu.models.mhim import (
        create_mhim_state,
        make_mhim_eval_step,
        make_mhim_train_step,
    )
    from mhim_mil_tpu.utils.schedules import make_lr_schedule

    cfg = load_config(
        [], model="mhim", baseline="selfattn", input_dim=DIM, batch_size=BATCH,
        num_epoch=100, lr=2e-4, lr_sche="const", mask_ratio=0.5,
        mask_ratio_h=0.03, mask_ratio_hr=0.5, merge_enable=True,
        merge_ratio=0.2, merge_k=1, aux_alpha=0.5, attn2score=True,
    )
    model, _ = build_model(cfg)
    rng = np.random.default_rng(0)
    batch = {
        "feats": jnp.asarray(rng.normal(size=(BATCH, BAG, DIM)).astype(np.float32)),
        "mask": jnp.asarray(
            np.arange(BAG)[None] < rng.integers(BAG // 2, BAG + 1, (BATCH, 1))
        ),
        "bag_valid": jnp.ones((BATCH,), bool),
        "target": jnp.asarray(rng.integers(0, 2, size=(BATCH,)), jnp.int32),
    }
    lr = make_lr_schedule(cfg, steps_per_epoch=10)
    state = create_mhim_state(cfg, model, jax.random.PRNGKey(0), batch, lr)
    step = make_mhim_train_step(cfg, model, steps_per_epoch=10)

    t0 = time.perf_counter()
    state, m = step(state, batch)
    float(m["loss"])
    compile_s = time.perf_counter() - t0

    for _ in range(3):
        state, m = step(state, batch)
    float(m["loss"])
    t0 = time.perf_counter()
    reps = 10
    for _ in range(reps):
        state, m = step(state, batch)
    float(m["loss"])
    step_ms = (time.perf_counter() - t0) / reps * 1000

    ev = make_mhim_eval_step(cfg, model)
    one = {"feats": batch["feats"][:1], "mask": batch["mask"][:1]}
    t0 = time.perf_counter()
    float(jnp.sum(ev(state, one)["logits"]))
    ev_compile = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(10):
        float(jnp.sum(ev(state, one)["logits"]))
    infer_ms = (time.perf_counter() - t0) / 10 * 1000

    print(
        json.dumps(
            {
                "metric": "mhim_stress_32k",
                "bag_size": BAG,
                "batch": BATCH,
                "train_compile_s": round(compile_s, 1),
                "train_step_ms": round(step_ms, 2),
                "train_bags_per_sec": round(BATCH / step_ms * 1000, 2),
                "infer_compile_s": round(ev_compile, 1),
                "infer_ms_per_slide": round(infer_ms, 2),
                "device": str(jax.devices()[0].device_kind),
            }
        )
    )


if __name__ == "__main__":
    main()
