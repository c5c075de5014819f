"""Roofline accounting for the flagship MHIM train step on one TPU chip.

Answers the question the throughput target hinges on (BASELINE.md north star
#2): is the step bandwidth-bound, and how close is it to the *measured* HBM
ceiling of this chip? Reports:

  * ``hbm_gbps_measured``  — achieved HBM bandwidth of a pure streaming
    kernel (fused multiply-add swept over a ~1 GiB buffer inside one XLA
    program — link-independent).
  * ``step_bytes_accessed`` / ``step_flops`` — XLA cost analysis of the
    compiled train step (the compiler's own HBM-traffic accounting).
  * ``achieved_gbps`` / ``achieved_tflops`` — the same divided by the
    measured step time.
  * ``bandwidth_utilization`` — achieved_gbps / hbm_gbps_measured: how much
    of the chip's *real* (not spec) bandwidth the step already consumes.

Usage: python tools/roofline.py [--json out.json]
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def measure_hbm_ceiling() -> float:
    """Achieved HBM GB/s of a pure streaming kernel: K dependent fused
    multiply-adds over a 1 GiB fp32 buffer in ONE jitted program (so the
    remote-link dispatch cost is paid once, not per iteration)."""
    import jax
    import jax.numpy as jnp

    n = 256 * 1024 * 1024  # 1 GiB of fp32
    k = 16

    @jax.jit
    def sweep(x):
        def body(i, y):
            return y * 1.0000001 + 1.0
        return jax.lax.fori_loop(0, k, body, x)

    x = jnp.ones((n,), jnp.float32)
    r = sweep(x)
    float(r[0])  # compile + sync (host fetch is the only reliable sync here)
    t0 = time.perf_counter()
    r = sweep(x)
    float(r[0])
    dt = time.perf_counter() - t0
    # each iteration reads + writes the buffer
    gbytes = 2 * k * n * 4 / 1e9
    return gbytes / dt


def cost_analysis(step, state, batch):
    lowered = step.lower(state, batch)
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    return compiled, {
        "flops": float(ca.get("flops", 0.0)),
        "bytes_accessed": float(ca.get("bytes accessed", 0.0)),
    }


def measure_step_ms(step, state, batch, warmup=3, reps=30) -> float:
    for _ in range(warmup):
        state, m = step(state, batch)
    float(m["loss"])
    t0 = time.perf_counter()
    for _ in range(reps):
        state, m = step(state, batch)
    float(m["loss"])
    return (time.perf_counter() - t0) / reps * 1000


def run(make_state_and_step, batch_override=None):
    cfg, model, state, step, batch = make_state_and_step()
    if batch_override is not None:
        batch = batch_override
    compiled, costs = cost_analysis(step, state, batch)
    step_ms = measure_step_ms(step, state, batch)
    hbm = measure_hbm_ceiling()
    b = batch["feats"].shape[0]
    out = {
        "step_ms": round(step_ms, 3),
        "bags_per_sec": round(b / (step_ms / 1000), 2),
        "step_flops": costs["flops"],
        "step_bytes_accessed": costs["bytes_accessed"],
        "achieved_gbps": round(costs["bytes_accessed"] / (step_ms / 1000) / 1e9, 1),
        "achieved_tflops": round(costs["flops"] / (step_ms / 1000) / 1e12, 2),
        "hbm_gbps_measured": round(hbm, 1),
    }
    if hbm > 0:
        out["bandwidth_utilization"] = round(out["achieved_gbps"] / hbm, 3)
    return out


if __name__ == "__main__":
    sys.path.insert(0, ".")
    import jax

    from mhim_mil_tpu.utils.platform import honor_env_platform

    honor_env_platform()
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    from bench import _make_state_and_step

    res = run(_make_state_and_step)
    print(json.dumps(res, indent=1))
    if "--json" in sys.argv:
        with open(sys.argv[sys.argv.index("--json") + 1], "w") as f:
            json.dump(res, f, indent=1)
