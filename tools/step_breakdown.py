"""Per-component timing of the flagship MHIM train step.

The fused step is one XLA program; to find where its ~20 ms go, time the
pieces as separate jitted programs at the bench geometry (batch 4, 10240
instances, 1024-d features). Sections:

  teacher_fwd   — forward_teacher (embed + SAttention + pseudo-score)
  student_grad  — value_and_grad of the student pass (mining mask from a
                  fixed attention + merge + encoder + losses)
  optimizer     — Adam update + teacher EMA on the param tree
  embed_grad    — the 1024→512 feature MLP fwd+bwd alone
  nystrom_grad  — one streamed masked Nystrom layer fwd+bwd alone

Times are wall-per-call over reps with a single host-fetch sync at the end
(CLAUDE.md: only a host fetch reliably syncs on this backend), so dispatch
pipelining amortizes the link cost.

Usage: python tools/step_breakdown.py
"""

from __future__ import annotations

import json
import sys
import time
from functools import partial

import numpy as np


def timeit(fn, *args, reps=20, warmup=2, probe=None):
    """Wall ms/call. ``probe`` maps the output to a scalar-fetchable array."""
    out = None
    for _ in range(warmup):
        out = fn(*args)
    sync = probe(out) if probe else out
    float(np.asarray(sync).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    sync = probe(out) if probe else out
    float(np.asarray(sync).ravel()[0])
    return (time.perf_counter() - t0) / reps * 1000


def breakdown(cfg, model, state, step, batch, include_full_step=True):
    """Per-component timings (ms) of the flagship step at the given geometry.

    Callable from bench.py with its already-built state so every official
    capture records the decomposition from the same process (round-3 VERDICT
    next-step #10: regressions must be attributable from the artifact alone).
    """
    import jax
    import jax.numpy as jnp

    from mhim_mil_tpu.engine.steps import cast_compute
    from mhim_mil_tpu.models.mhim import MHIM

    BATCH, BAG_SIZE = batch["feats"].shape[0], batch["feats"].shape[1]
    res = {}

    if include_full_step:
        # full step (the reference point)
        res["full_step_ms"] = timeit(
            step, state, batch, probe=lambda o: o[1]["loss"]
        )

    # teacher forward
    @jax.jit
    def teacher_fwd(state, batch):
        params, b = cast_compute(cfg, state.teacher_params, batch)
        cls, attn = model.apply(
            {"params": params, **state.model_state},
            b["feats"], b["mask"], method=MHIM.forward_teacher,
        )
        return attn

    res["teacher_fwd_ms"] = timeit(teacher_fwd, state, batch)

    # student fwd+bwd with a fixed attention (mining + merge + encoder + CE)
    attn_fixed = np.abs(np.random.default_rng(0).normal(size=(BATCH, BAG_SIZE))).astype(np.float32)
    attn_fixed = jnp.asarray(attn_fixed)

    @jax.jit
    def student_grad(state, batch, attn):
        def loss_fn(params):
            p, b = cast_compute(cfg, params, batch)
            out, _ = model.apply(
                {"params": p, **state.model_state},
                b["feats"], b["mask"], attn, None, None,
                training=True,
                rngs={"dropout": jax.random.PRNGKey(0),
                      "mask": jax.random.PRNGKey(1)},
                mutable=list(state.model_state.keys()),
            )
            import optax

            ce = optax.softmax_cross_entropy_with_integer_labels(
                out["logits"].astype(jnp.float32), batch["target"]
            ).mean()
            return ce

        return jax.value_and_grad(loss_fn)(state.params)[0]

    res["student_grad_ms"] = timeit(student_grad, state, batch, attn_fixed)

    # optimizer + EMA only
    grads = jax.tree.map(jnp.zeros_like, state.params)

    @jax.jit
    def opt_only(state, grads):
        import optax

        updates, _ = state.tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        t = jax.tree.map(
            lambda a, b: a * 0.9997 + b * 0.0003, state.teacher_params, new_params
        )
        return jax.tree_util.tree_leaves(t)[0]

    res["optimizer_ms"] = timeit(opt_only, state, grads)

    # embed fwd+bwd alone
    from mhim_mil_tpu.models.layers import FeatureEmbed

    emb = FeatureEmbed(512, cfg.act, cfg.dropout)
    ev = emb.init(jax.random.PRNGKey(0), batch["feats"][:, :8], training=False)

    @jax.jit
    def embed_grad(params, feats):
        def f(p):
            x = emb.apply(p, feats.astype(jnp.bfloat16), training=False)
            return jnp.sum(x.astype(jnp.float32))

        return jax.value_and_grad(f)(params)[0]

    res["embed_grad_ms"] = timeit(embed_grad, ev, batch["feats"])

    # one streamed nystrom layer fwd+bwd alone (post-merge geometry AND full-N)
    from mhim_mil_tpu.ops.nystrom import nystrom_attention_streamed

    rngk = np.random.default_rng(1)
    for tag, n in (("nystrom_grad_fullN", BAG_SIZE + 1),):
        q = jnp.asarray(rngk.normal(size=(BATCH, n, 8, 64)).astype(np.float32)).astype(jnp.bfloat16)

        @jax.jit
        def nys_grad(q):
            def f(q):
                o = nystrom_attention_streamed(q, q, q, jnp.ones((BATCH, n), bool), num_landmarks=256)
                if isinstance(o, tuple):
                    o = o[0]
                return jnp.sum(o.astype(jnp.float32))

            return jax.value_and_grad(f)(q)[0]

        res[tag + "_ms"] = timeit(nys_grad, q)

    for k, v in res.items():
        res[k] = round(v, 3)
    return res


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    sys.path.insert(0, ".")
    from mhim_mil_tpu.utils.platform import honor_env_platform

    honor_env_platform()
    from bench import _make_state_and_step

    cfg, model, state, step, batch = _make_state_and_step()
    res = breakdown(cfg, model, state, step, batch)
    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
