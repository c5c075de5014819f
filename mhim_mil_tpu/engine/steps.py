"""Jitted train / eval steps per model family.

The reference dispatches model-specific forward logic through ``CommonMIL``
hook methods called from a Python epoch loop (reference:
engines/common_mil.py:14-68, engines/base_engine.py:46-232). Here each family
gets one fused, jitted ``train_step(state, batch) → (state, metrics)``:
forward, loss, backward, optimizer update and (for MHIM) the teacher-EMA
update all execute as a single XLA program per step.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import optax

from .losses import build_criterion
from .train_state import MILTrainState
from ..utils.schedules import cosine_schedule


def cast_compute(cfg, params, batch):
    """Mixed-precision policy: bfloat16 params + features on the MXU, fp32
    master params/optimizer state, fp32 losses/scans (the reference trains
    under fp16 autocast — engines/base_engine.py:77; bf16 is the TPU-native
    equivalent with no grad scaler needed)."""
    if getattr(cfg, "compute_dtype", "float32") != "bfloat16":
        return params, batch
    cast = lambda t: t.astype(jnp.bfloat16) if t.dtype == jnp.float32 else t
    params = jax.tree.map(cast, params)
    batch = {k: (cast(v) if k == "feats" else v) for k, v in batch.items()}
    return params, batch


def make_train_step(cfg, model, family: str, steps_per_epoch: int, donate: bool = False,
                    jit: bool = True):
    """Build the jitted train step for a model family.

    ``donate`` buffer-donates the train state; off by default because donation
    multiplies XLA compile time several-fold on the remote-TPU backend and the
    MIL state (a few M params) is small next to the activations.

    Families (reference engines/common_mil.py:14-46):
      - ``default``: plain forward; model may return an ``aux_loss``
        (CLAM instance loss, DSMIL max-pool loss) weighted by ``aux_alpha``
        when the model doesn't own the weighting itself.
      - ``mhim`` / ``mhim_pure``: handled in models/mhim.py's step builders.
    """
    criterion = build_criterion(cfg)

    def loss_fn(params, model_state, rng, batch, step):
        params, batch = cast_compute(cfg, params, batch)
        variables = {"params": params, **model_state}
        mutable = [k for k in model_state.keys()]
        rngs = {"dropout": rng, "mask": jax.random.fold_in(rng, 1)}
        # CLAM computes its instance loss from the bag label during training
        # (reference engines/common_mil.py:38-40 passes label into the model);
        # the 2D-Mamba grid needs the patch coordinates; sincos-positional
        # models consume the same batched h5 grid coords (reference
        # abmil.py:214-215 receives `pos` from the loader batch).
        args = (batch["feats"], batch["mask"])
        kw = {}
        if family == "clam":
            args = args + (batch["target"],)
        elif family == "mamba2d" and "pos" in batch:
            args = args + (batch["pos"],)
        elif getattr(model, "pos", None) == "sincos" and "pos" in batch:
            kw["coords"] = batch["pos"]
        if mutable:
            out, new_model_state = model.apply(
                variables, *args, training=True, rngs=rngs, mutable=mutable, **kw,
            )
        else:
            out = model.apply(variables, *args, training=True, rngs=rngs, **kw)
            new_model_state = model_state
        logits = out["logits"]
        main = criterion(logits, batch)
        aux = out.get("aux_loss", 0.0)
        if "inst_logits_bag" in out:
            # DSMIL max-pooled instance loss (reference: modules/dsmil.py:163-170,
            # weighted by aux_alpha in engines/base_engine.py:99-100).
            aux = aux + criterion(out["inst_logits_bag"], batch)
        if "sub_preds" in out:
            # DTFD tier-1 pseudo-bag supervision (reference dtfd.py:208-212 —
            # dead internal-optimizer path redesigned as an explicit aux loss).
            from .losses import cross_entropy

            sp = out["sub_preds"]  # [B,G,C]
            tgt = jnp.broadcast_to(batch["target"][:, None], sp.shape[:2])
            w = out["sub_preds_mask"]
            if "bag_valid" in batch:
                w = w & batch["bag_valid"][:, None]
            aux = aux + cross_entropy(
                sp.reshape(-1, sp.shape[-1]), tgt.reshape(-1), w.reshape(-1)
            )
        loss = cfg.main_alpha * main + cfg.aux_alpha * aux
        return loss, (new_model_state, main, aux)

    use_ema = getattr(cfg, "model_ema", False)
    ema_decay = getattr(cfg, "model_ema_decay", 0.9998)

    def train_step(state: MILTrainState, batch):
        rng, step_rng = jax.random.split(state.rng)
        (loss, (new_model_state, main, aux)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params, state.model_state, step_rng, batch, state.step)
        updates, new_opt_state = state.tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        # generic model EMA (reference ModelEmaV3, utils.py:42-174), fused
        # into the same XLA program instead of a host-side state-dict walk
        teacher = state.teacher_params
        if use_ema and teacher is not None:
            teacher = ema_update(teacher, new_params, ema_decay)
        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            model_state=new_model_state,
            teacher_params=teacher,
            opt_state=new_opt_state,
            rng=rng,
        )
        metrics = {
            "loss": loss, "main_loss": main, "aux_loss": aux,
            # Real padded fraction of the compiled bucket (the reference's
            # pad_ratio meter is a dead constant 0, engines/common_mil.py:15;
            # bucketed padding makes it meaningful here).
            "pad_ratio": 1.0 - jnp.mean(batch["mask"].astype(jnp.float32)),
        }
        metrics.update(grad_norm_metrics(cfg, grads))
        return new_state, metrics

    if not jit:  # raw body, e.g. as a lax.scan body (make_multi_step)
        return train_step
    return partial(jax.jit, donate_argnums=(0,) if donate else ())(train_step)


def make_multi_step(cfg, model, family: str, steps_per_epoch: int,
                    donate: bool = False):
    """ONE jitted program executing k generic train steps via ``lax.scan``
    over a stacked batch (leaves gain a leading ``[k]`` axis) — the zoo
    counterpart of models/mhim.py ``make_mhim_multi_step``; see there for the
    dispatch-floor rationale and ordering-granularity note."""
    body = make_train_step(cfg, model, family, steps_per_epoch, jit=False)

    @partial(jax.jit, donate_argnums=(0,) if donate else ())
    def multi_step(state: MILTrainState, stacked_batch):
        return jax.lax.scan(body, state, stacked_batch)

    return multi_step


def grad_norm_metrics(cfg, grads):
    """Per-top-level-module gradient global norms (the observability intent
    of the reference's ``wandb.watch(model)`` gradient logging,
    main.py:254-255) — computed in-graph under ``--wandb_watch`` so they
    surface as epoch-mean ``grad_norm/<module>`` meters in the history and,
    when enabled, wandb."""
    if not getattr(cfg, "wandb_watch", False):
        return {}
    return {f"grad_norm/{k}": optax.global_norm(v) for k, v in grads.items()}


def make_eval_step(cfg, model, family: str, params_field: str = "params"):
    """Jitted eval forward. Returns logits (+ optional sub-logits for DSMIL's
    dual head, averaged by the caller — reference engines/common_mil.py:66-67).
    """

    @jax.jit
    def eval_step(state: MILTrainState, batch):
        params = getattr(state, params_field)
        if params is None:
            params = state.params
        params, batch = cast_compute(cfg, params, batch)
        variables = {"params": params, **state.model_state}
        args = (batch["feats"], batch["mask"])
        kw = {}
        if family == "mamba2d" and "pos" in batch:
            args = args + (batch["pos"],)
        elif getattr(model, "pos", None) == "sincos" and "pos" in batch:
            kw["coords"] = batch["pos"]
        out = model.apply(variables, *args, training=False, **kw)
        res = {"logits": out["logits"].astype(jnp.float32)}
        if "inst_logits_bag" in out:
            res["sub_logits"] = out["inst_logits_bag"].astype(jnp.float32)
        return res

    return eval_step


def ema_update(teacher_params, student_params, mm):
    """Teacher EMA: ``t ← mm·t + (1−mm)·s``
    (reference: engines/base_engine.py:155-167, inline per-parameter walk).

    Per-leaf on purpose: both full raveling (optax.flatten-style) and
    packing just the small leaves into one vector were measured SLOWER
    end-to-end on TPU — the ravel/concat relayouts serialize against the
    backward pass and cost more than the per-leaf kernel overhead they
    remove."""
    return jax.tree.map(
        lambda t, s: t * mm + s.astype(t.dtype) * (1.0 - mm),
        teacher_params, student_params,
    )


def make_mm_schedule(cfg, steps_per_epoch: int) -> Optional[Callable]:
    """Cosine EMA-momentum schedule ``mm → 1.0``
    (reference: modules/__init__.py:177-181)."""
    if not cfg.mm_sche:
        return None
    return cosine_schedule(cfg.mm, 1.0, cfg.num_epoch * steps_per_epoch)
