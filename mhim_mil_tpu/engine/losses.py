"""Loss functions (reference: train_utils.py:39-56, modules/mhim_modules/losses.py).

All losses are pure JAX and computed in fp32 regardless of the compute dtype
(matching the reference's fp32-outside-autocast survival loss,
reference: engines/base_engine.py:418-424).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _wmean(per_example: jax.Array, weights) -> jax.Array:
    """Weighted batch mean; ``weights`` marks real (non-padding) bags."""
    if weights is None:
        return jnp.mean(per_example)
    w = weights.astype(jnp.float32)
    return jnp.sum(per_example * w) / jnp.maximum(jnp.sum(w), 1.0)


def cross_entropy(logits: jax.Array, labels: jax.Array, weights=None) -> jax.Array:
    """Mean CE over the batch; labels are int class ids. ``weights`` excludes
    the zero-padded bags emitted by short final batches (data/bucketing.py)."""
    logits = logits.astype(jnp.float32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, labels[:, None].astype(jnp.int32), axis=-1)[:, 0]
    return _wmean(nll, weights)


def bce_with_logits(logits: jax.Array, labels: jax.Array, weights=None) -> jax.Array:
    """BCEWithLogitsLoss against one-hot labels (reference train_utils.py:42-43)."""
    logits = logits.astype(jnp.float32)
    n_classes = logits.shape[-1]
    onehot = jax.nn.one_hot(labels, n_classes, dtype=jnp.float32)
    per = jnp.maximum(logits, 0) - logits * onehot + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    return _wmean(jnp.mean(per, axis=-1), weights)


def soft_target_ce(student: jax.Array, teacher: jax.Array, temp_t: float = 1.0, temp_s: float = 1.0, weights=None) -> jax.Array:
    """MHIM consistency loss: ``-softmax(teacher/Tt) · log_softmax(student/Ts)``
    over feature vectors (reference: modules/mhim_modules/losses.py:26-45).
    The teacher side is stop-gradiented by the caller. ``weights`` excludes
    the zero-padded fake bags of short final batches (the package-wide
    convention; the reference trains batch=1 and never pads).
    """
    student = student.astype(jnp.float32)
    teacher = teacher.astype(jnp.float32)
    t = jax.nn.softmax(teacher / temp_t, axis=-1)
    ls = jax.nn.log_softmax(student / temp_s, axis=-1)
    return _wmean(jnp.sum(-t * ls, axis=-1), weights)


def nll_surv_loss(logits: jax.Array, y_bin: jax.Array, censorship: jax.Array, alpha: float = 0.0, eps: float = 1e-7, weights=None) -> jax.Array:
    """Discrete-hazard negative log-likelihood for survival
    (reference: train_utils.py:8-37).

    ``hazards = sigmoid(logits)``; ``S = cumprod(1 - hazards)``;
    uncensored patients pay ``-log S(y-1) - log h(y)``, censored pay
    ``-log S(y)``; ``alpha`` re-weights toward the uncensored term.
    """
    logits = logits.astype(jnp.float32)
    y = y_bin.astype(jnp.int32)[:, None]
    c = censorship.astype(jnp.float32)[:, None]
    hazards = jax.nn.sigmoid(logits)
    s = jnp.cumprod(1.0 - hazards, axis=1)
    s_padded = jnp.concatenate([jnp.ones_like(c), s], axis=1)

    s_prev = jnp.take_along_axis(s_padded, y, axis=1)
    h_y = jnp.take_along_axis(hazards, y, axis=1)
    s_y = jnp.take_along_axis(s_padded, y + 1, axis=1)

    uncensored = -(1.0 - c) * (
        jnp.log(jnp.clip(s_prev, eps, None)) + jnp.log(jnp.clip(h_y, eps, None))
    )
    censored = -c * jnp.log(jnp.clip(s_y, eps, None))
    neg_l = censored + uncensored
    loss = (1.0 - alpha) * neg_l + alpha * uncensored
    return _wmean(loss[:, 0], weights)


def surv_risk(logits: jax.Array) -> jax.Array:
    """Risk score for c-index: ``-sum(cumprod(1 - sigmoid(logits)))``
    (reference: engines/base_engine.py:636-649)."""
    hazards = jax.nn.sigmoid(logits.astype(jnp.float32))
    s = jnp.cumprod(1.0 - hazards, axis=1)
    return -jnp.sum(s, axis=1)


def build_criterion(cfg):
    """Criterion factory keyed by ``cfg.loss`` (reference train_utils.py:41-48).

    Returns ``fn(logits, batch) -> scalar``.
    """
    if cfg.loss == "ce":
        return lambda logits, batch: cross_entropy(
            logits, batch["target"], batch.get("bag_valid")
        )
    if cfg.loss == "bce":
        return lambda logits, batch: bce_with_logits(
            logits, batch["target"], batch.get("bag_valid")
        )
    if cfg.loss == "nll_surv":
        return lambda logits, batch: nll_surv_loss(
            logits, batch["target"], batch["censorship"], alpha=0.0,
            weights=batch.get("bag_valid"),
        )
    raise NotImplementedError(cfg.loss)
