"""DSMIL dual-stream MIL (Li et al. 2021), masked + batched.

Reference: modules/dsmil.py:59-172 (standalone ``dsmil`` zoo model) and
modules/mhim_modules/baseline.py:112-194 (the MHIM ``dsmil`` baseline
flavour). The critical-instance selection (argmax of per-class instance
scores) and the instance-axis softmax both respect the bag validity mask.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from ..ops.masked import masked_softmax, masked_max, NEG_INF
from .layers import dense, get_act


class BClassifier(nn.Module):
    """DSMIL bag head: critical-instance queries → instance attention →
    attention-weighted bag feature → per-class dense head.

    Reference: modules/dsmil.py:59-112. The reference's ``Conv1d(C, C,
    kernel_size=D)`` over the ``[B, C, D]`` bag feature is an un-windowed
    dense map ``[C·D] → [C]``; implemented as exactly that.
    """

    dim: int = 512
    n_classes: int = 2
    dropout_v: float = 0.0
    nonlinear: bool = True
    passing_v: bool = True
    use_bias: bool = True

    @nn.compact
    def __call__(
        self, feats, classes, mask, *, training: bool = False,
        no_norm: bool = False,
    ):
        b, n, d = feats.shape
        c = self.n_classes

        # V stream (reference dsmil.py:66-72)
        if self.passing_v:
            v = feats
            if self.dropout_v > 0:
                v = nn.Dropout(self.dropout_v, deterministic=not training)(v)
            v = nn.relu(dense(self.dim, self.use_bias, name="v")(v))
        else:
            v = feats

        # Q stream (reference dsmil.py:62-65); shared between all instances
        # and the critical instances, so instantiate once and apply twice.
        q0 = dense(128, self.use_bias, name="q0")
        q1 = dense(128, True, name="q1") if self.nonlinear else None

        def q_net(x):
            if self.nonlinear:
                return jnp.tanh(q1(nn.relu(q0(x))))
            return q0(x)

        q = q_net(feats)  # [B,N,128]

        # Critical instance per class: masked argmax of instance scores
        # (reference dsmil.py:90-92 sorts and takes row 0).
        scores = jnp.where(mask[..., None], classes, NEG_INF)
        crit = jnp.argmax(scores, axis=1)  # [B,C]
        m_feats = jnp.take_along_axis(feats, crit[..., None], axis=1)  # [B,C,D]
        q_max = q_net(m_feats)  # [B,C,128]

        a = jnp.einsum("bnq,bcq->bnc", q, q_max) / jnp.sqrt(128.0)
        a_soft = masked_softmax(a, mask[..., None], axis=1)  # over instances
        v = jnp.where(mask[..., None], v, 0)
        bag = jnp.einsum("bnc,bnd->bcd", a_soft, v)  # [B,C,D]

        # fcc: dense over the flattened [C,D] bag feature per class.
        logits = dense(c, self.use_bias, name="fcc")(bag.reshape(b, c * self.dim))
        # no_norm reports the PRE-softmax attention (reference
        # dsmil.py:142-146: ``_A = A`` before F.softmax); the bag feature
        # always uses the normalized weights.
        return logits, (a if no_norm else a_soft), bag


class DSMILHead(nn.Module):
    """The MHIM ``dsmil`` baseline: instance classifier + bag head over
    pre-embedded features (reference: modules/mhim_modules/baseline.py:153-194).

    Returns ``(logits_fused_parts, bag_feat, attn)``: bag logits, max-pooled
    instance logits, the ``[B,C,D]`` bag feature (the consistency-loss target)
    and a per-instance mining score (max class logit when ``cls_attn``,
    otherwise max attention — reference baseline.py:174-180).
    """

    dim: int = 512
    n_classes: int = 2
    cls_attn: bool = True

    @nn.compact
    def __call__(
        self, x, mask, *, training: bool = False, return_attn: bool = False,
        no_norm: bool = False,
    ):
        classes = dense(self.n_classes, name="i_classifier")(x)  # [B,N,C]
        bag_logits, a, bag_feat = BClassifier(
            self.dim, self.n_classes, name="b_classifier"
        )(x, classes, mask, training=training, no_norm=no_norm)
        inst_logits = masked_max(classes, mask[..., None], axis=1)  # [B,C]

        out = {
            "bag_logits": bag_logits,
            "inst_logits": inst_logits,
            "bag_feat": bag_feat,
        }
        if return_attn:
            src = classes if self.cls_attn else a
            attn = jnp.max(jnp.where(mask[..., None], src, NEG_INF), axis=-1)
            out["attn"] = jnp.where(mask, attn, 0)  # [B,N]
        return out


class DSMIL(nn.Module):
    """Standalone ``dsmil`` zoo model: embed → instance classifier + bag head;
    training aux loss = criterion on max-pooled instance logits, fused eval
    logits ``0.5·bag + 0.5·instance`` (reference: modules/dsmil.py:114-172 and
    engines/common_mil.py:56-68 — the fusion lives in the engine there; here
    the model reports both heads and the engine fuses).
    """

    input_dim: int = 1024
    n_classes: int = 2
    inner_dim: int = 512
    dropout: float = 0.25
    act: str = "relu"
    mil_norm: Optional[str] = None
    mil_bias: bool = True

    @nn.compact
    def __call__(self, feats, mask, *, training: bool = False, return_attn: bool = False):
        x = feats
        if self.mil_norm == "ln":
            x = nn.LayerNorm(epsilon=1e-5, use_bias=self.mil_bias)(x)
        x = dense(self.inner_dim, self.mil_bias, name="feature")(x)
        x = get_act(self.act)(x)
        if self.dropout > 0:
            x = nn.Dropout(self.dropout, deterministic=not training)(x)

        classes = dense(self.n_classes, self.mil_bias, name="i_classifier")(x)
        bag_logits, a, bag_feat = BClassifier(
            self.inner_dim, self.n_classes, use_bias=self.mil_bias, name="b_classifier"
        )(x, classes, mask, training=training)
        inst_logits = masked_max(classes, mask[..., None], axis=1)

        out = {
            "logits": bag_logits,
            "inst_logits_bag": inst_logits,  # engine: aux CE + 0.5/0.5 eval fusion
            "bag_feat": bag_feat.reshape(feats.shape[0], -1),
        }
        if return_attn:
            attn = jnp.max(jnp.where(mask[..., None], classes, NEG_INF), axis=-1)
            out["attn"] = jnp.where(mask, attn, 0)
        return out
