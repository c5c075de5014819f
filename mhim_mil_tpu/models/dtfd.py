"""DTFD-MIL: two-tier distillation over pseudo-bags.

Reference: modules/dtfd.py:145-273. Semantics preserved: split the bag into
``group`` pseudo-bags, tier-1 = gated attention + classifier per pseudo-bag,
distill one feature per pseudo-bag (``AFS`` attention-fused / ``MaxS`` /
``MaxMinS`` by CAM ranking, dtfd.py:28-31,190-204), tier-2 = gated attention
+ classifier over the distilled features.

Deliberate divergences (documented per SURVEY.md §7):
- The reference creates an *internal* second optimizer for tier-1 that the
  release never steps (dtfd.py:159-160 and the commented-out loss at
  :208-212). Here tier-1 supervision is an explicit ``aux_loss`` (mean CE of
  the pseudo-bag predictions) under the single outer optimizer.
- Pseudo-bag assignment is contiguous chunks over the *valid* instances
  (rank-based), identical to the reference's sequential ``np.array_split``
  for unshuffled bags; eval uses the same deterministic chunking instead of
  the reference's ``random.shuffle`` (dtfd.py:221-224).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.masked import masked_softmax, NEG_INF
from .layers import dense, get_act


class GatedAttention(nn.Module):
    """tanh×sigmoid gated attention logits (reference dtfd.py:105-144)."""

    attn_dim: int = 128

    @nn.compact
    def __call__(self, x):
        v = jnp.tanh(dense(self.attn_dim, name="attention_V")(x))
        u = nn.sigmoid(dense(self.attn_dim, name="attention_U")(x))
        return dense(1, name="attention_weights")(v * u)[..., 0]  # [..., N]


class DTFD(nn.Module):
    input_dim: int = 1024
    n_classes: int = 2
    inner_dim: int = 512
    group: int = 5
    distill: str = "AFS"  # AFS | MaxS | MaxMinS
    dropout: float = 0.25
    act: str = "relu"

    @nn.compact
    def __call__(self, feats, mask, *, training: bool = False, return_attn: bool = False):
        b, n, _ = feats.shape
        g = self.group
        mask = mask.astype(bool)

        # dimReduction (reference dtfd.py:57-90): bias-free linear + act + dropout
        x = dense(self.inner_dim, use_bias=False, name="dimReduction")(feats)
        x = get_act(self.act)(x)
        x = nn.Dropout(0.25, deterministic=not training)(x)

        # contiguous pseudo-bag ids over valid instances with exact
        # np.array_split semantics (reference dtfd.py:164-166, 221-224): the
        # first n_valid % g chunks get size n_valid//g + 1, the rest
        # n_valid//g.
        n_valid = jnp.sum(mask, axis=-1, keepdims=True)  # [B,1]
        rank = jnp.cumsum(mask, axis=-1) - 1  # valid rank per position
        small = jnp.maximum(n_valid, 1) // g
        rem = jnp.maximum(n_valid, 1) % g
        boundary = rem * (small + 1)  # ranks below this sit in the big chunks
        gid = jnp.where(
            rank < boundary,
            rank // (small + 1),
            rem + (rank - boundary) // jnp.maximum(small, 1),
        )
        gid = jnp.clip(gid, 0, g - 1)  # [B,N]
        group_mask = (gid[:, None, :] == jnp.arange(g)[None, :, None]) & mask[:, None, :]

        # tier-1 attention per pseudo-bag
        attn_logits = GatedAttention(name="attention")(x)  # [B,N]
        attn = masked_softmax(
            jnp.broadcast_to(attn_logits[:, None, :], group_mask.shape),
            group_mask,
            axis=-1,
        )  # [B,G,N]
        att_feat = jnp.einsum("bgn,bnd->bgd", attn, jnp.where(mask[..., None], x, 0))

        classifier = dense(self.n_classes, name="classifier")
        sub_preds = classifier(
            nn.Dropout(0.25, deterministic=not training)(att_feat)
        )  # [B,G,C]

        if self.distill == "AFS":
            pseudo = att_feat  # [B,G,D]
            pseudo_mask = jnp.any(group_mask, axis=-1)  # [B,G]
        else:
            # CAM ranking (reference get_cam_1d dtfd.py:28-31): per-instance
            # logits of the attention-scaled features, rank by the last
            # class's softmax probability. CAM uses the classifier weight
            # only; subtract the bias via a zero probe (init-safe).
            bias = classifier(jnp.zeros((1, 1, self.inner_dim), x.dtype))
            base = classifier(x) - bias  # [B,N,C]
            scaled = attn[..., None] * base[:, None]  # [B,G,N,C]
            prob_last = jax.nn.softmax(scaled, axis=-1)[..., -1]  # [B,G,N]
            score = jnp.where(group_mask, prob_last, NEG_INF)
            top_idx = jnp.argmax(score, axis=-1)  # [B,G]
            max_feat = jnp.take_along_axis(x, top_idx[..., None], axis=1)
            if self.distill == "MaxS":
                pseudo = max_feat
                pseudo_mask = jnp.any(group_mask, axis=-1)
            else:  # MaxMinS
                score_min = jnp.where(group_mask, prob_last, -NEG_INF)
                bot_idx = jnp.argmin(score_min, axis=-1)
                min_feat = jnp.take_along_axis(x, bot_idx[..., None], axis=1)
                pseudo = jnp.concatenate([max_feat, min_feat], axis=1)  # [B,2G,D]
                pseudo_mask = jnp.tile(jnp.any(group_mask, axis=-1), (1, 2))

        # tier-2 UClassifier (reference dtfd.py:92-102)
        u_logits = GatedAttention(name="u_attention")(pseudo)
        u_attn = masked_softmax(u_logits, pseudo_mask, axis=-1)
        u_feat = jnp.einsum("bg,bgd->bd", u_attn, pseudo)
        logits = dense(self.n_classes, name="u_classifier")(
            nn.Dropout(0.25, deterministic=not training)(u_feat)
        )

        out = {"logits": logits, "bag_feat": u_feat}
        if training:
            # tier-1 supervision: mean CE of pseudo-bag predictions vs the
            # bag label (the engine weights by aux_alpha; see module doc).
            out["sub_preds"] = sub_preds
            out["sub_preds_mask"] = jnp.any(group_mask, axis=-1)
        if return_attn:
            out["attn"] = jnp.sum(attn, axis=1)  # union of pseudo-bag attns
        return out
