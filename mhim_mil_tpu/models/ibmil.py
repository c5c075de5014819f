"""IBMIL: interventional-Bayes MIL — ABMIL deconfounded by a prototype bank.

Reference: modules/abmil_ibmil.py:43-101. The confounder dictionary (k-means
prototypes of bag features, shipped as ``.npy`` via ``--confounder_path``)
is a fixed buffer; the bag feature queries it in a 128-d joint space and the
attended confounder summary is concatenated before the head.
``utils/confounders.py`` provides the k-means builder the upstream IBMIL
repo keeps out-of-tree.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops.masked import masked_softmax
from .layers import FeatureEmbed, dense


class IBMIL(nn.Module):
    input_dim: int = 1024
    n_classes: int = 2
    inner_dim: int = 512
    attn_dim: int = 128
    dropout: float = 0.25
    act: str = "relu"
    confounders: Optional[np.ndarray] = None  # [K, 512] prototype bank
    joint_dim: int = 128

    @nn.compact
    def __call__(self, feats, mask, *, training: bool = False, return_attn: bool = False):
        x = FeatureEmbed(self.inner_dim, self.act, self.dropout, name="embedding")(
            feats, training=training
        )
        a = jnp.tanh(dense(self.attn_dim, name="attn_0")(x))
        logits_a = dense(1, name="attn_1")(a)[..., 0]  # [B,N]
        attn = masked_softmax(logits_a, mask, axis=-1)
        bag = jnp.einsum("bn,bnd->bd", attn, jnp.where(mask[..., None], x, 0))

        if self.confounders is not None:
            conf = jnp.asarray(self.confounders, jnp.float32)  # [K,D]
            q = dense(self.joint_dim, name="W_q")(bag)  # [B,J]
            k = dense(self.joint_dim, name="W_k")(conf)  # [K,J]
            # softmax over the confounder axis (reference abmil_ibmil.py:94-96)
            da = jnp.einsum("kj,bj->bk", k, q) / jnp.sqrt(float(self.joint_dim))
            da = nn.softmax(da, axis=-1)
            conf_feat = jnp.einsum("bk,kd->bd", da, conf)
            bag = jnp.concatenate([bag, conf_feat], axis=-1)

        logits = dense(self.n_classes, name="head")(bag)
        out = {"logits": logits, "bag_feat": bag}
        if return_attn:
            out["attn"] = attn
        return out
