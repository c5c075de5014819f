"""``meanmil`` / ``maxmil`` sanity baselines.

Reference: modules/mean_max.py:14-60. The per-instance head runs on every
(padded) instance; pooling respects the validity mask.
"""

from __future__ import annotations

from flax import linen as nn

from ..ops.masked import masked_mean, masked_max
from .layers import FeatureEmbed, dense


class MeanMIL(nn.Module):
    input_dim: int = 1024
    n_classes: int = 2
    inner_dim: int = 512
    dropout: float = 0.25
    act: str = "relu"

    @nn.compact
    def __call__(self, feats, mask, *, training: bool = False, return_attn: bool = False):
        x = FeatureEmbed(self.inner_dim, self.act, self.dropout)(feats, training=training)
        inst_logits = dense(self.n_classes, name="classifier")(x)  # [B,N,C]
        logits = masked_mean(inst_logits, mask[..., None], axis=-2)
        return {"logits": logits}


class MaxMIL(nn.Module):
    input_dim: int = 1024
    n_classes: int = 2
    inner_dim: int = 512
    dropout: float = 0.25
    act: str = "relu"

    @nn.compact
    def __call__(self, feats, mask, *, training: bool = False, return_attn: bool = False):
        x = FeatureEmbed(self.inner_dim, self.act, self.dropout)(feats, training=training)
        inst_logits = dense(self.n_classes, name="classifier")(x)
        logits = masked_max(inst_logits, mask[..., None], axis=-2)
        return {"logits": logits}
