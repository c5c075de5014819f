"""Standalone ABMIL zoo models (``abmil`` / ``gabmil``).

Reference: modules/abmil.py:145-259 (DAttention) and :51-143 (AttentionGated).
Batched + masked re-design: operates on ``(feats[B,N,D], mask[B,N])``.
"""

from __future__ import annotations

from typing import Optional

from flax import linen as nn

from .layers import FeatureEmbed, TanhAttentionPool, GatedAttentionPool, dense
from .positional import SINCOS


class ABMIL(nn.Module):
    """``abmil``: embed → tanh attention pool (L=512, D=128) → linear head.

    Reference: modules/abmil.py:145-251. ``mil_norm`` supports the reference's
    LayerNorm placements (``embed_norm_pos``: 0 = on raw features, 1 = after
    embed); BatchNorm is intentionally replaced by LayerNorm — BN over a
    padded instance axis is ill-defined and the reference default is no norm.
    """

    input_dim: int = 1024
    n_classes: int = 2
    inner_dim: int = 512
    attn_dim: int = 128
    dropout: float = 0.25
    act: str = "relu"
    mil_norm: Optional[str] = None
    embed_norm_pos: int = 0
    mil_bias: bool = True
    gated: bool = False
    pos: Optional[str] = None
    use_flash: bool = False  # fused Pallas pooling on no-grad TPU paths  # None | 'none' | 'sincos' (reference abmil.py:159)

    @nn.compact
    def __call__(
        self, feats, mask, *, training: bool = False, return_attn: bool = False,
        coords=None,
    ):
        assert self.pos in ("sincos", "none", None), self.pos
        x = feats
        if self.mil_norm == "ln" and self.embed_norm_pos == 0:
            x = nn.LayerNorm(epsilon=1e-5, use_bias=self.mil_bias)(x)
        x = FeatureEmbed(
            self.inner_dim, self.act, 0.25 if self.dropout else 0.0, self.mil_bias
        )(x, training=training)
        # 2D sin-cos positional embedding from h5 grid coords, applied after
        # the feature embed and before the embed_norm_pos=1 norm (reference
        # abmil.py:214-224; grid fallback when no coords are batched).
        if self.pos == "sincos":
            x = SINCOS(self.inner_dim)(x, mask, coords)
        if self.mil_norm == "ln" and self.embed_norm_pos == 1:
            x = nn.LayerNorm(epsilon=1e-5, use_bias=self.mil_bias)(x)

        pool_cls = GatedAttentionPool if self.gated else TanhAttentionPool
        attn_dim = 384 if self.gated else self.attn_dim  # reference abmil.py:55
        pooled, attn = pool_cls(
            attn_dim=attn_dim, use_bias=self.mil_bias, use_flash=self.use_flash
        )(x, mask, training=training)
        pooled = pooled[:, 0]  # K=1
        if self.mil_norm == "ln":
            pooled = nn.LayerNorm(epsilon=1e-5, use_bias=self.mil_bias)(pooled)
        logits = dense(self.n_classes, name="classifier")(pooled)

        out = {"logits": logits, "bag_feat": pooled}
        if return_attn:
            out["attn"] = attn[:, 0]  # [B,N]
        return out
