"""MHIM baseline encoders: ``selfattn`` (SAttention), ``attn`` (DAttention).

Reference: modules/mhim_modules/baseline.py:8-110 (DAttention variants) and
:222-288 (SAttention). Each consumes pre-embedded ``(x[B,N,D], mask[B,N])``
and returns a dict with the bag feature ``cls_feat`` plus (on request) the
mining attention and the pseudo-score ingredients.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from .layers import TanhAttentionPool, GatedAttentionPool
from .positional import PEG, PPEG, SINCOS
from .transformer import TransLayer


class DAttentionBaseline(nn.Module):
    """ABMIL attention pooling over embedded features, L=512 D=128 K=1,
    bias-free (reference: modules/mhim_modules/baseline.py:8-41 ``Attention``,
    :43-86 gated, :88-110 dispatch)."""

    dim: int = 512
    act: str = "gelu"
    gated: bool = False
    use_flash: bool = False

    @nn.compact
    def __call__(
        self, x, mask, *, training: bool = False, return_attn: bool = False,
        no_norm: bool = False,
    ):
        pool_cls = GatedAttentionPool if self.gated else TanhAttentionPool
        pooled, attn = pool_cls(
            attn_dim=128, act=self.act, use_bias=False,
            use_flash=self.use_flash, name="attention"
        )(x, mask, training=training, no_norm=no_norm)
        out = {"cls_feat": pooled[:, 0]}
        if return_attn:
            out["attn"] = attn[:, 0]  # [B,N], softmaxed (or raw when no_norm)
            out["act"] = x  # pre-pool activations for the pseudo-score
        return out


class SAttentionBaseline(nn.Module):
    """cls token + 2× Nystrom TransLayer with PPEG between (pos_pos=0)
    (reference: modules/mhim_modules/baseline.py:222-288)."""

    dim: int = 512
    heads: int = 8
    pos: str = "ppeg"
    peg_k: int = 7
    use_flash: bool = False
    # Which layers must materialize cls attention under return_attn. The
    # attn2score teacher consumes ONLY layer1's attention and scored values
    # (reference mhim.py:215-219 passes attn[0]); skipping layer2's
    # cls-attention pass saves a full streamed phase per teacher step.
    # Raw-attention mining (attn2score off) and heatmap export keep (0, 1).
    attn_layers: tuple = (0, 1)

    @nn.compact
    def __call__(
        self, x, mask, *, training: bool = False, return_attn: bool = False,
        no_norm: bool = False,
    ):
        b = x.shape[0]
        cls = self.param("cls_token", nn.initializers.normal(1.0), (1, 1, self.dim))
        x = jnp.concatenate([jnp.broadcast_to(cls, (b, 1, self.dim)), x], axis=1)
        full_mask = jnp.concatenate([jnp.ones((b, 1), bool), mask.astype(bool)], axis=1)

        attns, scored1 = [], None
        layer1 = TransLayer(self.dim, self.heads, use_flash=self.use_flash, name="layer1")
        if return_attn:
            x, a, v, scored1 = layer1(x, full_mask, training, True, no_norm)
            attns.append(a[:, :, 1:])
        else:
            x = layer1(x, full_mask, training, False, False)

        # Positional embedding between the two layers (pos_pos=0, reference
        # baseline.py:234-241,264-266): ppeg | sincos | peg | none. SINCOS
        # uses the row-major square-grid fallback — the reference SAttention
        # forward receives no coords either (baseline.py:244).
        if self.pos == "ppeg":
            body = PPEG(self.dim, k=self.peg_k, name="pos_embedding")(x[:, 1:], mask)
        elif self.pos == "sincos":
            body = SINCOS(self.dim, name="pos_embedding")(x[:, 1:], mask)
        elif self.pos == "peg":
            body = PEG(self.dim, k=self.peg_k, name="pos_embedding")(x[:, 1:], mask)
        else:
            body = None
        if body is not None:
            x = jnp.concatenate([x[:, :1], body], axis=1)

        layer2 = TransLayer(self.dim, self.heads, use_flash=self.use_flash, name="layer2")
        if return_attn and 1 in self.attn_layers:
            x, a, *_ = layer2(x, full_mask, training, True, no_norm)
            attns.append(a[:, :, 1:])
        else:
            x = layer2(x, full_mask, training, False, False)

        x = nn.LayerNorm(epsilon=1e-5, name="norm")(x)
        out = {"cls_feat": x[:, 0]}
        if return_attn:
            out["attns"] = attns  # list of [B,H,N]
            out["attn"] = attns[0]  # layer-1 attention drives mining/scoring
            out["scored_act"] = scored1  # to_out(v ⊙ attn) from layer1 [B,N,dim]
        return out
