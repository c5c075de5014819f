"""Shared building blocks for the MIL zoo.

Initialisation convention follows the reference's ``initialize_weights``
(xavier-normal linear weights, zero biases, unit LayerNorm —
reference: modules/mean_max.py:3-12, modules/mhim_modules/utils.py), so that
weights imported from PyTorch checkpoints land in an identically-scaled
parameter space.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.masked import masked_softmax

# Reference init: nn.init.xavier_normal_ on every Linear.
xavier_normal = nn.initializers.glorot_normal()


def dense(features: int, use_bias: bool = True, name: Optional[str] = None) -> nn.Dense:
    return nn.Dense(
        features,
        use_bias=use_bias,
        kernel_init=xavier_normal,
        bias_init=nn.initializers.zeros,
        name=name,
    )


def get_act(name: str) -> Callable[[jax.Array], jax.Array]:
    name = (name or "none").lower()
    return {
        "relu": nn.relu,
        "gelu": nn.gelu,
        "tanh": jnp.tanh,
        "silu": nn.silu,
        "none": lambda x: x,
    }[name]


class FeatureEmbed(nn.Module):
    """Instance-feature MLP: Linear(input→inner) + act + dropout.

    The shared stem of every zoo model (reference: modules/mhim.py:69-84,
    modules/abmil.py:180-191, modules/mean_max.py:18-27).
    """

    inner_dim: int = 512
    act: str = "relu"
    dropout: float = 0.25
    use_bias: bool = True

    @nn.compact
    def __call__(self, x, *, training: bool = False):
        x = dense(self.inner_dim, self.use_bias, name="proj")(x)
        x = get_act(self.act)(x)
        if self.dropout > 0:
            x = nn.Dropout(self.dropout, deterministic=not training)(x)
        return x


class TanhAttentionPool(nn.Module):
    """ABMIL deterministic attention pooling (Ilse et al. 2018).

    ``A = w2·tanh(w1·x)``; masked softmax over instances; weighted sum.
    Reference: modules/abmil.py:193-197,229-234 (standalone zoo model) and
    modules/mhim_modules/baseline.py:8-41 (MHIM baseline, configurable act).

    Returns ``(pooled[B, K, L], attn[B, K, N])`` where attn is the *softmaxed*
    attention (or raw logits when ``no_norm``).
    """

    attn_dim: int = 128
    n_branches: int = 1  # K
    act: str = "tanh"
    use_bias: bool = True
    dropout: float = 0.0
    use_flash: bool = False

    @nn.compact
    def __call__(self, x, mask, *, training: bool = False, no_norm: bool = False):
        a = dense(self.attn_dim, self.use_bias, name="attn_a")(x)
        a = get_act(self.act)(a)
        if self.dropout > 0:
            a = nn.Dropout(self.dropout, deterministic=not training)(a)
        logits = dense(self.n_branches, self.use_bias, name="attn_c")(a)  # [B,N,K]
        logits = jnp.swapaxes(logits, -1, -2)  # [B,K,N]
        # Fused Pallas pooling on no-grad paths (teacher / eval): one VMEM
        # stream over the bag instead of ~5 XLA HBM passes (ops/pallas_abmil).
        # Opt-in like flash-nystrom: Mosaic cannot compile over the axon
        # tunnel; FORCE_INTERPRET lets model-level tests run it on CPU.
        import jax as _jax

        from ..ops import pallas_abmil as _pa

        flash_ok = (
            self.use_flash
            and not training
            and not no_norm
            and self.n_branches == 1
            and (_jax.default_backend() != "cpu" or _pa.FORCE_INTERPRET)
        )
        if flash_ok:
            pooled, attn = _pa.fused_abmil_pool(
                x, logits[:, 0], mask, interpret=_pa.FORCE_INTERPRET
            )
            return pooled[:, None].astype(x.dtype), attn[:, None, :].astype(x.dtype)
        attn = masked_softmax(logits, mask[:, None, :], axis=-1)
        pooled = jnp.einsum("bkn,bnd->bkd", attn, x)
        return pooled, (logits if no_norm else attn)


class GatedAttentionPool(nn.Module):
    """Gated ABMIL attention: ``A = w_c·(act(w_a·x) ⊙ σ(w_b·x))``.

    Reference: modules/abmil.py:83-103 (D=384) and
    modules/mhim_modules/baseline.py:43-86 (D=128, configurable act).
    """

    attn_dim: int = 128
    n_branches: int = 1
    act: str = "tanh"
    use_bias: bool = True
    dropout: float = 0.0
    use_flash: bool = False

    @nn.compact
    def __call__(self, x, mask, *, training: bool = False, no_norm: bool = False):
        a = get_act(self.act)(dense(self.attn_dim, self.use_bias, name="attn_a")(x))
        b = nn.sigmoid(dense(self.attn_dim, self.use_bias, name="attn_b")(x))
        if self.dropout > 0:
            det = not training
            a = nn.Dropout(self.dropout, deterministic=det)(a)
            b = nn.Dropout(self.dropout, deterministic=det)(b)
        logits = dense(self.n_branches, self.use_bias, name="attn_c")(a * b)
        logits = jnp.swapaxes(logits, -1, -2)  # [B,K,N]
        # Fused Pallas pooling on no-grad paths (teacher / eval): one VMEM
        # stream over the bag instead of ~5 XLA HBM passes (ops/pallas_abmil).
        # Opt-in like flash-nystrom: Mosaic cannot compile over the axon
        # tunnel; FORCE_INTERPRET lets model-level tests run it on CPU.
        import jax as _jax

        from ..ops import pallas_abmil as _pa

        flash_ok = (
            self.use_flash
            and not training
            and not no_norm
            and self.n_branches == 1
            and (_jax.default_backend() != "cpu" or _pa.FORCE_INTERPRET)
        )
        if flash_ok:
            pooled, attn = _pa.fused_abmil_pool(
                x, logits[:, 0], mask, interpret=_pa.FORCE_INTERPRET
            )
            return pooled[:, None].astype(x.dtype), attn[:, None, :].astype(x.dtype)
        attn = masked_softmax(logits, mask[:, None, :], axis=-1)
        pooled = jnp.einsum("bkn,bnd->bkd", attn, x)
        return pooled, (logits if no_norm else attn)
