"""Nystrom transformer stack: NystromMSA module, TransLayer, TransMIL.

Reference: modules/nystrom_attention.py:30-152 (attention),
modules/transmil.py:23-175 (TransLayer + TransMIL),
modules/mhim_modules/baseline.py:195-288 (the MHIM ``selfattn`` flavour).
Batched + masked TPU re-design over ``(x[B,N,D], mask[B,N])``.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.nystrom import nystrom_attention
from .layers import FeatureEmbed, dense, xavier_normal
from .positional import PEG, PPEG, SINCOS


class _DepthwiseResConv(nn.Module):
    """The Nystrom value residual: a per-head 33-tap conv along the sequence,
    shared across the head's channels (reference nystrom_attention.py:59-63,
    ``Conv2d(heads, heads, (33,1), groups=heads)``).

    The parameter keeps the reference-equivalent shape ``[k, 1, 1, H]`` (so
    torch imports and round-1 checkpoints load unchanged) but the compute runs
    as a channel-depthwise conv on ``[B, N, H·dh]`` — an 8-channel conv maps
    terribly onto the TPU's 128-lane registers, while the 512-channel
    depthwise layout is ~2x faster (measured on v5e).

    Measured dead end (round 4, keep for the record): a blocked-Toeplitz
    batched-matmul formulation (the head-shared kernel makes the conv a
    per-head banded [N, N] matmul, blocked [256, 288] tiles on the MXU) wins
    BIG standalone — fwd 15.3 → 1.3 ms, fwd+bwd 32.7 → 4.1 ms at 10241×512 —
    but LOSES in the full fused train step: 22.3 → 24.3 ms/step (179 → 165
    bags/s, 5-window medians). In-graph XLA fuses the depthwise conv into
    the surrounding elementwise work at near-zero marginal cost, while the
    Toeplitz path's pad + halo-gather + fp32 block-einsum adds real HBM
    round-trips that fusion can't remove. The standalone conv number is a
    layout artifact, not headroom.
    """

    heads: int
    dim_head: int
    kernel_size: int = 33

    @nn.compact
    def __call__(self, v_seq):  # [B, N, H*dh]
        kern = self.param(
            "kernel", xavier_normal, (self.kernel_size, 1, 1, self.heads)
        )
        inner = self.heads * self.dim_head
        kw = jnp.broadcast_to(
            kern[:, 0, 0, :, None], (self.kernel_size, self.heads, self.dim_head)
        ).reshape(self.kernel_size, 1, inner).astype(v_seq.dtype)
        return jax.lax.conv_general_dilated(
            v_seq, kw, window_strides=(1,), padding="SAME",
            dimension_numbers=("NWC", "WIO", "NWC"),
            feature_group_count=inner,
        )


class NystromMSA(nn.Module):
    """Multi-head Nystrom self-attention with depthwise-conv value residual.

    Reference: modules/nystrom_attention.py:30-152. ``num_landmarks`` defaults
    to dim//2 at the TransLayer call site (transmil.py:27-35).
    """

    dim: int = 512
    heads: int = 8
    dim_head: int = 64
    num_landmarks: int = 256
    pinv_iterations: int = 6
    residual: bool = True
    residual_conv_kernel: int = 33
    dropout: float = 0.1
    parity: bool = False  # reproduce the reference's unmasked landmark math
    use_flash: bool = False  # fused Pallas kernel on no-grad TPU paths
    stream_min_len: int = 4096  # flash-style streamed XLA path above this N

    @nn.compact
    def __call__(
        self,
        x,
        mask,
        *,
        training: bool = False,
        return_attn: bool = False,
        no_norm: bool = False,
    ):
        b, n, _ = x.shape
        h, dh = self.heads, self.dim_head
        inner = h * dh

        # ONE masking pass on the shared qkv input: to_qkv has no bias, so
        # zeroed rows stay zero in q/k/v and the per-tensor selects inside
        # the attention op are skipped (3 fewer full-tensor HBM passes at
        # 10k tokens; the masked rows' outputs are re-zeroed at the end).
        x = jnp.where(mask[..., None].astype(bool), x, 0)
        qkv = dense(inner * 3, use_bias=False, name="to_qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        # Sequence-major [B,N,H,dh]: a free reshape of the qkv output. The
        # head-major transpose (a full HBM round-trip per tensor) happens
        # only on the short-bag materializing path below.
        q, k, v = (t.reshape(b, n, h, dh) for t in (q, k, v))
        q = q * dh ** -0.5

        # Long bags stream flash-style (identical math, ~6x less HBM traffic,
        # works on every backend — see ops/nystrom.py); short bags and the
        # parity / no_norm modes use the materializing op. The explicit
        # ``use_flash`` flag selects the Pallas kernel on no-grad paths for
        # directly-attached TPUs (Mosaic cannot compile over the axon tunnel).
        flash_ok = (
            self.use_flash
            and not no_norm
            and not self.parity
            and jax.default_backend() not in ("cpu",)
        )
        stream_ok = not no_norm and not self.parity and n >= self.stream_min_len
        if flash_ok:
            # training uses the differentiable wrapper (fused forward,
            # gradients by recompute through the exact-match XLA path);
            # no-grad paths skip residual bookkeeping entirely
            from ..ops.pallas_nystrom import flash_nystrom, flash_nystrom_infer

            qh, kh, vh = (t.transpose(0, 2, 1, 3) for t in (q, k, v))
            fn = flash_nystrom if training else flash_nystrom_infer
            out, attn = fn(
                qh, kh, vh, mask, self.num_landmarks, self.pinv_iterations
            )
            out = out.transpose(0, 2, 1, 3).reshape(b, n, inner)
            if not return_attn:
                attn = None
        elif stream_ok:
            from ..ops.nystrom import nystrom_attention_streamed

            out, attn = nystrom_attention_streamed(
                q,
                k,
                v,
                mask,
                num_landmarks=self.num_landmarks,
                pinv_iters=self.pinv_iterations,
                return_attn=return_attn,
                pre_masked=True,
            )  # out already [B,N,inner]
        else:
            qh, kh, vh = (t.transpose(0, 2, 1, 3) for t in (q, k, v))
            out, attn = nystrom_attention(
                qh,
                kh,
                vh,
                mask,
                num_landmarks=self.num_landmarks,
                pinv_iters=self.pinv_iterations,
                return_attn=return_attn,
                no_norm=no_norm,
                parity=self.parity,
                pre_masked=not self.parity,
            )
            out = out.transpose(0, 2, 1, 3).reshape(b, n, inner)

        to_out = dense(self.dim, name="to_out")
        if self.residual:
            # v rows are already zero at masked positions (masked qkv input)
            v_seq = v.reshape(b, n, inner)
            out = out + _DepthwiseResConv(
                h, dh, self.residual_conv_kernel, name="res_conv"
            )(v_seq)
        out = to_out(out)
        if self.dropout > 0:
            out = nn.Dropout(self.dropout, deterministic=not training)(out)
        out = jnp.where(mask[..., None], out, 0)

        if return_attn:
            # Pseudo-score support: project the cls-attention-weighted values
            # of the instance tokens (index 1:) through this layer's to_out —
            # the "features" of reference scoring.py:22-27 (token 0 is cls;
            # the reference's front padding puts them at -n+1:).
            v_inst = v[:, 1:]  # [B,N-1,H,dh] sequence-major
            a_inst = attn[:, :, 1:].transpose(0, 2, 1)[..., None]  # [B,N-1,H,1]
            scored = to_out((v_inst * a_inst.astype(v_inst.dtype)).reshape(b, n - 1, inner))
            return out, attn, v_inst, scored
        return out


class TransLayer(nn.Module):
    """Pre-norm Nystrom block: ``x + MSA(LN(x))`` (reference transmil.py:23-47)."""

    dim: int = 512
    heads: int = 8
    parity: bool = False
    use_flash: bool = False

    # The bool flags are positional-or-keyword (and call sites pass all of
    # them) so ``nn.remat(TransLayer, static_argnums=(3, 4, 5))`` is wireable.
    # Measured at the bench geometry it LOSES: 21.75 vs 20.36 ms/step — the
    # streamed Nystrom already materializes no [N,N]-scale intermediates, so
    # remat saves little traffic while re-paying the VPU-bound depthwise convs
    # in the backward. Left unwired on purpose.
    @nn.compact
    def __call__(self, x, mask, training=False, need_attn=False, no_norm=False):
        msa = NystromMSA(
            dim=self.dim,
            heads=self.heads,
            dim_head=self.dim // self.heads,
            num_landmarks=self.dim // 2,
            parity=self.parity,
            use_flash=self.use_flash,
            name="attn",
        )
        normed = nn.LayerNorm(epsilon=1e-5, name="norm")(x)
        if need_attn:
            z, attn, v, scored = msa(
                normed, mask, training=training, return_attn=True, no_norm=no_norm
            )
            return x + z, attn, v, scored
        z = msa(normed, mask, training=training)
        return x + z


class TransMIL(nn.Module):
    """``transmil``: embed → cls token → TransLayer → PPEG → TransLayer →
    LN → cls head (reference: modules/transmil.py:66-175).

    The reference square-pads the bag by repeating its first tokens
    (transmil.py:124-127); here padding is masked instead — attention and the
    PPEG grid never see duplicate instances.
    """

    input_dim: int = 1024
    n_classes: int = 2
    inner_dim: int = 512
    dropout: float = 0.25
    act: str = "relu"
    mil_norm: Optional[str] = None
    mil_bias: bool = True
    pos: str = "ppeg"
    n_heads: int = 8
    parity: bool = False
    use_flash: bool = False

    @nn.compact
    def __call__(
        self,
        feats,
        mask,
        *,
        training: bool = False,
        return_attn: bool = False,
        coords=None,
    ):
        b = feats.shape[0]
        x = feats
        if self.mil_norm == "ln":
            x = nn.LayerNorm(epsilon=1e-5, use_bias=self.mil_bias)(x)
        x = FeatureEmbed(
            self.inner_dim, self.act, 0.25 if self.dropout else 0.0, self.mil_bias
        )(x, training=training)

        cls = self.param(
            "cls_token", nn.initializers.normal(1e-6), (1, 1, self.inner_dim)
        )
        x = jnp.concatenate([jnp.broadcast_to(cls, (b, 1, self.inner_dim)), x], axis=1)
        full_mask = jnp.concatenate(
            [jnp.ones((b, 1), bool), mask.astype(bool)], axis=1
        )

        attns = []
        layer1 = TransLayer(self.inner_dim, self.n_heads, self.parity, self.use_flash, name="layer1")
        if return_attn:
            x, a, *_ = layer1(x, full_mask, training, True, False)
            attns.append(a[:, :, 1:])  # drop cls column
        else:
            x = layer1(x, full_mask, training, False, False)

        # ppeg | sincos | peg | none between the layers. The reference
        # TransMIL hardcodes PPEG (transmil.py:50-64); sincos/peg extend the
        # --pos option uniformly across the transformer stack and consume the
        # batched h5 grid coords when present.
        if self.pos == "ppeg":
            body = PPEG(self.inner_dim, use_bias=self.mil_bias, name="pos_layer")(
                x[:, 1:], mask
            )
        elif self.pos == "sincos":
            body = SINCOS(self.inner_dim, name="pos_layer")(x[:, 1:], mask, coords)
        elif self.pos == "peg":
            body = PEG(self.inner_dim, use_bias=self.mil_bias, name="pos_layer")(
                x[:, 1:], mask
            )
        else:
            body = None
        if body is not None:
            x = jnp.concatenate([x[:, :1], body], axis=1)

        layer2 = TransLayer(self.inner_dim, self.n_heads, self.parity, self.use_flash, name="layer2")
        if return_attn:
            x, a, *_ = layer2(x, full_mask, training, True, False)
            attns.append(a[:, :, 1:])
        else:
            x = layer2(x, full_mask, training, False, False)

        x = nn.LayerNorm(epsilon=1e-5, name="norm")(x)[:, 0]
        logits = dense(self.n_classes, self.mil_bias, name="classifier")(x)

        out = {"logits": logits, "bag_feat": x}
        if return_attn:
            out["attn"] = attns[-1]  # [B,H,N]
            out["attns"] = attns
        return out
