"""RRT-MIL: region-partitioned re-embedding transformer + ABMIL pooling.

Reference: modules/rrt.py — ``InnerAttention`` (:72-167, full MSA within a
region with an EPEG depthwise-conv bias on the attention logits),
``RegionAttntion`` (:169-250, square-grid partition), ``CrossRegionAttntion``
(:252-357, MoE-style dispatch/combine routing of region summaries),
``RRTEncoder`` (:604-688) and ``RRTMIL`` (:690-758).

TPU re-design: the bag's bucket length is static, so the square grid, region
size and region count are all static shapes; ragged bags are handled by
masking — region attention softmaxes are masked per region, CR-MSA masks
empty regions, and padded positions are zeroed after every block. The
reference's dynamic region-count switch for >100k bags (rrt.py:200-208)
becomes a config choice.

Divergence note: the reference's RRTEncoder builds the CR-MSA TransLayer
without forwarding ``n_region`` (rrt.py:620), so its CR-MSA always partitions
with the default region_num=8 regardless of ``--region_num``; here one
``region_num`` drives both stages (identical at the deployed default 8,
golden-tested in test_torch_parity.py).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.masked import masked_softmax
from .layers import FeatureEmbed, TanhAttentionPool, GatedAttentionPool, dense, xavier_normal


def _region_grid(n: int, region_num: int):
    """Static grid geometry: H=W=ceil(sqrt(n)) rounded up to a multiple of
    region_num; region_size = H // region_num (reference rrt.py:196-215)."""
    h = int(math.ceil(math.sqrt(n)))
    h += (-h) % region_num
    return h, h // region_num


def region_partition(x, mask, region_num: int):
    """``x[B,N,C] → (x_r[B,R,P,C], mask_r[B,R,P])`` where R = region_num² and
    P = region_size² (reference region_partition rrt.py:44-55)."""
    b, n, c = x.shape
    h, rs = _region_grid(n, region_num)
    pad = h * h - n
    x = jnp.pad(x * mask[..., None].astype(x.dtype), ((0, 0), (0, pad), (0, 0)))
    m = jnp.pad(mask, ((0, 0), (0, pad)))
    nr = h // rs
    x = x.reshape(b, nr, rs, nr, rs, c).transpose(0, 1, 3, 2, 4, 5)
    x = x.reshape(b, nr * nr, rs * rs, c)
    m = m.reshape(b, nr, rs, nr, rs).transpose(0, 1, 3, 2, 4).reshape(b, nr * nr, rs * rs)
    return x, m, (h, rs, pad)


def region_reverse(x_r, geo, n: int):
    """Inverse of ``region_partition`` (reference rrt.py:57-69)."""
    b, r, p, c = x_r.shape
    h, rs, pad = geo
    nr = h // rs
    x = x_r.reshape(b, nr, nr, rs, rs, c).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h * h, c)[:, :n]


class InnerAttention(nn.Module):
    """Full MSA within a region, EPEG depthwise-conv bias on the attention
    logits (reference rrt.py:72-167, ``epeg_type='attn'`` — the constructed
    mode)."""

    dim: int = 512
    num_heads: int = 8
    epeg: bool = True
    epeg_k: int = 15
    qkv_bias: bool = True
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, mask, *, training: bool = False, return_attn: bool = False):
        g, p, c = x.shape  # [groups, tokens, dim]
        h = self.num_heads
        dh = self.dim // h
        qkv = dense(3 * h * dh, self.qkv_bias, name="qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q, k, v = (t.reshape(g, p, h, dh).transpose(0, 2, 1, 3) for t in (q, k, v))
        attn = jnp.einsum("ghpd,ghqd->ghpq", q * dh ** -0.5, k)

        if self.epeg:
            # depthwise conv over the query axis of the attention map,
            # per head (reference rrt.py:92-99,123-125)
            pe = nn.Conv(
                h,
                (self.epeg_k, 1),
                padding="SAME",
                feature_group_count=h,
                kernel_init=xavier_normal,
                name="pe",
            )(attn.transpose(0, 2, 3, 1))
            attn = attn + pe.transpose(0, 3, 1, 2)

        attn = masked_softmax(attn, mask[:, None, None, :], axis=-1)
        if self.dropout > 0:
            attn = nn.Dropout(self.dropout, deterministic=not training)(attn)
        out = jnp.einsum("ghpq,ghqd->ghpd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(g, p, h * dh)
        out = dense(self.dim, name="proj")(out)
        if self.dropout > 0:
            out = nn.Dropout(self.dropout, deterministic=not training)(out)
        out = jnp.where(mask[..., None], out, 0)
        if return_attn:
            return out, attn
        return out


class RegionAttention(nn.Module):
    """R-MSA: partition the square token grid into regions, full attention
    within each (reference RegionAttntion rrt.py:169-250)."""

    dim: int = 512
    num_heads: int = 8
    region_num: int = 8
    epeg: bool = True
    epeg_k: int = 15
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, mask, *, training: bool = False):
        b, n, c = x.shape
        x_r, m_r, geo = region_partition(x, mask, self.region_num)
        r = x_r.shape[1]
        out = InnerAttention(
            self.dim, self.num_heads, self.epeg, self.epeg_k,
            dropout=self.dropout, name="attn",
        )(x_r.reshape(b * r, -1, c), m_r.reshape(b * r, -1), training=training)
        out = region_reverse(out.reshape(b, r, -1, c), geo, n)
        return jnp.where(mask[..., None], out, 0)


class CrossRegionAttention(nn.Module):
    """CR-MSA: compress each region into ``crmsa_k`` representative tokens by
    learned dispatch weights, full attention *across regions*, then
    redistribute (reference CrossRegionAttntion rrt.py:252-357)."""

    dim: int = 512
    num_heads: int = 8
    region_num: int = 8
    crmsa_k: int = 3
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, mask, *, training: bool = False):
        b, n, c = x.shape
        x_r, m_r, geo = region_partition(x, mask, self.region_num)
        r, p = x_r.shape[1], x_r.shape[2]

        phi = self.param(
            "phi",
            nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform"),
            (self.dim, self.crmsa_k),
        )  # kaiming_uniform(a=sqrt(5)) equivalent
        logits = jnp.einsum("brpc,ck->brkp", x_r, phi)  # [B,R,K,P]
        combine = masked_softmax(logits, m_r[:, :, None, :], axis=-1)
        dispatch = jax.nn.softmax(logits, axis=2)  # over K
        lmin = jnp.min(jnp.where(m_r[:, :, None, :], logits, jnp.inf), -1, keepdims=True)
        lmax = jnp.max(jnp.where(m_r[:, :, None, :], logits, -jnp.inf), -1, keepdims=True)
        lmin = jnp.where(jnp.isfinite(lmin), lmin, 0.0)
        lmax = jnp.where(jnp.isfinite(lmax), lmax, 0.0)
        dispatch_mm = (logits - lmin) / (lmax - lmin + 1e-8)

        # region summaries [B,K,R,C]; attention across the region axis
        summaries = jnp.einsum("brkp,brpc->bkrc", combine, x_r)
        region_valid = jnp.any(m_r, axis=-1)  # [B,R]
        k = self.crmsa_k
        attended = InnerAttention(
            self.dim, self.num_heads, epeg=False, dropout=self.dropout, name="attn"
        )(
            summaries.reshape(b * k, r, c),
            jnp.tile(region_valid[:, None], (1, k, 1)).reshape(b * k, r),
            training=training,
        ).reshape(b, k, r, c)

        # redistribute to tokens (reference rrt.py:343-346)
        out = jnp.einsum("bkrc,brkp->brpc", attended, dispatch_mm * dispatch)
        out = region_reverse(out, geo, n)
        return jnp.where(mask[..., None], out, 0)


class RRTLayer(nn.Module):
    """Pre-norm residual block around R-MSA / CR-MSA (reference TransLayer
    rrt.py:457-545; ffn off by default, as constructed)."""

    dim: int = 512
    num_heads: int = 8
    region_num: int = 8
    attn: str = "rmsa"  # rmsa | crmsa
    epeg: bool = True
    epeg_k: int = 15
    crmsa_k: int = 3
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, mask, *, training: bool = False):
        normed = nn.LayerNorm(epsilon=1e-5, name="norm")(x)
        if self.attn == "rmsa":
            z = RegionAttention(
                self.dim, self.num_heads, self.region_num, self.epeg,
                self.epeg_k, self.dropout, name="attn",
            )(normed, mask, training=training)
        else:
            z = CrossRegionAttention(
                self.dim, self.num_heads, self.region_num, self.crmsa_k,
                self.dropout, name="attn",
            )(normed, mask, training=training)
        return x + z


class RRTEncoder(nn.Module):
    """(n_layers−1)×R-MSA + 1×CR-MSA + LayerNorm (reference rrt.py:604-688)."""

    dim: int = 512
    n_layers: int = 2
    num_heads: int = 8
    region_num: int = 8
    epeg: bool = True
    epeg_k: int = 15
    crmsa_k: int = 3
    crmsa_heads: int = 8
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, mask, *, training: bool = False):
        for i in range(self.n_layers - 1):
            x = RRTLayer(
                self.dim, self.num_heads, self.region_num, "rmsa",
                self.epeg, self.epeg_k, dropout=self.dropout, name=f"layer{i}",
            )(x, mask, training=training)
        x = RRTLayer(
            self.dim, self.crmsa_heads, self.region_num, "crmsa",
            crmsa_k=self.crmsa_k, dropout=self.dropout, name="cr_msa",
        )(x, mask, training=training)
        return nn.LayerNorm(epsilon=1e-5, name="norm")(x)


class RRTMIL(nn.Module):
    """``rrtmil``: embed → RRT re-embedding → ABMIL pool → head
    (reference RRTMIL rrt.py:690-758)."""

    input_dim: int = 1024
    n_classes: int = 2
    inner_dim: int = 512
    dropout: float = 0.25
    act: str = "relu"
    da_act: str = "relu"
    da_gated: bool = False
    n_layers: int = 2
    n_heads: int = 8
    region_num: int = 8
    epeg_k: int = 15
    crmsa_k: int = 3
    trans_dropout: float = 0.1
    mil_bias: bool = True

    @nn.compact
    def __call__(self, feats, mask, *, training: bool = False, return_attn: bool = False):
        x = FeatureEmbed(self.inner_dim, self.act, self.dropout, self.mil_bias)(
            feats, training=training
        )
        x = RRTEncoder(
            self.inner_dim,
            self.n_layers,
            self.n_heads,
            self.region_num,
            epeg_k=self.epeg_k,
            crmsa_k=self.crmsa_k,
            dropout=self.trans_dropout,
            name="online_encoder",
        )(x, mask, training=training)

        pool_cls = GatedAttentionPool if self.da_gated else TanhAttentionPool
        pooled, attn = pool_cls(attn_dim=128, act=self.da_act, use_bias=False, name="pool_fn")(
            x, mask, training=training
        )
        logits = dense(self.n_classes, self.mil_bias, name="predictor")(pooled[:, 0])
        out = {"logits": logits, "bag_feat": pooled[:, 0]}
        if return_attn:
            out["attn"] = attn[:, 0]
        return out
