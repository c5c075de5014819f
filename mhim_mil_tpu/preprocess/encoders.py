"""Patch encoders: the framework's equivalent of the reference's encoder
registry (reference: CLAM/models/builder.py:75-133, timm_wrapper.py:4-23,
CLAM/utils/constants.py).

``resnet50_trunc`` (the reference's default, a torchvision-weights ResNet-50
truncated after layer3 with global average pooling → 1024-d) and ``r18`` are
implemented natively in flax with a torch state-dict importer — golden-tested
feature-for-feature against a PyTorch execution of the same architecture.
The foundation-model entries (uni_v1 / conch_v1 / chief / gigap / sd_vae)
follow the reference's behavior of requiring an externally downloaded
checkpoint via environment variable (builder.py:30-72); without one they
raise with the same actionable message instead of silently degrading.

Design notes (TPU): inference-only — BatchNorm runs on running statistics;
convs use *explicit torch-style symmetric padding* (XLA's ``SAME`` pads
asymmetrically for even inputs under stride 2, which would break golden
parity); the encoder sweep is jitted once at a fixed patch batch and driven
by ``preprocess.extract.extract_features``.
"""

from __future__ import annotations

import os
from functools import partial
from typing import Any, Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

# Per-encoder normalization (reference CLAM/utils/constants.py:1-44).
ENCODER_NORM = {
    "resnet50_trunc": "imagenet",
    "r18": "imagenet",
    "uni_v1": "imagenet",
    "conch_v1": "openai_clip",
    "chief": "imagenet",
    "gigap": "imagenet",
    "sd_vae": "uniform",
}

ENCODER_DIM = {
    "resnet50_trunc": 1024,
    "r18": 256,
    "uni_v1": 1024,
    "chief": 768,
    "conch_v1": 768,
}

# Reference-compatible checkpoint discovery (builder.py:30-72 uses
# UNI_CKPT_PATH etc.; the CNN encoders there pull timm pretrained weights —
# here they read a torch state_dict from these variables).
ENCODER_CKPT_ENV = {
    "resnet50_trunc": "RESNET50_CKPT_PATH",
    "r18": "R18_CKPT_PATH",
    "uni_v1": "UNI_CKPT_PATH",
    "conch_v1": "CONCH_CKPT_PATH",
    "chief": "CHIEF_CKPT_PATH",
    "gigap": "GIGAP_CKPT_PATH",
    "sd_vae": "SD_VAE_CKPT_PATH",
}


def _conv(features: int, kernel: int, stride: int = 1, name: str = None):
    pad = (kernel - 1) // 2
    return nn.Conv(
        features,
        (kernel, kernel),
        strides=(stride, stride),
        padding=((pad, pad), (pad, pad)),  # torch-symmetric, not XLA SAME
        use_bias=False,
        name=name,
    )


class _BN(nn.Module):
    """Inference BatchNorm on running statistics (torch eval-mode bn)."""

    name_hint: str = ""

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (x.shape[-1],))
        bias = self.param("bias", nn.initializers.zeros, (x.shape[-1],))
        mean = self.variable(
            "batch_stats", "mean", nn.initializers.zeros, None, (x.shape[-1],)
        )
        var = self.variable(
            "batch_stats", "var", nn.initializers.ones, None, (x.shape[-1],)
        )
        inv = scale * jax.lax.rsqrt(var.value + 1e-5)
        return x * inv + (bias - mean.value * inv)


class Bottleneck(nn.Module):
    """torchvision ResNet v1.5 bottleneck: stride on the 3x3 conv."""

    planes: int
    stride: int = 1
    expansion: int = 4

    @nn.compact
    def __call__(self, x):
        out_ch = self.planes * self.expansion
        identity = x
        y = nn.relu(_BN(name="bn1")(_conv(self.planes, 1, name="conv1")(x)))
        y = nn.relu(
            _BN(name="bn2")(_conv(self.planes, 3, self.stride, name="conv2")(y))
        )
        y = _BN(name="bn3")(_conv(out_ch, 1, name="conv3")(y))
        if self.stride != 1 or x.shape[-1] != out_ch:
            identity = _BN(name="downsample_bn")(
                _conv(out_ch, 1, self.stride, name="downsample_conv")(x)
            )
        return nn.relu(y + identity)


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    expansion: int = 1

    @nn.compact
    def __call__(self, x):
        identity = x
        y = nn.relu(
            _BN(name="bn1")(_conv(self.planes, 3, self.stride, name="conv1")(x))
        )
        y = _BN(name="bn2")(_conv(self.planes, 3, name="conv2")(y))
        if self.stride != 1 or x.shape[-1] != self.planes:
            identity = _BN(name="downsample_bn")(
                _conv(self.planes, 1, self.stride, name="downsample_conv")(x)
            )
        return nn.relu(y + identity)


class ResNetTrunc(nn.Module):
    """ResNet truncated after layer3, mean-pooled (reference
    timm_wrapper.py:4-23: ``features_only, out_indices=(3,)`` +
    AdaptiveAvgPool → for ResNet-50 a 1024-d patch feature)."""

    depths: Sequence[int] = (3, 4, 6)  # layer1..layer3
    block: str = "bottleneck"  # bottleneck | basic

    @nn.compact
    def __call__(self, x):  # [B, H, W, 3] normalized
        blk = Bottleneck if self.block == "bottleneck" else BasicBlock
        x = nn.relu(_BN(name="bn1")(_conv(64, 7, 2, name="conv1")(x)))
        x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), constant_values=-jnp.inf)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        for li, (depth, planes) in enumerate(zip(self.depths, (64, 128, 256))):
            for bi in range(depth):
                stride = 2 if (bi == 0 and li > 0) else 1
                x = blk(planes, stride, name=f"layer{li + 1}_{bi}")(x)
        return jnp.mean(x, axis=(1, 2))  # [B, C]


class ViTEncoder(nn.Module):
    """ViT feature encoder (timm ``vit_large_patch16_224`` family): patch
    conv embed → cls token + learned pos embed → pre-norm blocks with
    optional LayerScale (``init_values=1e-5`` is how the reference builds
    UNI, CLAM/models/builder.py:86-90) → final LN → cls feature.

    ``dynamic_img_size`` behavior: the 14×14 pos-embed grid is bilinearly
    resized when the input resolution differs from 224.
    """

    embed_dim: int = 1024
    depth: int = 24
    heads: int = 16
    mlp_ratio: float = 4.0
    patch: int = 16
    layer_scale: bool = True

    @nn.compact
    def __call__(self, x):  # [B, H, W, 3] normalized
        b, ih, iw, _ = x.shape
        d = self.embed_dim
        x = nn.Conv(
            d, (self.patch, self.patch), strides=(self.patch, self.patch),
            padding="VALID", name="patch_embed",
        )(x)
        gh, gw = x.shape[1], x.shape[2]
        x = x.reshape(b, gh * gw, d)

        cls = self.param("cls_token", nn.initializers.zeros, (1, 1, d))
        pos = self.param(
            "pos_embed", nn.initializers.normal(0.02), (1, 197, d)
        )
        cls_pos, grid_pos = pos[:, :1], pos[:, 1:]
        side = int(grid_pos.shape[1] ** 0.5)
        if (gh, gw) != (side, side):
            grid_pos = jax.image.resize(
                grid_pos.reshape(1, side, side, d), (1, gh, gw, d), "bilinear"
            ).reshape(1, gh * gw, d)
        x = x + grid_pos
        x = jnp.concatenate(
            [jnp.broadcast_to(cls + cls_pos, (b, 1, d)), x], axis=1
        )

        for i in range(self.depth):
            x = _ViTBlock(
                d, self.heads, self.mlp_ratio, self.layer_scale,
                name=f"block{i}",
            )(x)
        x = nn.LayerNorm(epsilon=1e-6, name="norm")(x)
        return x[:, 0]


class _ViTBlock(nn.Module):
    dim: int
    heads: int
    mlp_ratio: float
    layer_scale: bool

    @nn.compact
    def __call__(self, x):
        d, h = self.dim, self.heads
        y = nn.LayerNorm(epsilon=1e-6, name="norm1")(x)
        qkv = nn.Dense(3 * d, name="qkv")(y)
        q, k, v = jnp.split(qkv.reshape(*y.shape[:2], 3, h, d // h), 3, axis=2)
        q, k, v = (t[:, :, 0].transpose(0, 2, 1, 3) for t in (q, k, v))
        a = jax.nn.softmax(
            jnp.einsum("bhnd,bhmd->bhnm", q * (d // h) ** -0.5, k), axis=-1
        )
        y = jnp.einsum("bhnm,bhmd->bnhd", a, v).reshape(*x.shape)
        y = nn.Dense(d, name="attn_proj")(y)
        if self.layer_scale:
            y = y * self.param("ls1", nn.initializers.ones, (d,))
        x = x + y
        y = nn.LayerNorm(epsilon=1e-6, name="norm2")(x)
        y = nn.Dense(int(d * self.mlp_ratio), name="fc1")(y)
        y = nn.gelu(y, approximate=False)  # torch-exact erf GELU
        y = nn.Dense(d, name="fc2")(y)
        if self.layer_scale:
            y = y * self.param("ls2", nn.initializers.ones, (d,))
        return x + y


def import_vit(sd: Dict[str, Any]) -> Dict[str, Any]:
    """timm ViT state_dict (vit_large_patch16_224 naming) → ViTEncoder
    params. LayerScale gammas (``ls{1,2}.gamma``) map when present."""
    sd = {k[6:] if k.startswith("model.") else k: v for k, v in sd.items()}
    params: Dict[str, Any] = {
        "patch_embed": {
            "kernel": _t(sd["patch_embed.proj.weight"]).transpose(2, 3, 1, 0),
            "bias": _t(sd["patch_embed.proj.bias"]),
        },
        "cls_token": _t(sd["cls_token"]),
        "pos_embed": _t(sd["pos_embed"]),
        "norm": {"scale": _t(sd["norm.weight"]), "bias": _t(sd["norm.bias"])},
    }
    i = 0
    while f"blocks.{i}.norm1.weight" in sd:
        base = f"blocks.{i}"
        blk = {
            "norm1": {
                "scale": _t(sd[f"{base}.norm1.weight"]),
                "bias": _t(sd[f"{base}.norm1.bias"]),
            },
            "qkv": {
                "kernel": _t(sd[f"{base}.attn.qkv.weight"]).T,
                "bias": _t(sd[f"{base}.attn.qkv.bias"]),
            },
            "attn_proj": {
                "kernel": _t(sd[f"{base}.attn.proj.weight"]).T,
                "bias": _t(sd[f"{base}.attn.proj.bias"]),
            },
            "norm2": {
                "scale": _t(sd[f"{base}.norm2.weight"]),
                "bias": _t(sd[f"{base}.norm2.bias"]),
            },
            "fc1": {
                "kernel": _t(sd[f"{base}.mlp.fc1.weight"]).T,
                "bias": _t(sd[f"{base}.mlp.fc1.bias"]),
            },
            "fc2": {
                "kernel": _t(sd[f"{base}.mlp.fc2.weight"]).T,
                "bias": _t(sd[f"{base}.mlp.fc2.bias"]),
            },
        }
        if f"{base}.ls1.gamma" in sd:
            blk["ls1"] = _t(sd[f"{base}.ls1.gamma"])
            blk["ls2"] = _t(sd[f"{base}.ls2.gamma"])
        params[f"block{i}"] = blk
        i += 1
    return {"params": params}


class ConvStem(nn.Module):
    """CHIEF's convolutional patch embed (reference CLAM/models/chief.py:5-43):
    two stride-2 conv+BN+ReLU stages (3→d/8→d/4) then a 1x1 conv to the embed
    dim, flattened to tokens and LayerNormed."""

    embed_dim: int = 96

    @nn.compact
    def __call__(self, x):  # [B, H, W, 3]
        d = self.embed_dim
        x = nn.relu(_BN(name="bn0")(_conv(d // 8, 3, 2, name="conv0")(x)))
        x = nn.relu(_BN(name="bn1")(_conv(d // 4, 3, 2, name="conv1")(x)))
        x = nn.Conv(d, (1, 1), use_bias=True, name="conv2")(x)
        b, h, w, _ = x.shape
        x = x.reshape(b, h * w, d)
        return nn.LayerNorm(epsilon=1e-5, name="norm")(x), (h, w)


def _rel_pos_index(w: int) -> np.ndarray:
    """Swin relative-position index over a w×w window (host-side table)."""
    coords = np.stack(np.meshgrid(np.arange(w), np.arange(w), indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]  # [2, w², w²]
    rel = rel.transpose(1, 2, 0) + (w - 1)
    return rel[..., 0] * (2 * w - 1) + rel[..., 1]  # [w², w²]


class _WindowAttention(nn.Module):
    dim: int
    heads: int
    window: int

    @nn.compact
    def __call__(self, x, attn_mask=None):  # x: [nW*B, w², C]
        w2 = self.window * self.window
        h = self.heads
        dh = self.dim // h
        qkv = nn.Dense(3 * self.dim, name="qkv")(x)
        q, k, v = jnp.split(qkv.reshape(-1, w2, 3, h, dh), 3, axis=2)
        q, k, v = (t[:, :, 0].transpose(0, 2, 1, 3) for t in (q, k, v))
        sim = jnp.einsum("bhnd,bhmd->bhnm", q * dh ** -0.5, k)
        table = self.param(
            "rel_bias_table",
            nn.initializers.normal(0.02),
            ((2 * self.window - 1) ** 2, h),
        )
        idx = _rel_pos_index(self.window).reshape(-1)
        bias = table[idx].reshape(w2, w2, h).transpose(2, 0, 1)
        sim = sim + bias[None]
        if attn_mask is not None:  # [nW, w², w²] shifted-window mask
            nw = attn_mask.shape[0]
            sim = sim.reshape(-1, nw, h, w2, w2) + attn_mask[None, :, None]
            sim = sim.reshape(-1, h, w2, w2)
        a = jax.nn.softmax(sim, axis=-1)
        out = jnp.einsum("bhnm,bhmd->bnhd", a, v).reshape(-1, w2, self.dim)
        return nn.Dense(self.dim, name="proj")(out)


class _SwinBlock(nn.Module):
    dim: int
    heads: int
    window: int
    shift: int
    mlp_ratio: float = 4.0

    @nn.compact
    def __call__(self, x, hw):  # x: [B, L, C]
        H, W = hw
        b, L, c = x.shape
        w = self.window
        shortcut = x
        x = nn.LayerNorm(epsilon=1e-5, name="norm1")(x).reshape(b, H, W, c)
        if self.shift:
            x = jnp.roll(x, (-self.shift, -self.shift), axis=(1, 2))
        # window partition
        x = x.reshape(b, H // w, w, W // w, w, c).transpose(0, 1, 3, 2, 4, 5)
        x = x.reshape(-1, w * w, c)
        attn_mask = None
        if self.shift:
            # standard shifted-window mask: tokens from different pre-shift
            # regions must not attend to each other
            img = np.zeros((H, W), np.int32)
            cnt = 0
            for hs in (slice(0, -w), slice(-w, -self.shift), slice(-self.shift, None)):
                for ws in (slice(0, -w), slice(-w, -self.shift), slice(-self.shift, None)):
                    img[hs, ws] = cnt
                    cnt += 1
            mw = img.reshape(H // w, w, W // w, w).transpose(0, 2, 1, 3).reshape(-1, w * w)
            diff = mw[:, :, None] != mw[:, None, :]
            attn_mask = jnp.where(jnp.asarray(diff), -100.0, 0.0)
        x = _WindowAttention(self.dim, self.heads, w, name="attn")(x, attn_mask)
        x = x.reshape(b, H // w, W // w, w, w, c).transpose(0, 1, 3, 2, 4, 5)
        x = x.reshape(b, H, W, c)
        if self.shift:
            x = jnp.roll(x, (self.shift, self.shift), axis=(1, 2))
        x = shortcut + x.reshape(b, L, c)
        y = nn.LayerNorm(epsilon=1e-5, name="norm2")(x)
        y = nn.Dense(int(self.dim * self.mlp_ratio), name="fc1")(y)
        y = nn.Dense(self.dim, name="fc2")(nn.gelu(y, approximate=False))
        return x + y


class _PatchMerging(nn.Module):
    dim: int  # input dim

    @nn.compact
    def __call__(self, x, hw):  # [B, L, C] -> [B, L/4, 2C]
        H, W = hw
        b, _, c = x.shape
        x = x.reshape(b, H // 2, 2, W // 2, 2, c).transpose(0, 1, 3, 4, 2, 5)
        # timm concat order: x0=(0,0), x1=(1,0), x2=(0,1), x3=(1,1) over
        # (row, col) — i.e. [..., col, row, c] flattened as row-major of
        # (col-offset, row-offset)
        x = x.reshape(b, (H // 2) * (W // 2), 4 * c)
        x = nn.LayerNorm(epsilon=1e-5, name="norm")(x)
        return nn.Dense(2 * self.dim, use_bias=False, name="reduction")(x)


class SwinChief(nn.Module):
    """CHIEF patch encoder: Swin-T (window 7, depths 2/2/6/2) with the
    ConvStem patch embed, mean-pooled to a 768-d feature (reference
    builder.py:101-110: timm ``swin_tiny_patch4_window7_224`` with
    ``embed_layer=ConvStem`` and ``head=Identity``). Input must be 224×224
    (the stem asserts the same upstream, chief.py:37-38)."""

    embed_dim: int = 96
    depths: Sequence[int] = (2, 2, 6, 2)
    heads: Sequence[int] = (3, 6, 12, 24)
    window: int = 7

    @nn.compact
    def __call__(self, x):  # [B, 224, 224, 3] normalized
        x, (h, w) = ConvStem(self.embed_dim, name="patch_embed")(x)
        dim = self.embed_dim
        for si, (depth, heads) in enumerate(zip(self.depths, self.heads)):
            if si > 0:
                x = _PatchMerging(dim, name=f"merge{si - 1}")(x, (h, w))
                h, w, dim = h // 2, w // 2, dim * 2
            for bi in range(depth):
                shift = 0 if (bi % 2 == 0 or h <= self.window) else self.window // 2
                x = _SwinBlock(
                    dim, heads, self.window, shift, name=f"stage{si}_block{bi}"
                )(x, (h, w))
        x = nn.LayerNorm(epsilon=1e-5, name="norm")(x)
        return jnp.mean(x, axis=1)  # timm avg pool over tokens


def import_swin_chief(sd: Dict[str, Any]) -> Dict[str, Any]:
    """timm Swin-T (+CHIEF ConvStem) state_dict → SwinChief variables.
    Accepts both timm layouts for the inter-stage patch merging: old
    (``layers.{i}.downsample`` at stage end) and new
    (``layers.{i+1}.downsample`` at stage start)."""
    sd = {k[6:] if k.startswith("model.") else k: v for k, v in sd.items()}
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    # ConvStem: proj.0 conv, proj.1 bn, proj.3 conv, proj.4 bn, proj.6 conv1x1
    pe: Dict[str, Any] = {
        "conv0": {"kernel": _t(sd["patch_embed.proj.0.weight"]).transpose(2, 3, 1, 0)},
        "bn0": {"scale": _t(sd["patch_embed.proj.1.weight"]),
                "bias": _t(sd["patch_embed.proj.1.bias"])},
        "conv1": {"kernel": _t(sd["patch_embed.proj.3.weight"]).transpose(2, 3, 1, 0)},
        "bn1": {"scale": _t(sd["patch_embed.proj.4.weight"]),
                "bias": _t(sd["patch_embed.proj.4.bias"])},
        "conv2": {"kernel": _t(sd["patch_embed.proj.6.weight"]).transpose(2, 3, 1, 0),
                  "bias": _t(sd["patch_embed.proj.6.bias"])},
        "norm": {"scale": _t(sd["patch_embed.norm.weight"]),
                 "bias": _t(sd["patch_embed.norm.bias"])},
    }
    stats["patch_embed"] = {
        "bn0": {"mean": _t(sd["patch_embed.proj.1.running_mean"]),
                "var": _t(sd["patch_embed.proj.1.running_var"])},
        "bn1": {"mean": _t(sd["patch_embed.proj.4.running_mean"]),
                "var": _t(sd["patch_embed.proj.4.running_var"])},
    }
    params["patch_embed"] = pe

    n_stages = sum(1 for k in sd if k.endswith(".blocks.0.norm1.weight") and k.startswith("layers."))
    # Discriminate the two timm patch-merging layouts ONCE: only the old
    # layout (downsample at stage end) has layers.0.downsample. Probing both
    # key families per-stage would hand merge{si} the *previous* stage's
    # reduction in the new layout (layers.{si}.downsample there belongs to
    # merge{si-1}) and fail with a dot-shape mismatch at apply time.
    old_merge_layout = "layers.0.downsample.reduction.weight" in sd
    for si in range(n_stages):
        bi = 0
        while f"layers.{si}.blocks.{bi}.norm1.weight" in sd:
            base = f"layers.{si}.blocks.{bi}"
            params[f"stage{si}_block{bi}"] = {
                "norm1": {"scale": _t(sd[f"{base}.norm1.weight"]),
                          "bias": _t(sd[f"{base}.norm1.bias"])},
                "attn": {
                    "qkv": {"kernel": _t(sd[f"{base}.attn.qkv.weight"]).T,
                            "bias": _t(sd[f"{base}.attn.qkv.bias"])},
                    "proj": {"kernel": _t(sd[f"{base}.attn.proj.weight"]).T,
                             "bias": _t(sd[f"{base}.attn.proj.bias"])},
                    "rel_bias_table": _t(
                        sd[f"{base}.attn.relative_position_bias_table"]
                    ),
                },
                "norm2": {"scale": _t(sd[f"{base}.norm2.weight"]),
                          "bias": _t(sd[f"{base}.norm2.bias"])},
                "fc1": {"kernel": _t(sd[f"{base}.mlp.fc1.weight"]).T,
                        "bias": _t(sd[f"{base}.mlp.fc1.bias"])},
                "fc2": {"kernel": _t(sd[f"{base}.mlp.fc2.weight"]).T,
                        "bias": _t(sd[f"{base}.mlp.fc2.bias"])},
            }
            bi += 1
        # patch merging after stage si (old timm) or before stage si+1 (new)
        src = (f"layers.{si}.downsample" if old_merge_layout
               else f"layers.{si + 1}.downsample")
        if f"{src}.reduction.weight" in sd:
            params[f"merge{si}"] = {
                "norm": {"scale": _t(sd[f"{src}.norm.weight"]),
                         "bias": _t(sd[f"{src}.norm.bias"])},
                "reduction": {"kernel": _t(sd[f"{src}.reduction.weight"]).T},
            }
    params["norm"] = {"scale": _t(sd["norm.weight"]), "bias": _t(sd["norm.bias"])}
    return {"params": params, "batch_stats": stats}


class CLIPVisualTower(nn.Module):
    """CLIP-style ViT visual tower (conch_v1: CLIP ViT-B/16, reference
    builder.py:91-97 uses CONCH's ``encode_image(proj_contrast=False,
    normalize=False)`` — the pooled image feature *before* the contrastive
    projection). open_clip architecture: biasless conv patch embed, class
    embedding + positional embedding, pre-transformer LN, resblocks with
    torch-MultiheadAttention parameterization, post-LN on the cls token."""

    embed_dim: int = 768
    depth: int = 12
    heads: int = 12
    patch: int = 16

    @nn.compact
    def __call__(self, x):  # [B, H, W, 3] normalized
        b = x.shape[0]
        d = self.embed_dim
        x = nn.Conv(
            d, (self.patch, self.patch), strides=(self.patch, self.patch),
            padding="VALID", use_bias=False, name="conv1",
        )(x)
        gh, gw = x.shape[1], x.shape[2]
        x = x.reshape(b, gh * gw, d)
        cls = self.param("class_embedding", nn.initializers.normal(0.02), (d,))
        x = jnp.concatenate([jnp.broadcast_to(cls, (b, 1, d)), x], axis=1)
        pos = self.param(
            "positional_embedding", nn.initializers.normal(0.02),
            (1 + gh * gw, d),
        )
        x = x + pos[None]
        x = nn.LayerNorm(epsilon=1e-5, name="ln_pre")(x)
        for i in range(self.depth):
            x = _CLIPBlock(d, self.heads, name=f"resblock{i}")(x)
        return nn.LayerNorm(epsilon=1e-5, name="ln_post")(x[:, 0])


class _CLIPBlock(nn.Module):
    dim: int
    heads: int

    @nn.compact
    def __call__(self, x):
        d, h = self.dim, self.heads
        y = nn.LayerNorm(epsilon=1e-5, name="ln_1")(x)
        qkv = nn.Dense(3 * d, name="in_proj")(y)
        q, k, v = jnp.split(qkv.reshape(*y.shape[:2], 3, h, d // h), 3, axis=2)
        q, k, v = (t[:, :, 0].transpose(0, 2, 1, 3) for t in (q, k, v))
        a = jax.nn.softmax(
            jnp.einsum("bhnd,bhmd->bhnm", q * (d // h) ** -0.5, k), axis=-1
        )
        y = jnp.einsum("bhnm,bhmd->bnhd", a, v).reshape(*x.shape)
        x = x + nn.Dense(d, name="out_proj")(y)
        y = nn.LayerNorm(epsilon=1e-5, name="ln_2")(x)
        y = nn.Dense(4 * d, name="c_fc")(y)
        y = nn.gelu(y, approximate=False)
        return x + nn.Dense(d, name="c_proj")(y)


def import_clip_visual(sd: Dict[str, Any]) -> Dict[str, Any]:
    """open_clip ``visual.*`` state_dict → CLIPVisualTower params. CoCa-style
    CONCH checkpoints that carry a timm trunk (``visual.trunk.*``) instead
    route through :func:`import_vit` in the registry; attentional-pooler
    variants raise with the offending keys named."""
    sd = {k[7:] if k.startswith("visual.") else k: v for k, v in sd.items()}
    bad = [k for k in sd if k.startswith("attn_pool")]
    if bad:
        raise NotImplementedError(
            f"CoCa attentional-pooler checkpoints not supported (keys {bad[:2]}…); "
            "supported subset: classic CLIP visual towers and timm-trunk ViTs"
        )
    params: Dict[str, Any] = {
        "conv1": {"kernel": _t(sd["conv1.weight"]).transpose(2, 3, 1, 0)},
        "class_embedding": _t(sd["class_embedding"]).reshape(-1),
        "positional_embedding": _t(sd["positional_embedding"]),
        "ln_pre": {"scale": _t(sd["ln_pre.weight"]), "bias": _t(sd["ln_pre.bias"])},
        "ln_post": {"scale": _t(sd["ln_post.weight"]), "bias": _t(sd["ln_post.bias"])},
    }
    i = 0
    while f"transformer.resblocks.{i}.ln_1.weight" in sd:
        base = f"transformer.resblocks.{i}"
        params[f"resblock{i}"] = {
            "ln_1": {"scale": _t(sd[f"{base}.ln_1.weight"]),
                     "bias": _t(sd[f"{base}.ln_1.bias"])},
            "in_proj": {"kernel": _t(sd[f"{base}.attn.in_proj_weight"]).T,
                        "bias": _t(sd[f"{base}.attn.in_proj_bias"])},
            "out_proj": {"kernel": _t(sd[f"{base}.attn.out_proj.weight"]).T,
                         "bias": _t(sd[f"{base}.attn.out_proj.bias"])},
            "ln_2": {"scale": _t(sd[f"{base}.ln_2.weight"]),
                     "bias": _t(sd[f"{base}.ln_2.bias"])},
            "c_fc": {"kernel": _t(sd[f"{base}.mlp.c_fc.weight"]).T,
                     "bias": _t(sd[f"{base}.mlp.c_fc.bias"])},
            "c_proj": {"kernel": _t(sd[f"{base}.mlp.c_proj.weight"]).T,
                       "bias": _t(sd[f"{base}.mlp.c_proj.bias"])},
        }
        i += 1
    return {"params": params}


class _VAEResnetBlock(nn.Module):
    """diffusers ResnetBlock2D (GroupNorm32 → SiLU → conv3) × 2 with a 1x1
    shortcut on channel change."""

    out_ch: int

    @nn.compact
    def __call__(self, x):
        h = nn.silu(nn.GroupNorm(32, epsilon=1e-6, name="norm1")(x))
        h = nn.Conv(self.out_ch, (3, 3), padding=((1, 1), (1, 1)), name="conv1")(h)
        h = nn.silu(nn.GroupNorm(32, epsilon=1e-6, name="norm2")(h))
        h = nn.Conv(self.out_ch, (3, 3), padding=((1, 1), (1, 1)), name="conv2")(h)
        if x.shape[-1] != self.out_ch:
            x = nn.Conv(self.out_ch, (1, 1), name="conv_shortcut")(x)
        return x + h


class _VAEAttention(nn.Module):
    """Single-head spatial self-attention of the VAE mid block."""

    @nn.compact
    def __call__(self, x):  # [B, H, W, C]
        b, h, w, c = x.shape
        y = nn.GroupNorm(32, epsilon=1e-6, name="group_norm")(x).reshape(b, h * w, c)
        q = nn.Dense(c, name="to_q")(y)
        k = nn.Dense(c, name="to_k")(y)
        v = nn.Dense(c, name="to_v")(y)
        a = jax.nn.softmax(
            jnp.einsum("bnc,bmc->bnm", q, k) * c ** -0.5, axis=-1
        )
        y = nn.Dense(c, name="to_out")(jnp.einsum("bnm,bmc->bnc", a, v))
        return x + y.reshape(b, h, w, c)


class SDVAEEncoder(nn.Module):
    """Stable-Diffusion VAE encoder (``sd_vae``): diffusers AutoencoderKL's
    encoder + quant_conv → scaled latents (reference
    CLAM/models/vae_warpper.py:1-14 wraps ``AutoencoderKL("sd-vae-ft-ema")``
    and returns ``encode(x).latent_dist.sample() * 0.18215``).

    Divergence (documented): this returns the distribution MEAN × 0.18215 —
    the reference *samples*, making its stored features stochastic; a
    deterministic encoder is strictly more useful for a feature store and
    equals the reference in expectation. Output is flattened ``[B, 4·(H/8)·
    (W/8)]`` so the store keeps its ``[N, D]`` contract."""

    block_out_channels: Sequence[int] = (128, 128, 256, 512)
    layers_per_block: int = 2
    latent_channels: int = 4

    @nn.compact
    def __call__(self, x):  # [B, H, W, 3] in [-1, 1]-style normalization
        chans = self.block_out_channels
        x = nn.Conv(chans[0], (3, 3), padding=((1, 1), (1, 1)), name="conv_in")(x)
        for i, ch in enumerate(chans):
            for j in range(self.layers_per_block):
                x = _VAEResnetBlock(ch, name=f"down{i}_res{j}")(x)
            if i < len(chans) - 1:
                # diffusers Downsample2D: asymmetric (0,1) pad + stride-2 conv
                x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
                x = nn.Conv(
                    ch, (3, 3), strides=(2, 2), padding="VALID",
                    name=f"down{i}_downsample",
                )(x)
        x = _VAEResnetBlock(chans[-1], name="mid_res0")(x)
        x = _VAEAttention(name="mid_attn")(x)
        x = _VAEResnetBlock(chans[-1], name="mid_res1")(x)
        x = nn.silu(nn.GroupNorm(32, epsilon=1e-6, name="conv_norm_out")(x))
        moments = nn.Conv(
            2 * self.latent_channels, (3, 3), padding=((1, 1), (1, 1)),
            name="conv_out",
        )(x)
        moments = nn.Conv(
            2 * self.latent_channels, (1, 1), name="quant_conv"
        )(moments)
        mean = moments[..., : self.latent_channels]
        b = mean.shape[0]
        # flatten in the reference's [C, H, W] storage order
        return (mean * 0.18215).transpose(0, 3, 1, 2).reshape(b, -1)


def import_sd_vae(sd: Dict[str, Any]) -> Dict[str, Any]:
    """diffusers AutoencoderKL state_dict → SDVAEEncoder params (encoder.*
    + quant_conv; both attention naming families: modern ``to_q/to_out.0``
    and legacy ``query/proj_attn``)."""
    def conv(src):
        return {"kernel": _t(sd[f"{src}.weight"]).transpose(2, 3, 1, 0),
                "bias": _t(sd[f"{src}.bias"])}

    def gn(src):
        return {"scale": _t(sd[f"{src}.weight"]), "bias": _t(sd[f"{src}.bias"])}

    def lin(src):
        w = _t(sd[f"{src}.weight"])
        if w.ndim == 4:  # legacy 1x1-conv attention projections
            w = w[:, :, 0, 0]
        return {"kernel": w.T, "bias": _t(sd[f"{src}.bias"])}

    def resnet(dst, src):
        p = {
            "norm1": gn(f"{src}.norm1"), "conv1": conv(f"{src}.conv1"),
            "norm2": gn(f"{src}.norm2"), "conv2": conv(f"{src}.conv2"),
        }
        if f"{src}.conv_shortcut.weight" in sd:
            p["conv_shortcut"] = conv(f"{src}.conv_shortcut")
        params[dst] = p

    params: Dict[str, Any] = {"conv_in": conv("encoder.conv_in")}
    i = 0
    while f"encoder.down_blocks.{i}.resnets.0.norm1.weight" in sd:
        j = 0
        while f"encoder.down_blocks.{i}.resnets.{j}.norm1.weight" in sd:
            resnet(f"down{i}_res{j}", f"encoder.down_blocks.{i}.resnets.{j}")
            j += 1
        if f"encoder.down_blocks.{i}.downsamplers.0.conv.weight" in sd:
            params[f"down{i}_downsample"] = conv(
                f"encoder.down_blocks.{i}.downsamplers.0.conv"
            )
        i += 1
    resnet("mid_res0", "encoder.mid_block.resnets.0")
    resnet("mid_res1", "encoder.mid_block.resnets.1")
    ab = "encoder.mid_block.attentions.0"
    modern = f"{ab}.to_q.weight" in sd
    params["mid_attn"] = {
        "group_norm": gn(f"{ab}.group_norm"),
        "to_q": lin(f"{ab}.to_q" if modern else f"{ab}.query"),
        "to_k": lin(f"{ab}.to_k" if modern else f"{ab}.key"),
        "to_v": lin(f"{ab}.to_v" if modern else f"{ab}.value"),
        "to_out": lin(f"{ab}.to_out.0" if modern else f"{ab}.proj_attn"),
    }
    params["conv_norm_out"] = gn("encoder.conv_norm_out")
    params["conv_out"] = conv("encoder.conv_out")
    params["quant_conv"] = conv("quant_conv")
    return {"params": params}


# ---- torch state-dict import --------------------------------------------------


def _t(v) -> np.ndarray:
    try:
        return v.detach().cpu().numpy()
    except AttributeError:
        return np.asarray(v)


def import_resnet_trunc(sd: Dict[str, Any], depths=(3, 4, 6), block="bottleneck"):
    """torchvision/timm ResNet state_dict → (params, batch_stats) for
    :class:`ResNetTrunc`. Accepts the reference ``TimmCNNEncoder`` wrapper
    prefix ``model.`` (timm_wrapper.py:10) and raw torchvision keys."""
    sd = {k[6:] if k.startswith("model.") else k: v for k, v in sd.items()}

    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    def conv(dst, src):
        params[dst] = {"kernel": _t(sd[f"{src}.weight"]).transpose(2, 3, 1, 0)}

    def bn(dst, src):
        params[dst] = {"scale": _t(sd[f"{src}.weight"]), "bias": _t(sd[f"{src}.bias"])}
        stats[dst] = {
            "mean": _t(sd[f"{src}.running_mean"]),
            "var": _t(sd[f"{src}.running_var"]),
        }

    conv("conv1", "conv1")
    bn("bn1", "bn1")
    n_convs = 3 if block == "bottleneck" else 2
    for li, depth in enumerate(depths):
        for bi in range(depth):
            base = f"layer{li + 1}.{bi}"
            dstb = f"layer{li + 1}_{bi}"
            blk_p: Dict[str, Any] = {}
            blk_s: Dict[str, Any] = {}
            for ci in range(1, n_convs + 1):
                blk_p[f"conv{ci}"] = {
                    "kernel": _t(sd[f"{base}.conv{ci}.weight"]).transpose(2, 3, 1, 0)
                }
                blk_p[f"bn{ci}"] = {
                    "scale": _t(sd[f"{base}.bn{ci}.weight"]),
                    "bias": _t(sd[f"{base}.bn{ci}.bias"]),
                }
                blk_s[f"bn{ci}"] = {
                    "mean": _t(sd[f"{base}.bn{ci}.running_mean"]),
                    "var": _t(sd[f"{base}.bn{ci}.running_var"]),
                }
            if f"{base}.downsample.0.weight" in sd:
                blk_p["downsample_conv"] = {
                    "kernel": _t(sd[f"{base}.downsample.0.weight"]).transpose(2, 3, 1, 0)
                }
                blk_p["downsample_bn"] = {
                    "scale": _t(sd[f"{base}.downsample.1.weight"]),
                    "bias": _t(sd[f"{base}.downsample.1.bias"]),
                }
                blk_s["downsample_bn"] = {
                    "mean": _t(sd[f"{base}.downsample.1.running_mean"]),
                    "var": _t(sd[f"{base}.downsample.1.running_var"]),
                }
            params[dstb] = blk_p
            stats[dstb] = blk_s
    return {"params": params, "batch_stats": stats}


# ---- registry -----------------------------------------------------------------


def get_encoder(
    name: str, ckpt_path: str | None = None, dtype=jnp.float32
) -> Tuple[Any, str]:
    """Build a jittable ``fn(images[B,P,P,3] normalized) -> [B,D]`` and the
    normalization key for :mod:`preprocess.extract` (reference
    ``get_encoder``, CLAM/models/builder.py:75-133).

    ``ckpt_path`` (or the reference-style env var, ENCODER_CKPT_ENV) points
    at a torch state_dict ``.pt``/``.pth``; CNN encoders fall back to random
    init with a loud warning (this environment has no weight downloads —
    builder.py pulls timm pretrained weights instead).
    """
    ckpt_path = ckpt_path or os.environ.get(ENCODER_CKPT_ENV.get(name, ""), "")

    if name in ("resnet50_trunc", "r18"):
        depths, block = ((3, 4, 6), "bottleneck") if name == "resnet50_trunc" else (
            (2, 2, 2),
            "basic",
        )
        model = ResNetTrunc(depths=depths, block=block)
        if ckpt_path:
            import torch

            sd = torch.load(ckpt_path, map_location="cpu", weights_only=False)
            sd = sd.get("state_dict", sd) if isinstance(sd, dict) else sd
            variables = import_resnet_trunc(sd, depths, block)
            variables = jax.tree.map(jnp.asarray, variables)
        else:
            import warnings

            warnings.warn(
                f"{name}: no checkpoint (set {ENCODER_CKPT_ENV[name]} or pass "
                "ckpt_path) — using RANDOM weights; features are only useful "
                "for pipeline tests."
            )
            variables = model.init(
                jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 3), dtype)
            )
        fn = jax.jit(partial(model.apply, variables))
        return fn, ENCODER_NORM[name]

    if name in ("uni_v1", "gigap"):
        # timm-format ViT checkpoints: UNI = ViT-L/16 w/ layerscale 1e-5
        # (reference builder.py:86-91), prov-gigapath = ViT-giant/16
        # (builder.py:113-124). Geometry is inferred from the state dict;
        # the importer is golden-tested on the ViT family.
        if not ckpt_path:
            env = ENCODER_CKPT_ENV[name]
            raise NotImplementedError(
                f"encoder '{name}' needs its downloaded checkpoint: set "
                f"{env} or pass ckpt_path (reference builder.py:30-72 "
                "asserts the same)."
            )
        import torch

        sd = torch.load(ckpt_path, map_location="cpu", weights_only=False)
        sd = sd.get("state_dict", sd) if isinstance(sd, dict) else sd
        sd = {k[6:] if k.startswith("model.") else k: v for k, v in sd.items()}
        has_ls = any(k.endswith("ls1.gamma") for k in sd)
        # heads follow the timm convention head_dim = 64
        dim = int(sd["pos_embed"].shape[-1])
        depth = sum(1 for k in sd if k.endswith(".norm1.weight"))
        patch = int(sd["patch_embed.proj.weight"].shape[-1])
        model = ViTEncoder(
            embed_dim=dim, depth=depth, heads=max(dim // 64, 1),
            patch=patch, layer_scale=has_ls,
        )
        variables = jax.tree.map(jnp.asarray, import_vit(sd))
        fn = jax.jit(partial(model.apply, variables))
        return fn, ENCODER_NORM[name]

    if name == "chief":
        # Swin-T + ConvStem → 768-d (reference builder.py:101-110)
        if not ckpt_path:
            raise NotImplementedError(
                "encoder 'chief' needs its downloaded checkpoint: set "
                "CHIEF_CKPT_PATH or pass ckpt_path (reference builder.py:30-72 "
                "asserts the same)."
            )
        import torch

        sd = torch.load(ckpt_path, map_location="cpu", weights_only=False)
        if isinstance(sd, dict) and "model" in sd:
            sd = sd["model"]  # reference unwraps td['model'], builder.py:110
        sd = {k[6:] if k.startswith("model.") else k: v for k, v in sd.items()}
        # geometry from the state dict (Swin-T defaults: 96, 2/2/6/2, 3/6/12/24)
        embed = int(_t(sd["patch_embed.proj.6.weight"]).shape[0])
        depths, heads = [], []
        si = 0
        while f"layers.{si}.blocks.0.norm1.weight" in sd:
            bi = 0
            while f"layers.{si}.blocks.{bi}.norm1.weight" in sd:
                bi += 1
            depths.append(bi)
            heads.append(
                int(_t(sd[f"layers.{si}.blocks.0.attn.relative_position_bias_table"]).shape[1])
            )
            si += 1
        win = int(
            round(
                (_t(sd["layers.0.blocks.0.attn.relative_position_bias_table"]).shape[0]
                 ** 0.5 + 1) / 2
            )
        )
        model = SwinChief(
            embed_dim=embed, depths=tuple(depths), heads=tuple(heads), window=win
        )
        variables = jax.tree.map(jnp.asarray, import_swin_chief(sd))
        fn = jax.jit(partial(model.apply, variables))
        return fn, ENCODER_NORM[name]

    if name == "conch_v1":
        # CLIP ViT-B/16 visual tower, pooled pre-projection feature
        # (reference builder.py:91-97)
        if not ckpt_path:
            raise NotImplementedError(
                "encoder 'conch_v1' needs its downloaded checkpoint: set "
                "CONCH_CKPT_PATH or pass ckpt_path (reference builder.py:30-72 "
                "asserts the same)."
            )
        import torch

        sd = torch.load(ckpt_path, map_location="cpu", weights_only=False)
        sd = sd.get("state_dict", sd) if isinstance(sd, dict) else sd
        if any(k.startswith(("visual.trunk.", "trunk.")) for k in sd):
            # CoCa-style CONCH: timm ViT trunk — reuse the golden ViT importer
            sd = {
                k.split("trunk.", 1)[1]: v for k, v in sd.items() if "trunk." in k
            }
            dim = int(sd["pos_embed"].shape[-1])
            depth = sum(1 for k in sd if k.endswith(".norm1.weight"))
            patch = int(sd["patch_embed.proj.weight"].shape[-1])
            has_ls = any(k.endswith("ls1.gamma") for k in sd)
            model = ViTEncoder(
                embed_dim=dim, depth=depth, heads=max(dim // 64, 1),
                patch=patch, layer_scale=has_ls,
            )
            variables = jax.tree.map(jnp.asarray, import_vit(sd))
        else:
            if any(k.startswith("visual.") for k in sd):
                # A full classic-CLIP checkpoint carries its text tower at the
                # TOP level (transformer.resblocks.*, ln_final.*, the 77-token
                # positional_embedding, text_projection); after
                # import_clip_visual strips the ``visual.`` prefix those keys
                # would collide with — and overwrite — the visual ones. Keep
                # strictly the visual tower.
                sd = {k: v for k, v in sd.items() if k.startswith("visual.")}
            else:
                sd = {k: v for k, v in sd.items() if not any(
                    k.startswith(p) for p in ("text.", "logit_scale", "token_emb")
                )}
            dim = int(_t(sd.get("visual.class_embedding",
                                sd.get("class_embedding"))).reshape(-1).shape[0])
            probe = {k.split("visual.", 1)[-1]: v for k, v in sd.items()}
            depth = sum(
                1 for k in probe if k.endswith(".ln_1.weight")
            )
            patch = int(_t(probe["conv1.weight"]).shape[-1])
            model = CLIPVisualTower(
                embed_dim=dim, depth=depth, heads=max(dim // 64, 1), patch=patch
            )
            variables = jax.tree.map(jnp.asarray, import_clip_visual(sd))
        fn = jax.jit(partial(model.apply, variables))
        return fn, ENCODER_NORM[name]

    if name == "sd_vae":
        # SD VAE latents (reference vae_warpper.py wraps AutoencoderKL)
        if not ckpt_path:
            raise NotImplementedError(
                "encoder 'sd_vae' needs the AutoencoderKL checkpoint: set "
                "SD_VAE_CKPT_PATH or pass ckpt_path (a diffusers state_dict "
                ".pt; the reference pulls stabilityai/sd-vae-ft-ema)."
            )
        import torch

        sd = torch.load(ckpt_path, map_location="cpu", weights_only=False)
        sd = sd.get("state_dict", sd) if isinstance(sd, dict) else sd
        i = 0
        chans = []
        while f"encoder.down_blocks.{i}.resnets.0.conv1.weight" in sd:
            chans.append(int(_t(sd[f"encoder.down_blocks.{i}.resnets.0.conv1.weight"]).shape[0]))
            i += 1
        layers = sum(
            1 for k in sd if k.startswith("encoder.down_blocks.0.resnets.")
            and k.endswith(".conv1.weight")
        )
        latent = int(_t(sd["quant_conv.weight"]).shape[0]) // 2
        model = SDVAEEncoder(
            block_out_channels=tuple(chans), layers_per_block=layers,
            latent_channels=latent,
        )
        variables = jax.tree.map(jnp.asarray, import_sd_vae(sd))
        fn = jax.jit(partial(model.apply, variables))
        return fn, ENCODER_NORM[name]
    raise NotImplementedError(f"model {name} not implemented")
