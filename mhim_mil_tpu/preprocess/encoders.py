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
        y = nn.gelu(y)
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

    if name in ("conch_v1", "chief", "sd_vae"):
        env = ENCODER_CKPT_ENV.get(name, "HF_TOKEN")
        raise NotImplementedError(
            f"encoder '{name}' needs an externally downloaded checkpoint "
            f"({env}) and its flax port is not bundled; use 'resnet50_trunc' "
            "/ 'uni_v1' or consume the published CPathPatchFeature stores "
            "(reference README:61-64)."
        )
    raise NotImplementedError(f"model {name} not implemented")
