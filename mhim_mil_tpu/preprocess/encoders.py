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

    if name in ("uni_v1", "conch_v1", "chief", "gigap", "sd_vae"):
        env = ENCODER_CKPT_ENV.get(name, "HF_TOKEN")
        raise NotImplementedError(
            f"encoder '{name}' needs an externally downloaded checkpoint "
            f"({env}) and its flax port is not bundled; use 'resnet50_trunc' "
            "or consume the published CPathPatchFeature stores "
            "(reference README:61-64)."
        )
    raise NotImplementedError(f"model {name} not implemented")
