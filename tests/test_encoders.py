"""Golden parity for the patch encoders (reference CLAM/models/builder.py:75-133).

The reference's ``resnet50_trunc`` is a torchvision-weights ResNet-50 cut
after layer3 + global average pool (timm_wrapper.py:4-23). timm/torchvision
aren't installed here, so the test executes the SAME standard architecture in
plain PyTorch (bottleneck v1.5, eval-mode BN), exports a torchvision-named
state_dict, imports it through ``import_resnet_trunc`` and demands feature
parity ≤1e-4 — validating the flax architecture, the padding semantics and
the weight-import path in one shot.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from mhim_mil_tpu.preprocess.encoders import (  # noqa: E402
    ResNetTrunc,
    get_encoder,
    import_resnet_trunc,
)


class _TorchBottleneck(tnn.Module):
    expansion = 4

    def __init__(self, in_ch, planes, stride=1):
        super().__init__()
        out_ch = planes * self.expansion
        self.conv1 = tnn.Conv2d(in_ch, planes, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(planes)
        self.conv2 = tnn.Conv2d(planes, planes, 3, stride, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(planes)
        self.conv3 = tnn.Conv2d(planes, out_ch, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(out_ch)
        self.relu = tnn.ReLU(inplace=True)
        self.downsample = None
        if stride != 1 or in_ch != out_ch:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(in_ch, out_ch, 1, stride, bias=False),
                tnn.BatchNorm2d(out_ch),
            )

    def forward(self, x):
        idn = x if self.downsample is None else self.downsample(x)
        y = self.relu(self.bn1(self.conv1(x)))
        y = self.relu(self.bn2(self.conv2(y)))
        y = self.bn3(self.conv3(y))
        return self.relu(y + idn)


class _TorchBasic(tnn.Module):
    expansion = 1

    def __init__(self, in_ch, planes, stride=1):
        super().__init__()
        self.conv1 = tnn.Conv2d(in_ch, planes, 3, stride, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(planes)
        self.conv2 = tnn.Conv2d(planes, planes, 3, 1, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(planes)
        self.relu = tnn.ReLU(inplace=True)
        self.downsample = None
        if stride != 1 or in_ch != planes:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(in_ch, planes, 1, stride, bias=False),
                tnn.BatchNorm2d(planes),
            )

    def forward(self, x):
        idn = x if self.downsample is None else self.downsample(x)
        y = self.relu(self.bn1(self.conv1(x)))
        y = self.bn2(self.conv2(y))
        return self.relu(y + idn)


class _TorchResNetTrunc(tnn.Module):
    """conv1..layer3 + adaptive avg pool, torchvision layout/names."""

    def __init__(self, depths=(3, 4, 6), block=_TorchBottleneck):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        self.relu = tnn.ReLU(inplace=True)
        self.maxpool = tnn.MaxPool2d(3, 2, 1)
        in_ch = 64
        for li, (depth, planes) in enumerate(zip(depths, (64, 128, 256))):
            blocks = []
            for bi in range(depth):
                stride = 2 if (bi == 0 and li > 0) else 1
                blocks.append(block(in_ch, planes, stride))
                in_ch = planes * block.expansion
            setattr(self, f"layer{li + 1}", tnn.Sequential(*blocks))
        self.depths = depths

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        for li in range(len(self.depths)):
            x = getattr(self, f"layer{li + 1}")(x)
        return x.mean(dim=(2, 3))


def _randomize_bn_stats(model, seed):
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for m in model.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean.copy_(torch.randn(m.num_features, generator=g) * 0.3)
                m.running_var.copy_(torch.rand(m.num_features, generator=g) + 0.5)
                m.weight.copy_(torch.rand(m.num_features, generator=g) + 0.5)
                m.bias.copy_(torch.randn(m.num_features, generator=g) * 0.1)


@pytest.mark.parametrize(
    "depths,tblock,fblock",
    [((3, 4, 6), _TorchBottleneck, "bottleneck"), ((2, 2, 2), _TorchBasic, "basic")],
)
def test_resnet_trunc_golden(depths, tblock, fblock):
    torch.manual_seed(0)
    tmodel = _TorchResNetTrunc(depths, tblock).eval()
    _randomize_bn_stats(tmodel, 1)

    x = torch.randn(2, 3, 96, 96)  # small spatial keeps the test fast
    with torch.no_grad():
        ref = tmodel(x).numpy()

    variables = import_resnet_trunc(tmodel.state_dict(), depths, fblock)
    variables = {k: v for k, v in variables.items()}
    fmodel = ResNetTrunc(depths=depths, block=fblock)
    out = fmodel.apply(
        {k: jnp.asarray(vv) if not isinstance(vv, dict) else vv for k, vv in variables.items()},
        jnp.asarray(x.numpy().transpose(0, 2, 3, 1)),
    )
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-4, rtol=1e-4)


def test_encoder_registry_ckpt_roundtrip(tmp_path):
    """get_encoder loads a torch .pt state_dict (incl. the reference's
    ``model.``-prefixed TimmCNNEncoder form) and sweeps patches e2e."""
    torch.manual_seed(0)
    tmodel = _TorchResNetTrunc((3, 4, 6), _TorchBottleneck).eval()
    _randomize_bn_stats(tmodel, 2)
    sd = {f"model.{k}": v for k, v in tmodel.state_dict().items()}
    p = tmp_path / "resnet50_trunc.pt"
    torch.save(sd, p)

    fn, norm = get_encoder("resnet50_trunc", ckpt_path=str(p))
    assert norm == "imagenet"
    x = torch.randn(3, 3, 64, 64)
    with torch.no_grad():
        ref = tmodel(x).numpy()
    out = np.asarray(fn(jnp.asarray(x.numpy().transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(out, ref, atol=1e-4, rtol=1e-4)

    from mhim_mil_tpu.preprocess.extract import extract_features

    img = (np.random.default_rng(0).random((128, 128, 3)) * 255).astype(np.uint8)
    coords = np.array([[0, 0], [64, 0], [0, 64], [64, 64]])
    feats = extract_features(fn, img, coords, patch_size=64, batch_size=4, norm=norm)
    assert feats.shape == (4, 1024)
    assert np.isfinite(feats).all()


def test_missing_foundation_encoders_raise():
    with pytest.raises(NotImplementedError, match="UNI_CKPT_PATH"):
        get_encoder("uni_v1")
    with pytest.raises(NotImplementedError, match="not implemented"):
        get_encoder("nope")


class _TorchViTBlock(tnn.Module):
    def __init__(self, d, heads, ls=True):
        super().__init__()
        self.norm1 = tnn.LayerNorm(d, eps=1e-6)
        self.attn = tnn.Module()
        self.attn.qkv = tnn.Linear(d, 3 * d)
        self.attn.proj = tnn.Linear(d, d)
        self.norm2 = tnn.LayerNorm(d, eps=1e-6)
        self.mlp = tnn.Module()
        self.mlp.fc1 = tnn.Linear(d, 4 * d)
        self.mlp.fc2 = tnn.Linear(4 * d, d)
        if ls:
            self.ls1 = tnn.Module()
            self.ls1.gamma = tnn.Parameter(torch.full((d,), 1e-5))
            self.ls2 = tnn.Module()
            self.ls2.gamma = tnn.Parameter(torch.full((d,), 1e-5))
        self.heads = heads
        self.ls = ls

    def forward(self, x):
        B, N, d = x.shape
        h = self.heads
        y = self.norm1(x)
        qkv = self.attn.qkv(y).reshape(B, N, 3, h, d // h).permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        a = torch.softmax(q @ k.transpose(-1, -2) * (d // h) ** -0.5, dim=-1)
        y = (a @ v).transpose(1, 2).reshape(B, N, d)
        y = self.attn.proj(y)
        if self.ls:
            y = y * self.ls1.gamma
        x = x + y
        y = self.mlp.fc2(torch.nn.functional.gelu(self.mlp.fc1(self.norm2(x))))
        if self.ls:
            y = y * self.ls2.gamma
        return x + y


class _TorchViT(tnn.Module):
    """Minimal timm-named ViT (patch embed + cls/pos + blocks + norm)."""

    def __init__(self, d=64, depth=2, heads=4, patch=16, grid=14, ls=True):
        super().__init__()
        self.patch_embed = tnn.Module()
        self.patch_embed.proj = tnn.Conv2d(3, d, patch, patch)
        self.cls_token = tnn.Parameter(torch.randn(1, 1, d) * 0.02)
        self.pos_embed = tnn.Parameter(torch.randn(1, 1 + grid * grid, d) * 0.02)
        self.blocks = tnn.ModuleList(
            [_TorchViTBlock(d, heads, ls) for _ in range(depth)]
        )
        self.norm = tnn.LayerNorm(d, eps=1e-6)
        self.patch, self.grid = patch, grid

    def forward(self, x):
        B = x.shape[0]
        x = self.patch_embed.proj(x).flatten(2).transpose(1, 2)  # [B,N,d]
        x = x + self.pos_embed[:, 1:]
        cls = self.cls_token + self.pos_embed[:, :1]
        x = torch.cat([cls.expand(B, -1, -1), x], dim=1)
        for b in self.blocks:
            x = b(x)
        return self.norm(x)[:, 0]


@pytest.mark.parametrize("ls", [True, False])
def test_vit_encoder_golden(ls):
    """uni_v1-style ViT: timm-named torch execution == flax import
    (patch embed, cls/pos, pre-norm blocks, LayerScale, final LN)."""
    from mhim_mil_tpu.preprocess.encoders import ViTEncoder, import_vit

    torch.manual_seed(0)
    tmodel = _TorchViT(d=64, depth=2, heads=4, ls=ls).eval()
    x = torch.randn(2, 3, 224, 224)
    with torch.no_grad():
        ref = tmodel(x).numpy()

    fmodel = ViTEncoder(embed_dim=64, depth=2, heads=4, layer_scale=ls)
    variables = {
        k: jax.tree.map(jnp.asarray, v)
        for k, v in import_vit(tmodel.state_dict()).items()
    }
    out = fmodel.apply(variables, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    # fp32 op-order drift across 196-token attention + patch conv; the
    # architectures are identical (exact at fp64)
    np.testing.assert_allclose(np.asarray(out), ref, atol=8e-4, rtol=1e-3)


def test_uni_v1_registry(tmp_path):
    torch.manual_seed(1)
    # heads=1 so the registry's head_dim=64 inference matches (d=64)
    tmodel = _TorchViT(d=64, depth=2, heads=1, ls=True).eval()
    p = tmp_path / "uni.pt"
    torch.save(tmodel.state_dict(), p)
    fn, norm = get_encoder("uni_v1", ckpt_path=str(p))
    assert norm == "imagenet"
    x = torch.randn(2, 3, 224, 224)
    with torch.no_grad():
        ref = tmodel(x).numpy()
    out = np.asarray(fn(jnp.asarray(x.numpy().transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(out, ref, atol=8e-4, rtol=1e-3)
