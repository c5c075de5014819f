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


# ---- chief (Swin-T + ConvStem) golden parity ---------------------------------


class _TorchConvStem(tnn.Module):
    """reference CLAM/models/chief.py:5-43 (timm-named ``patch_embed``)."""

    def __init__(self, embed_dim=96):
        super().__init__()
        self.proj = tnn.Sequential(
            tnn.Conv2d(3, embed_dim // 8, 3, 2, 1, bias=False),
            tnn.BatchNorm2d(embed_dim // 8),
            tnn.ReLU(inplace=True),
            tnn.Conv2d(embed_dim // 8, embed_dim // 4, 3, 2, 1, bias=False),
            tnn.BatchNorm2d(embed_dim // 4),
            tnn.ReLU(inplace=True),
            tnn.Conv2d(embed_dim // 4, embed_dim, 1),
        )
        self.norm = tnn.LayerNorm(embed_dim, eps=1e-5)

    def forward(self, x):
        x = self.proj(x)
        x = x.flatten(2).transpose(1, 2)
        return self.norm(x)


class _TorchWindowAttn(tnn.Module):
    def __init__(self, dim, heads, window):
        super().__init__()
        self.qkv = tnn.Linear(dim, 3 * dim)
        self.proj = tnn.Linear(dim, dim)
        self.relative_position_bias_table = tnn.Parameter(
            torch.randn((2 * window - 1) ** 2, heads) * 0.02
        )
        self.dim, self.heads, self.window = dim, heads, window

    def forward(self, x, mask=None):
        from mhim_mil_tpu.preprocess.encoders import _rel_pos_index

        Bn, L, C = x.shape
        h = self.heads
        dh = C // h
        qkv = self.qkv(x).reshape(Bn, L, 3, h, dh).permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        sim = (q * dh ** -0.5) @ k.transpose(-1, -2)
        idx = torch.as_tensor(_rel_pos_index(self.window).reshape(-1))
        bias = self.relative_position_bias_table[idx].reshape(L, L, h)
        sim = sim + bias.permute(2, 0, 1)[None]
        if mask is not None:
            nW = mask.shape[0]
            sim = sim.view(-1, nW, h, L, L) + mask[None, :, None]
            sim = sim.view(-1, h, L, L)
        a = torch.softmax(sim, -1)
        return self.proj((a @ v).transpose(1, 2).reshape(Bn, L, C))


class _TorchSwinBlock(tnn.Module):
    def __init__(self, dim, heads, window, shift):
        super().__init__()
        self.norm1 = tnn.LayerNorm(dim, eps=1e-5)
        self.attn = _TorchWindowAttn(dim, heads, window)
        self.norm2 = tnn.LayerNorm(dim, eps=1e-5)
        self.mlp = tnn.Module()
        self.mlp.fc1 = tnn.Linear(dim, 4 * dim)
        self.mlp.fc2 = tnn.Linear(4 * dim, dim)
        self.window, self.shift = window, shift

    def forward(self, x, hw):
        H, W = hw
        B, L, C = x.shape
        w = self.window
        shortcut = x
        x = self.norm1(x).view(B, H, W, C)
        if self.shift:
            x = torch.roll(x, (-self.shift, -self.shift), (1, 2))
        x = x.view(B, H // w, w, W // w, w, C).permute(0, 1, 3, 2, 4, 5)
        x = x.reshape(-1, w * w, C)
        mask = None
        if self.shift:
            img = torch.zeros(H, W, dtype=torch.long)
            cnt = 0
            for hs in (slice(0, -w), slice(-w, -self.shift), slice(-self.shift, None)):
                for ws in (slice(0, -w), slice(-w, -self.shift), slice(-self.shift, None)):
                    img[hs, ws] = cnt
                    cnt += 1
            mw = img.view(H // w, w, W // w, w).permute(0, 2, 1, 3).reshape(-1, w * w)
            mask = torch.where(mw[:, :, None] != mw[:, None, :], -100.0, 0.0)
        x = self.attn(x, mask)
        x = x.view(B, H // w, W // w, w, w, C).permute(0, 1, 3, 2, 4, 5)
        x = x.reshape(B, H, W, C)
        if self.shift:
            x = torch.roll(x, (self.shift, self.shift), (1, 2))
        x = shortcut + x.view(B, L, C)
        return x + self.mlp.fc2(torch.nn.functional.gelu(self.mlp.fc1(self.norm2(x))))


class _TorchPatchMerge(tnn.Module):
    def __init__(self, dim):
        super().__init__()
        self.norm = tnn.LayerNorm(4 * dim, eps=1e-5)
        self.reduction = tnn.Linear(4 * dim, 2 * dim, bias=False)

    def forward(self, x, hw):
        H, W = hw
        B, L, C = x.shape
        x = x.view(B, H, W, C)
        x0 = x[:, 0::2, 0::2]
        x1 = x[:, 1::2, 0::2]
        x2 = x[:, 0::2, 1::2]
        x3 = x[:, 1::2, 1::2]
        x = torch.cat([x0, x1, x2, x3], -1).view(B, L // 4, 4 * C)
        return self.reduction(self.norm(x))


class _TorchSwinChief(tnn.Module):
    """timm-named Swin + ConvStem, old-timm layout (downsample at stage end)."""

    def __init__(self, embed=16, depths=(1, 1, 2, 1), heads=(1, 2, 4, 8), window=7):
        super().__init__()
        self.patch_embed = _TorchConvStem(embed)
        self.layers = tnn.ModuleList()
        dim = embed
        for si, (d, h) in enumerate(zip(depths, heads)):
            stage = tnn.Module()
            stage.blocks = tnn.ModuleList()
            res = 56 // (2 ** si)
            for bi in range(d):
                shift = 0 if (bi % 2 == 0 or res <= window) else window // 2
                stage.blocks.append(_TorchSwinBlock(dim, h, window, shift))
            if si < len(depths) - 1:
                stage.downsample = _TorchPatchMerge(dim)
            self.layers.append(stage)
            if si < len(depths) - 1:
                dim *= 2
        self.norm = tnn.LayerNorm(dim, eps=1e-5)
        self.depths, self.window = depths, window

    def forward(self, x):
        x = self.patch_embed(x)
        H = W = 56
        for si, stage in enumerate(self.layers):
            for blk in stage.blocks:
                x = blk(x, (H, W))
            if hasattr(stage, "downsample"):
                x = stage.downsample(x, (H, W))
                H, W = H // 2, W // 2
        return self.norm(x).mean(1)


def test_swin_chief_golden():
    """chief = Swin-T + ConvStem (reference builder.py:101-110, chief.py:5):
    timm-named torch execution == flax import (stem BN, window attention +
    relative bias, shifted windows, patch merging, final norm + avg pool)."""
    from mhim_mil_tpu.preprocess.encoders import SwinChief, import_swin_chief

    torch.manual_seed(0)
    tmodel = _TorchSwinChief().eval()
    _randomize_bn_stats(tmodel, 3)
    x = torch.randn(2, 3, 224, 224)
    with torch.no_grad():
        ref = tmodel(x).numpy()

    fmodel = SwinChief(embed_dim=16, depths=(1, 1, 2, 1), heads=(1, 2, 4, 8))
    variables = jax.tree.map(
        jnp.asarray, import_swin_chief(tmodel.state_dict())
    )
    out = fmodel.apply(variables, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-4, rtol=1e-3)


def test_chief_registry(tmp_path):
    """get_encoder('chief') loads the reference ``{'model': sd}`` checkpoint
    format and infers the geometry from the state dict."""
    from mhim_mil_tpu.preprocess.encoders import get_encoder

    torch.manual_seed(1)
    tmodel = _TorchSwinChief().eval()
    _randomize_bn_stats(tmodel, 4)
    p = tmp_path / "chief.pth"
    torch.save({"model": tmodel.state_dict()}, p)
    fn, norm = get_encoder("chief", str(p))
    assert norm == "imagenet"
    x = torch.randn(1, 3, 224, 224)
    with torch.no_grad():
        ref = tmodel(x).numpy()
    out = np.asarray(fn(jnp.asarray(x.numpy().transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(out, ref, atol=1e-4, rtol=1e-3)


# ---- conch_v1 (CLIP visual tower) golden parity ------------------------------


class _TorchCLIPBlock(tnn.Module):
    def __init__(self, d, heads):
        super().__init__()
        self.ln_1 = tnn.LayerNorm(d, eps=1e-5)
        self.attn = tnn.MultiheadAttention(d, heads, batch_first=True)
        self.ln_2 = tnn.LayerNorm(d, eps=1e-5)
        self.mlp = tnn.Module()
        self.mlp.c_fc = tnn.Linear(d, 4 * d)
        self.mlp.c_proj = tnn.Linear(4 * d, d)

    def forward(self, x):
        y = self.ln_1(x)
        y, _ = self.attn(y, y, y, need_weights=False)
        x = x + y
        y = self.mlp.c_proj(torch.nn.functional.gelu(self.mlp.c_fc(self.ln_2(x))))
        return x + y


class _TorchCLIPVisual(tnn.Module):
    """open_clip-named visual tower (``visual.*`` keys added by the test)."""

    def __init__(self, d=64, depth=2, heads=1, patch=16):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, d, patch, patch, bias=False)
        self.class_embedding = tnn.Parameter(torch.randn(d) * 0.02)
        self.positional_embedding = tnn.Parameter(torch.randn(197, d) * 0.02)
        self.ln_pre = tnn.LayerNorm(d, eps=1e-5)
        self.transformer = tnn.Module()
        self.transformer.resblocks = tnn.ModuleList(
            [_TorchCLIPBlock(d, heads) for _ in range(depth)]
        )
        self.ln_post = tnn.LayerNorm(d, eps=1e-5)

    def forward(self, x):
        B = x.shape[0]
        x = self.conv1(x).flatten(2).transpose(1, 2)
        cls = self.class_embedding[None, None].expand(B, 1, -1)
        x = torch.cat([cls, x], 1) + self.positional_embedding[None]
        x = self.ln_pre(x)
        for b in self.transformer.resblocks:
            x = b(x)
        return self.ln_post(x[:, 0])


def test_clip_visual_golden(tmp_path):
    """conch_v1 = CLIP ViT-B/16 visual tower without the contrastive
    projection (reference builder.py:91-97 encode_image(proj_contrast=False,
    normalize=False)): open_clip-named torch execution == flax import,
    including the torch-MultiheadAttention in_proj/out_proj mapping."""
    from mhim_mil_tpu.preprocess.encoders import get_encoder

    torch.manual_seed(2)
    tmodel = _TorchCLIPVisual().eval()
    x = torch.randn(2, 3, 224, 224)
    with torch.no_grad():
        ref = tmodel(x).numpy()
    sd = {f"visual.{k}": v for k, v in tmodel.state_dict().items()}
    p = tmp_path / "conch.pt"
    torch.save(sd, p)
    fn, norm = get_encoder("conch_v1", str(p))
    assert norm == "openai_clip"
    out = np.asarray(fn(jnp.asarray(x.numpy().transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(out, ref, atol=1e-4, rtol=1e-3)


def test_swin_chief_new_timm_layout():
    """New-timm checkpoints keep the patch merging at the START of the next
    stage (layers.{i+1}.downsample). Regression: probing both key families
    per-stage handed merge{i} the previous stage's reduction (layers.1 for
    both merge0 and merge1), which fails at apply time with a shape error."""
    from mhim_mil_tpu.preprocess.encoders import SwinChief, import_swin_chief

    torch.manual_seed(5)
    tmodel = _TorchSwinChief().eval()
    _randomize_bn_stats(tmodel, 6)
    x = torch.randn(1, 3, 224, 224)
    with torch.no_grad():
        ref = tmodel(x).numpy()
    # rewrite the state dict into the new layout: stage-end downsample ->
    # start of the following stage
    sd = {}
    for k, v in tmodel.state_dict().items():
        if ".downsample." in k:
            si = int(k.split(".")[1])
            k = k.replace(f"layers.{si}.downsample.", f"layers.{si + 1}.downsample.")
        sd[k] = v
    fmodel = SwinChief(embed_dim=16, depths=(1, 1, 2, 1), heads=(1, 2, 4, 8))
    variables = jax.tree.map(jnp.asarray, import_swin_chief(sd))
    out = fmodel.apply(variables, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-4, rtol=1e-3)


def test_conch_classic_full_checkpoint_ignores_text_tower(tmp_path):
    """A full classic-CLIP checkpoint carries the text tower at the TOP level
    (transformer.resblocks.*, ln_final.*, a 77-token positional_embedding,
    text_projection). Regression: those keys survived the filter and, after
    the ``visual.`` prefix strip, overwrote the visual resblocks."""
    from mhim_mil_tpu.preprocess.encoders import get_encoder

    torch.manual_seed(4)
    tmodel = _TorchCLIPVisual().eval()
    x = torch.randn(1, 3, 224, 224)
    with torch.no_grad():
        ref = tmodel(x).numpy()
    sd = {f"visual.{k}": v for k, v in tmodel.state_dict().items()}
    # text tower in OpenAI/open_clip top-level naming, with dims that differ
    # from the visual tower so any leakage breaks shapes or values
    d_txt = 32
    sd["positional_embedding"] = torch.randn(77, d_txt)
    sd["text_projection"] = torch.randn(d_txt, d_txt)
    sd["logit_scale"] = torch.tensor(2.6592)
    sd["token_embedding.weight"] = torch.randn(99, d_txt)
    sd["ln_final.weight"] = torch.randn(d_txt)
    sd["ln_final.bias"] = torch.randn(d_txt)
    for bi in range(2):
        for part, shapes in (
            ("attn.in_proj_weight", (3 * d_txt, d_txt)),
            ("attn.in_proj_bias", (3 * d_txt,)),
            ("attn.out_proj.weight", (d_txt, d_txt)),
            ("attn.out_proj.bias", (d_txt,)),
            ("ln_1.weight", (d_txt,)), ("ln_1.bias", (d_txt,)),
            ("ln_2.weight", (d_txt,)), ("ln_2.bias", (d_txt,)),
            ("mlp.c_fc.weight", (4 * d_txt, d_txt)),
            ("mlp.c_fc.bias", (4 * d_txt,)),
            ("mlp.c_proj.weight", (d_txt, 4 * d_txt)),
            ("mlp.c_proj.bias", (d_txt,)),
        ):
            sd[f"transformer.resblocks.{bi}.{part}"] = torch.randn(*shapes)
    p = tmp_path / "clip_full.pt"
    torch.save(sd, p)
    fn, _ = get_encoder("conch_v1", str(p))
    out = np.asarray(fn(jnp.asarray(x.numpy().transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(out, ref, atol=1e-4, rtol=1e-3)


def test_conch_trunk_naming_routes_to_vit(tmp_path):
    """CoCa-style CONCH checkpoints carry a timm trunk (visual.trunk.*):
    the registry must route them through the golden ViT importer."""
    from mhim_mil_tpu.preprocess.encoders import get_encoder

    torch.manual_seed(3)
    tmodel = _TorchViT(d=64, depth=2, heads=1, ls=False).eval()
    x = torch.randn(1, 3, 224, 224)
    with torch.no_grad():
        ref = tmodel(x).numpy()
    sd = {f"visual.trunk.{k}": v for k, v in tmodel.state_dict().items()}
    p = tmp_path / "conch_coca.pt"
    torch.save(sd, p)
    fn, _ = get_encoder("conch_v1", str(p))
    out = np.asarray(fn(jnp.asarray(x.numpy().transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(out, ref, atol=8e-4, rtol=1e-3)


# ---- sd_vae (AutoencoderKL encoder) golden parity ----------------------------


class _TorchVAEResnet(tnn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.norm1 = tnn.GroupNorm(32, cin, eps=1e-6)
        self.conv1 = tnn.Conv2d(cin, cout, 3, padding=1)
        self.norm2 = tnn.GroupNorm(32, cout, eps=1e-6)
        self.conv2 = tnn.Conv2d(cout, cout, 3, padding=1)
        self.conv_shortcut = tnn.Conv2d(cin, cout, 1) if cin != cout else None

    def forward(self, x):
        h = self.conv1(tnn.functional.silu(self.norm1(x)))
        h = self.conv2(tnn.functional.silu(self.norm2(h)))
        s = x if self.conv_shortcut is None else self.conv_shortcut(x)
        return s + h


class _TorchVAEAttn(tnn.Module):
    def __init__(self, c):
        super().__init__()
        self.group_norm = tnn.GroupNorm(32, c, eps=1e-6)
        self.to_q = tnn.Linear(c, c)
        self.to_k = tnn.Linear(c, c)
        self.to_v = tnn.Linear(c, c)
        self.to_out = tnn.ModuleList([tnn.Linear(c, c)])

    def forward(self, x):
        B, C, H, W = x.shape
        y = self.group_norm(x).reshape(B, C, H * W).transpose(1, 2)
        q, k, v = self.to_q(y), self.to_k(y), self.to_v(y)
        a = torch.softmax(q @ k.transpose(-1, -2) * C ** -0.5, -1)
        y = self.to_out[0](a @ v)
        return x + y.transpose(1, 2).reshape(B, C, H, W)


class _TorchSDVAE(tnn.Module):
    """diffusers-named AutoencoderKL encoder + quant_conv (tiny config)."""

    def __init__(self, chans=(32, 32, 64), layers=1, latent=4):
        super().__init__()
        enc = tnn.Module()
        enc.conv_in = tnn.Conv2d(3, chans[0], 3, padding=1)
        enc.down_blocks = tnn.ModuleList()
        cin = chans[0]
        for i, ch in enumerate(chans):
            blk = tnn.Module()
            blk.resnets = tnn.ModuleList()
            for _ in range(layers):
                blk.resnets.append(_TorchVAEResnet(cin, ch))
                cin = ch
            if i < len(chans) - 1:
                ds = tnn.Module()
                ds.conv = tnn.Conv2d(ch, ch, 3, stride=2, padding=0)
                blk.downsamplers = tnn.ModuleList([ds])
            enc.down_blocks.append(blk)
        enc.mid_block = tnn.Module()
        enc.mid_block.resnets = tnn.ModuleList(
            [_TorchVAEResnet(chans[-1], chans[-1]) for _ in range(2)]
        )
        enc.mid_block.attentions = tnn.ModuleList([_TorchVAEAttn(chans[-1])])
        enc.conv_norm_out = tnn.GroupNorm(32, chans[-1], eps=1e-6)
        enc.conv_out = tnn.Conv2d(chans[-1], 2 * latent, 3, padding=1)
        self.encoder = enc
        self.quant_conv = tnn.Conv2d(2 * latent, 2 * latent, 1)
        self.latent = latent

    def forward(self, x):
        e = self.encoder
        x = e.conv_in(x)
        for blk in e.down_blocks:
            for r in blk.resnets:
                x = r(x)
            if hasattr(blk, "downsamplers"):
                x = tnn.functional.pad(x, (0, 1, 0, 1))
                x = blk.downsamplers[0].conv(x)
        x = e.mid_block.resnets[0](x)
        x = e.mid_block.attentions[0](x)
        x = e.mid_block.resnets[1](x)
        x = e.conv_out(tnn.functional.silu(e.conv_norm_out(x)))
        moments = self.quant_conv(x)
        mean = moments[:, : self.latent]
        return (mean * 0.18215).reshape(x.shape[0], -1)


def test_sd_vae_golden(tmp_path):
    """sd_vae = AutoencoderKL encoder latents (reference vae_warpper.py:1-14;
    deterministic mean instead of a sample — documented divergence):
    diffusers-named torch execution == flax import, through the registry
    with geometry inferred from the state dict."""
    from mhim_mil_tpu.preprocess.encoders import get_encoder

    torch.manual_seed(5)
    tmodel = _TorchSDVAE().eval()
    x = torch.randn(2, 3, 32, 32)
    with torch.no_grad():
        ref = tmodel(x).numpy()
    p = tmp_path / "vae.pt"
    torch.save(tmodel.state_dict(), p)
    fn, norm = get_encoder("sd_vae", str(p))
    assert norm == "uniform"
    out = np.asarray(fn(jnp.asarray(x.numpy().transpose(0, 2, 3, 1))))
    assert out.shape == ref.shape  # [B, 4*(H/4)^2] for the tiny config
    np.testing.assert_allclose(out, ref, atol=2e-4, rtol=1e-3)
