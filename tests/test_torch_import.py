"""Weight-import numeric equivalence: torch forward == flax forward.

Builds a torch ResNet-18 with EXACT torchvision module naming (the real
torchvision isn't in this image), loads random weights, converts them
with torch_import, and requires logit agreement.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from surya_tpu.models.backbones.resnet import resnet18  # noqa: E402
from surya_tpu.models.backbones.torch_import import (  # noqa: E402
    import_resnet18,
    linear_kernel,
)


class _TorchBasic(nn.Module):
    def __init__(self, cin, cout, stride=1):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, cout, 3, stride, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(cout)
        self.conv2 = nn.Conv2d(cout, cout, 3, 1, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(cout)
        self.relu = nn.ReLU()
        self.downsample = None
        if stride != 1 or cin != cout:
            self.downsample = nn.Sequential(
                nn.Conv2d(cin, cout, 1, stride, bias=False),
                nn.BatchNorm2d(cout))

    def forward(self, x):
        idt = x if self.downsample is None else self.downsample(x)
        y = self.relu(self.bn1(self.conv1(x)))
        y = self.bn2(self.conv2(y))
        return self.relu(y + idt)


class _TorchResNet18(nn.Module):
    """torchvision-named resnet18 trunk (no fc)."""

    def __init__(self):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.relu = nn.ReLU()
        self.maxpool = nn.MaxPool2d(3, 2, 1)
        self.layer1 = nn.Sequential(_TorchBasic(64, 64),
                                    _TorchBasic(64, 64))
        self.layer2 = nn.Sequential(_TorchBasic(64, 128, 2),
                                    _TorchBasic(128, 128))
        self.layer3 = nn.Sequential(_TorchBasic(128, 256, 2),
                                    _TorchBasic(256, 256))
        self.layer4 = nn.Sequential(_TorchBasic(256, 512, 2),
                                    _TorchBasic(512, 512))

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        for layer in (self.layer1, self.layer2, self.layer3,
                      self.layer4):
            x = layer(x)
        return x


def test_resnet18_import_matches_torch_forward():
    torch.manual_seed(0)
    tmodel = _TorchResNet18().eval()
    # randomize BN stats so eval mode is non-trivial
    with torch.no_grad():
        for m in tmodel.modules():
            if isinstance(m, nn.BatchNorm2d):
                m.running_mean.uniform_(-0.5, 0.5)
                m.running_var.uniform_(0.5, 1.5)

    params, stats = import_resnet18(tmodel.state_dict())

    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        want = tmodel(torch.from_numpy(
            x.transpose(0, 3, 1, 2))).numpy().transpose(0, 2, 3, 1)

    model = resnet18(dtype=jnp.float32)
    out = model.apply({"params": params, "batch_stats": stats},
                      jnp.asarray(x), train=False)["out"]
    np.testing.assert_allclose(np.asarray(out), want, rtol=2e-4,
                               atol=2e-4)


def test_linear_kernel_transpose():
    w = torch.randn(5, 3)
    lk = linear_kernel(w)
    assert lk.shape == (3, 5)
    x = torch.randn(2, 3)
    want = (x @ w.t()).numpy()
    np.testing.assert_allclose(x.numpy() @ lk, want, rtol=1e-5,
                               atol=1e-6)


class _TorchBasic3D(nn.Module):
    """torchvision video-resnet BasicBlock naming: conv1 = Sequential(
    Conv3d, BN, ReLU); conv2 = Sequential(Conv3d, BN)."""

    def __init__(self, cin, cout, stride=1):
        super().__init__()
        s = (stride,) * 3
        self.conv1 = nn.Sequential(
            nn.Conv3d(cin, cout, 3, s, 1, bias=False),
            nn.BatchNorm3d(cout), nn.ReLU())
        self.conv2 = nn.Sequential(
            nn.Conv3d(cout, cout, 3, 1, 1, bias=False),
            nn.BatchNorm3d(cout))
        self.relu = nn.ReLU()
        self.downsample = None
        if stride != 1 or cin != cout:
            self.downsample = nn.Sequential(
                nn.Conv3d(cin, cout, 1, s, bias=False),
                nn.BatchNorm3d(cout))

    def forward(self, x):
        idt = x if self.downsample is None else self.downsample(x)
        y = self.conv2(self.conv1(x))
        return self.relu(y + idt)


class _TorchR3D18(nn.Module):
    def __init__(self):
        super().__init__()
        self.stem = nn.Sequential(
            nn.Conv3d(3, 64, (3, 7, 7), (1, 2, 2), (1, 3, 3),
                      bias=False),
            nn.BatchNorm3d(64), nn.ReLU())
        self.layer1 = nn.Sequential(_TorchBasic3D(64, 64),
                                    _TorchBasic3D(64, 64))
        self.layer2 = nn.Sequential(_TorchBasic3D(64, 128, 2),
                                    _TorchBasic3D(128, 128))
        self.layer3 = nn.Sequential(_TorchBasic3D(128, 256, 2),
                                    _TorchBasic3D(256, 256))
        self.layer4 = nn.Sequential(_TorchBasic3D(256, 512, 2),
                                    _TorchBasic3D(512, 512))

    def forward(self, x):
        x = self.stem(x)
        for layer in (self.layer1, self.layer2, self.layer3,
                      self.layer4):
            x = layer(x)
        return x


def test_r3d18_import_matches_torch_forward():
    from surya_tpu.models.backbones.resnet3d import r3d_18
    from surya_tpu.models.backbones.torch_import import import_r3d18

    torch.manual_seed(1)
    tmodel = _TorchR3D18().eval()
    with torch.no_grad():
        for m in tmodel.modules():
            if isinstance(m, nn.BatchNorm3d):
                m.running_mean.uniform_(-0.5, 0.5)
                m.running_var.uniform_(0.5, 1.5)
    params, stats = import_r3d18(tmodel.state_dict())

    rng = np.random.default_rng(0)
    x = rng.normal(size=(1, 4, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        want = tmodel(torch.from_numpy(
            x.transpose(0, 4, 1, 2, 3))).numpy().transpose(0, 2, 3, 4, 1)

    model = r3d_18(dtype=jnp.float32)
    out = model.apply({"params": params, "batch_stats": stats},
                      jnp.asarray(x), train=False)["out"]
    np.testing.assert_allclose(np.asarray(out), want, rtol=3e-4,
                               atol=3e-4)


class _TimmBlock(nn.Module):
    """timm ViT block naming: norm1, attn.qkv, attn.proj, norm2,
    mlp.fc1, mlp.fc2 (pre-LN, GELU)."""

    def __init__(self, d, heads):
        super().__init__()
        self.d, self.heads = d, heads

        class Attn(nn.Module):
            def __init__(self):
                super().__init__()
                self.qkv = nn.Linear(d, 3 * d)
                self.proj = nn.Linear(d, d)

        class Mlp(nn.Module):
            def __init__(self):
                super().__init__()
                self.fc1 = nn.Linear(d, 4 * d)
                self.fc2 = nn.Linear(4 * d, d)

        self.norm1 = nn.LayerNorm(d)
        self.attn = Attn()
        self.norm2 = nn.LayerNorm(d)
        self.mlp = Mlp()

    def forward(self, x):
        b, n, d = x.shape
        h = self.heads
        y = self.norm1(x)
        qkv = self.attn.qkv(y).reshape(b, n, 3, h, d // h)
        q, k, v = qkv.unbind(2)                      # (B, N, H, hd)
        q = q.transpose(1, 2)
        k = k.transpose(1, 2)
        v = v.transpose(1, 2)                        # (B, H, N, hd)
        att = (q @ k.transpose(-2, -1)) / (d // h) ** 0.5
        att = att.softmax(dim=-1)
        y = (att @ v).transpose(1, 2).reshape(b, n, d)
        x = x + self.attn.proj(y)
        y = self.norm2(x)
        y = self.mlp.fc2(nn.functional.gelu(self.mlp.fc1(y)))
        return x + y


class _TimmViT(nn.Module):
    def __init__(self, d=96, heads=12, depth=2, patch=16, img=32):
        super().__init__()
        import torch as _t

        class PatchEmbed(nn.Module):
            def __init__(self):
                super().__init__()
                self.proj = nn.Conv2d(3, d, patch, patch)

        self.patch_embed = PatchEmbed()
        n = (img // patch) ** 2
        self.cls_token = nn.Parameter(_t.randn(1, 1, d))
        self.pos_embed = nn.Parameter(_t.randn(1, n + 1, d) * 0.02)
        self.blocks = nn.ModuleList(
            [_TimmBlock(d, heads) for _ in range(depth)])
        self.norm = nn.LayerNorm(d)

    def forward(self, x):
        b = x.shape[0]
        x = self.patch_embed.proj(x).flatten(2).transpose(1, 2)
        cls = self.cls_token.expand(b, -1, -1)
        x = torch.cat([cls, x], dim=1) + self.pos_embed
        for blk in self.blocks:
            x = blk(x)
        return self.norm(x)[:, 0]


def test_vit_import_matches_torch_forward():
    from surya_tpu.models.backbones.torch_import import import_vit_base
    from surya_tpu.models.backbones.vit import ViT

    torch.manual_seed(2)
    d, heads, depth = 96, 12, 2
    tmodel = _TimmViT(d=d, heads=heads, depth=depth).eval()
    # flatten ModuleList names to timm style "blocks.N...."
    sd = tmodel.state_dict()
    params = import_vit_base(sd)

    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        want = tmodel(torch.from_numpy(
            x.transpose(0, 3, 1, 2))).numpy()

    model = ViT(patch=16, embed_dim=d, depth=depth, num_heads=heads,
                mlp_dim=4 * d, dtype=jnp.float32)
    out = model.apply({"params": params}, jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(out), want, rtol=2e-4,
                               atol=2e-4)
