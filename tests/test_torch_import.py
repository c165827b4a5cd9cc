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
