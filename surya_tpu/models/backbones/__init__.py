"""Backbone registry: pooled-feature extractors for every reference backbone.

Mirrors the backbone selection in ``comparative analysis/model.py:13-39``
(resnet18/resnet50/vgg16/mobilenet_v2/densenet121 with classifier stripped)
as Flax NHWC modules returning a (B, dim) feature vector.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from surya_tpu.models.backbones.resnet import (  # noqa: F401
    ResNet,
    make_resnet,
    resnet18,
    resnet34,
    resnet50,
)


class _ResNetPooled(nn.Module):
    """ResNet trunk + GAP → (B, dim); torchvision fc=Identity equivalent."""

    arch: str = "resnet18"
    dtype: Any = jnp.bfloat16
    stem_s2d: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        outs = make_resnet(self.arch, dtype=self.dtype, name="resnet",
                           stem_s2d=self.stem_s2d)(x, train=train)
        return jnp.mean(outs["out"], axis=(1, 2), dtype=self.dtype)


BACKBONE_DIMS = {
    "resnet18": 512,
    "resnet34": 512,
    "resnet50": 2048,
    "vgg16": 25088,
    "mobilenet_v2": 1280,
    "densenet121": 1024,
}


def feature_extractor(arch: str, dtype=jnp.bfloat16, name=None,
                      stem_s2d: bool = False) -> nn.Module:
    """Build a pooled-feature backbone module by torchvision-style name."""
    if arch in ("resnet18", "resnet34", "resnet50"):
        return _ResNetPooled(arch=arch, dtype=dtype, name=name,
                             stem_s2d=stem_s2d)
    if arch == "vgg16":
        from surya_tpu.models.backbones.vgg import VGG16Features
        return VGG16Features(dtype=dtype, name=name)
    if arch == "mobilenet_v2":
        from surya_tpu.models.backbones.mobilenet import MobileNetV2Features
        return MobileNetV2Features(dtype=dtype, name=name)
    if arch == "densenet121":
        from surya_tpu.models.backbones.densenet import DenseNet121Features
        return DenseNet121Features(dtype=dtype, name=name)
    raise ValueError(f"unknown backbone {arch!r}; "
                     f"available: {sorted(BACKBONE_DIMS)}")
