"""Standard (non-quadtree) spatial baselines.

``StandardResNetCNN`` — parity with ``resnet/models.py:7-65``: ResNet-18
through layer4, GAP, head 512→256→classes; accepts-and-ignores the
numerical input so the training loop API is uniform (``:56``).

``StandardMultimodalCNN`` — parity with ``comparative analysis/
model.py:8-71``: a generic backbone selected by name (resnet18/resnet50/
vgg16/mobilenet_v2/densenet121, classifier head stripped), numeric MLP
47→94→256, classifier (dim+256)→512→classes — the 5-backbone comparative
sweep (``comparative analysis/train_cnn.py:15``).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from surya_tpu.models.backbones import feature_extractor
from surya_tpu.models.common import (
    FusionClassifier,
    NumericalMLP,
    check_mode,
    fuse_by_mode,
)


class StandardResNetCNN(nn.Module):
    """Plain ResNet-18 classifier (image-only baseline)."""

    num_classes: int = 8
    mode: str = "image_only"  # fixed: numerical input is ignored
    backbone: str = "resnet18"
    dtype: Any = jnp.bfloat16
    stem_s2d: bool = False

    @nn.compact
    def __call__(self, images, numerical=None, train: bool = False):
        del numerical  # accepted and ignored (resnet/models.py:56)
        feat = feature_extractor(self.backbone, self.dtype, name="trunk",
                                 stem_s2d=self.stem_s2d)(images,
                                                         train=train)
        return FusionClassifier(num_classes=self.num_classes,
                                hidden_dim=256, dropout=0.5,
                                dtype=self.dtype,
                                name="classifier")(feat, train=train)


class StandardMultimodalCNN(nn.Module):
    """Generic backbone + numeric MLP + fusion classifier."""

    num_classes: int = 8
    mode: str = "fusion"
    backbone: str = "resnet18"
    num_mlp_out: int = 256
    dtype: Any = jnp.bfloat16
    stem_s2d: bool = False

    @nn.compact
    def __call__(self, images, numerical, train: bool = False):
        check_mode(self.mode)
        img_feat = None
        num_feat = None
        if self.mode != "numerical_only":
            img_feat = feature_extractor(
                self.backbone, self.dtype, name="trunk",
                stem_s2d=self.stem_s2d)(images, train=train)
        if self.mode != "image_only":
            num_feat = NumericalMLP(out_dim=self.num_mlp_out, dropout=0.5,
                                    dtype=self.dtype,
                                    name="numerical_mlp")(numerical,
                                                          train=train)
        fused = fuse_by_mode(self.mode, img_feat, num_feat)
        return FusionClassifier(num_classes=self.num_classes,
                                hidden_dim=512, dropout=0.5,
                                dtype=self.dtype,
                                name="classifier")(fused, train=train)
