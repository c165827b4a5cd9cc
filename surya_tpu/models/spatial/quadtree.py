"""QuadtreeCNN — the flagship spatial model (97.07% top-1 in the reference).

Capability parity with ``Quadtree_from scratch/models.py:214-305`` (trainable
backbone) and ``experiment/models_cnn.py:6-116`` (frozen backbone + ablation
modes), redesigned for TPU:

Reference graph (224×224 input):
  resnet18 conv1..layer3 → (B,256,14,14); 4 sequential 7×7 quadrant slices
  each through a shared Conv2d(256→128,k3)+ReLU+MaxPool2 → 4×(B,1152);
  layer4+avgpool global branch → (B,512); numerical MLP 47→94→256;
  classifier 5376→2688→classes.

TPU formulation:
  - NHWC; one trunk call captures layer3 and computes layer4 (no re-slicing
    of nn.Sequential children, no forward hooks).
  - the 4 quadrants fold into the batch axis (``ops.quadtree.quadrant_split``)
    so the shared quadrant conv is ONE conv at 4× batch — keeps the MXU
    full instead of serializing four small convs.
  - optional Pallas fused quadrant kernel (split+conv+relu+pool in one
    VMEM-resident pass) behind ``use_pallas``; both paths share the same
    parameters so the flag is a pure runtime choice.
  - bf16 compute, fp32 params/logits.

Feature dims match the reference exactly: 512 + 4·(3·3·128)=5120 image dim
(the reference asserts 5120 at ``models.py:250-251``), +256 numeric → 5376.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from surya_tpu.models.backbones.resnet import make_resnet
from surya_tpu.models.common import (
    FusionClassifier,
    NumericalMLP,
    check_mode,
    fuse_by_mode,
)
from surya_tpu.ops.quadtree import quadrant_flatten, quadrant_split


class QuadtreeCNN(nn.Module):
    """2×2 quadtree over the layer3 map + global layer4 branch + fusion."""

    num_classes: int = 8
    mode: str = "fusion"
    backbone: str = "resnet18"
    quadrant_channels: int = 128
    num_mlp_out: int = 256
    dropout: float = 0.5
    dtype: Any = jnp.bfloat16
    use_pallas: bool = False
    stem_s2d: bool = False  # space-to-depth stem (resnet.py docstring)

    @nn.compact
    def __call__(self, images, numerical, train: bool = False):
        check_mode(self.mode)
        img_feat = None
        num_feat = None

        if self.mode != "numerical_only":
            b = images.shape[0]
            trunk = make_resnet(self.backbone, dtype=self.dtype,
                                name="trunk", stem_s2d=self.stem_s2d)
            outs = trunk(images, train=train, upto="layer4",
                         capture=("layer3",))
            fmap = outs["layer3"]        # (B, 14, 14, 256) @ 224 input
            global_map = outs["out"]     # (B, 7, 7, 512)

            # Global branch: GAP over layer4 → (B, 512).
            global_feat = jnp.mean(global_map, axis=(1, 2),
                                   dtype=self.dtype)

            # Shared quadrant-conv parameters (used by both compute paths).
            cin = fmap.shape[-1]
            kernel = self.param(
                "quadrant_conv_kernel",
                nn.initializers.lecun_normal(),
                (3, 3, cin, self.quadrant_channels), jnp.float32)
            bias = self.param("quadrant_conv_bias", nn.initializers.zeros,
                              (self.quadrant_channels,), jnp.float32)

            if self.use_pallas:
                from surya_tpu.ops.pallas.quadrant import quadrant_process
                quad_flat = quadrant_process(fmap, kernel, bias)
            else:
                quads = quadrant_split(fmap)             # (4B, 7, 7, cin)
                q = jax.lax.conv_general_dilated(
                    quads.astype(self.dtype), kernel.astype(self.dtype),
                    window_strides=(1, 1), padding=((1, 1), (1, 1)),
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))
                q = nn.relu(q + bias.astype(self.dtype))
                q = nn.max_pool(q, (2, 2), strides=(2, 2))  # (4B,3,3,128)
                quad_flat = quadrant_flatten(q, b)          # (B, 4608)

            img_feat = jnp.concatenate(
                [global_feat, quad_flat.astype(self.dtype)], axis=-1)

        if self.mode != "image_only":
            # same dropout_rate as the classifier (models.py:255-260)
            num_feat = NumericalMLP(out_dim=self.num_mlp_out,
                                    dropout=self.dropout, dtype=self.dtype,
                                    name="numerical_mlp")(numerical,
                                                          train=train)

        fused = fuse_by_mode(self.mode, img_feat, num_feat)
        return FusionClassifier(num_classes=self.num_classes,
                                dropout=self.dropout, dtype=self.dtype,
                                use_pallas=self.use_pallas,
                                name="classifier")(fused, train=train)
