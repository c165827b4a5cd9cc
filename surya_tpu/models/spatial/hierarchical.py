"""3-level hierarchical quadtree models.

``HierarchicalQuadtreeCNN`` — parity with ``Quadtree_from scratch/
models.py:105-210``: trunk stops at layer2 (28×28×128 @224); a global
branch runs layer3+layer4+GAP → 512; level-1 splits the map into 4
quadrants (14×14) through a shared Conv(128→128)+GAP → 4×128; level-2
splits into 16 sub-quadrants (7×7) through a shared Conv(128→64)+GAP →
16×64; image dim 512+512+1024=2048, numeric branch Linear(47→128)+ReLU+
Dropout (single layer, ``models.py:151-155``), classifier
2176→1024→classes.

NOTE: the reference has a latent zero-width-slice bug — its Q4/sub-Q4
slices use ``[..., w:]``/``[..., qw:]`` instead of ``mid_w:``
(``models.py:182,196``), making the 4th quadrant empty. Our
reshape-based ``quadrant_split`` is bug-free by construction; this is a
deliberate fix, documented per SURVEY.md §2.2.

``AttentionHierarchicalCNN`` — parity with ``models.py:6-101``: same
splits, but the 16 level-2 vectors (B,16,64) pass an attention gate
Linear(64→32)→ReLU→Linear(32→1), softmax over the 16 sub-quadrants, and
are reduced to a single weighted 64-d vector (``models.py:82-90``); image
dim 512+4·128+64=1088, +128 numeric → classifier 1216→1024→classes.

TPU formulation: both split levels fold into the batch axis so each level
is ONE conv at 4×/16× batch; GAPs are fused reductions; everything NHWC
bf16.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from surya_tpu.models.backbones.resnet import make_resnet
from surya_tpu.models.common import (
    FusionClassifier,
    SingleLayerNumericalMLP,
    check_mode,
    fuse_by_mode,
)
from surya_tpu.ops.quadtree import quadrant_split


def _shared_conv_gap(x, channels, dtype, name_prefix):
    """Shared 3×3 conv + ReLU + global-average-pool over folded quadrants.

    Called from within a compact method, so the Conv binds to the caller's
    module scope under ``{name_prefix}_conv``.
    """
    y = nn.Conv(channels, (3, 3), padding=((1, 1), (1, 1)), dtype=dtype,
                param_dtype=jnp.float32,
                name=f"{name_prefix}_conv")(x)
    y = nn.relu(y)
    return jnp.mean(y, axis=(1, 2), dtype=dtype)  # (B*k, channels)


class _HierarchicalBase(nn.Module):
    """Shared trunk/split logic for both hierarchical variants."""

    num_classes: int = 8
    mode: str = "fusion"
    backbone: str = "resnet18"
    dtype: Any = jnp.bfloat16
    stem_s2d: bool = False

    def hierarchy_features(self, images, train):
        """Returns (global 512, level1 (B,4,128), level2 (B,16,64))."""
        b = images.shape[0]
        trunk = make_resnet(self.backbone, dtype=self.dtype,
                            name="trunk", stem_s2d=self.stem_s2d)
        outs = trunk(images, train=train, upto="layer4",
                     capture=("layer2",))
        base = outs["layer2"]              # (B, 28, 28, 128)
        global_feat = jnp.mean(outs["out"], axis=(1, 2), dtype=self.dtype)

        l1 = quadrant_split(base)                       # (4B, 14, 14, 128)
        l1_feat = _shared_conv_gap(l1, 128, self.dtype, "level1")
        l1_feat = l1_feat.reshape(b, 4, 128)

        l2 = quadrant_split(l1)                         # (16B, 7, 7, 128)
        l2_feat = _shared_conv_gap(l2, 64, self.dtype, "level2")
        # quadrant_split composed twice yields q-major then sub-q raster
        # order; the reference iterates quadrants then sub-quadrants the
        # same way (models.py:185-198).
        l2_feat = l2_feat.reshape(b, 16, 64)
        return global_feat, l1_feat, l2_feat


class HierarchicalQuadtreeCNN(_HierarchicalBase):
    """Concatenate all three hierarchy levels (2048-d image embedding)."""

    @nn.compact
    def __call__(self, images, numerical, train: bool = False):
        check_mode(self.mode)
        img_feat = None
        num_feat = None
        if self.mode != "numerical_only":
            g, l1, l2 = self.hierarchy_features(images, train)
            b = g.shape[0]
            img_feat = jnp.concatenate(
                [g, l1.reshape(b, -1), l2.reshape(b, -1)], axis=-1)  # 2048
        if self.mode != "image_only":
            # single Linear(47→128)+ReLU+Dropout (models.py:151-155)
            num_feat = SingleLayerNumericalMLP(
                out_dim=128, dropout=0.5, dtype=self.dtype,
                name="numerical_mlp")(numerical, train=train)
        fused = fuse_by_mode(self.mode, img_feat, num_feat)
        return FusionClassifier(num_classes=self.num_classes,
                                hidden_dim=1024, dropout=0.5,
                                dtype=self.dtype,
                                name="classifier")(fused, train=train)


class AttentionHierarchicalCNN(_HierarchicalBase):
    """Attention-gated level-2: softmax over 16 sub-quadrants → one 64-d."""

    @nn.compact
    def __call__(self, images, numerical, train: bool = False):
        check_mode(self.mode)
        img_feat = None
        num_feat = None
        if self.mode != "numerical_only":
            g, l1, l2 = self.hierarchy_features(images, train)
            b = g.shape[0]
            # Attention gate over the 16 sub-quadrant vectors
            # (models.py:34-38,86-90).
            scores = nn.Dense(32, dtype=self.dtype,
                              param_dtype=jnp.float32,
                              name="attn_fc1")(l2)
            scores = nn.relu(scores)
            scores = nn.Dense(1, dtype=jnp.float32,
                              param_dtype=jnp.float32,
                              name="attn_fc2")(scores)     # (B, 16, 1)
            weights = jax.nn.softmax(scores, axis=1)
            attended = jnp.sum(weights.astype(self.dtype) * l2, axis=1)
            img_feat = jnp.concatenate(
                [g, l1.reshape(b, -1), attended], axis=-1)  # 1088
        if self.mode != "image_only":
            # single Linear(47→128)+ReLU+Dropout (models.py:44-47)
            num_feat = SingleLayerNumericalMLP(
                out_dim=128, dropout=0.5, dtype=self.dtype,
                name="numerical_mlp")(numerical, train=train)
        fused = fuse_by_mode(self.mode, img_feat, num_feat)
        return FusionClassifier(num_classes=self.num_classes,
                                hidden_dim=1024, dropout=0.5,
                                dtype=self.dtype,
                                name="classifier")(fused, train=train)
