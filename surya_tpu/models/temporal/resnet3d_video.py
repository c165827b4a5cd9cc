"""Pretrained-3D-ResNet video models: ResNet3DVideo and HybridQuadtree3DCNN.

``ResNet3DVideo`` — parity with ``3dcnn/models.py:220-259``: r3d_18 trunk
(frozen except layer4 at train time — an optax mask decision, see
train/loop), GAP → 512, head 512→256→ReLU→Dropout→classes. The numerical
input is accepted and ignored.

``HybridQuadtree3DCNN`` — parity with ``3dcnn/models.py:265-375``: same
r3d_18 trunk (layer4 fine-tuned), GAP → 512; numeric 2-layer LSTM hidden
188 (dropout 0.6) → projection 188→256+ReLU+Dropout; fusion (768) /
image_only (512) modes; classifier dim→dim/2→classes, dropout 0.6.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from surya_tpu.models.backbones.resnet3d import r3d_18
from surya_tpu.models.common import FusionClassifier
from surya_tpu.models.temporal.recurrent import StackedLSTM, last_step

HYBRID_MODES = ("fusion", "image_only")


class ResNet3DVideo(nn.Module):
    num_classes: int = 8
    dropout: float = 0.5
    dtype: Any = jnp.bfloat16
    freeze_backbone: bool = True  # layer4 stays trainable via optax mask

    @nn.compact
    def __call__(self, image_sequence, numerical_sequence=None,
                 train: bool = False):
        del numerical_sequence  # accepted and ignored (3dcnn/models.py:256)
        # freeze_backbone freezes all-but-layer4 (optax mask): layer4's
        # BN must keep tracking its trainable convs' statistics, while
        # frozen stages run inference-mode BN
        outs = r3d_18(dtype=self.dtype, name="trunk")(
            image_sequence, train=train,
            train_stages=({"layer4"} if self.freeze_backbone else None))
        feat = jnp.mean(outs["out"], axis=(1, 2, 3), dtype=self.dtype)
        return FusionClassifier(num_classes=self.num_classes,
                                hidden_dim=256, dropout=self.dropout,
                                dtype=self.dtype,
                                name="classifier")(feat, train=train)


class HybridQuadtree3DCNN(nn.Module):
    num_classes: int = 8
    mode: str = "fusion"
    num_features: int = 47
    dropout: float = 0.6
    dtype: Any = jnp.bfloat16
    freeze_backbone: bool = True  # all but layer4 (optax mask)

    @nn.compact
    def __call__(self, image_sequence, numerical_sequence,
                 train: bool = False):
        if self.mode not in HYBRID_MODES:
            raise ValueError(f"mode must be one of {HYBRID_MODES}")
        outs = r3d_18(dtype=self.dtype, name="trunk")(
            image_sequence, train=train,
            train_stages=({"layer4"} if self.freeze_backbone else None))
        img = jnp.mean(outs["out"], axis=(1, 2, 3), dtype=self.dtype)

        if self.mode == "fusion":
            lstm_out = StackedLSTM(hidden=self.num_features * 4,
                                   num_layers=2, dropout=self.dropout,
                                   dtype=self.dtype,
                                   name="numerical_lstm")(
                                       numerical_sequence, train=train)
            n = last_step(lstm_out)
            n = nn.Dense(256, dtype=self.dtype, param_dtype=jnp.float32,
                         name="numerical_projection")(n)
            n = nn.relu(n)
            n = nn.Dropout(self.dropout, deterministic=not train)(n)
            fused = jnp.concatenate([img, n], axis=-1)  # (B, 768)
        else:
            fused = img

        return FusionClassifier(num_classes=self.num_classes,
                                hidden_dim=fused.shape[-1] // 2,
                                dropout=self.dropout, dtype=self.dtype,
                                name="classifier")(fused, train=train)
