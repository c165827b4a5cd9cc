"""CNN+LSTM multimodal sequence classifier.

Parity with ``cnn+lstm/models.py:14-89``: frozen ResNet-18 per frame →
512; numeric MLP 47→128→ReLU→128 per timestep; concat → 640; 2-layer
LSTM hidden 256 (inter-layer dropout 0.5); last timestep → head
256→128→ReLU→Dropout→classes.

TPU formulation: frames fold into the batch axis — (B,T,H,W,3) →
(B·T,H,W,3) — so the backbone runs once at T× batch (the reference does
the same reshape, ``models.py:66-70``); the LSTM is a lax.scan. Backbone
freezing is a training-time decision (optax mask, see train/loop); BN in
the frozen trunk runs in inference mode.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from surya_tpu.models.backbones import feature_extractor
from surya_tpu.models.common import FusionClassifier
from surya_tpu.models.temporal.recurrent import StackedLSTM, last_step


class CnnLstm(nn.Module):
    num_classes: int = 8
    backbone: str = "resnet18"
    lstm_hidden: int = 256
    lstm_layers: int = 2
    dropout: float = 0.5
    num_mlp_out: int = 128
    dtype: Any = jnp.bfloat16
    freeze_backbone: bool = True

    @nn.compact
    def __call__(self, image_sequence, numerical_sequence,
                 train: bool = False):
        """image_sequence (B,T,H,W,3), numerical_sequence (B,T,47)."""
        b, t = image_sequence.shape[:2]
        frames = image_sequence.reshape((b * t,) + image_sequence.shape[2:])
        trunk_train = train and not self.freeze_backbone
        feats = feature_extractor(self.backbone, self.dtype,
                                  name="trunk")(frames, train=trunk_train)
        feats = feats.reshape(b, t, -1)                    # (B, T, 512)

        n = numerical_sequence.astype(self.dtype)
        n = nn.Dense(128, dtype=self.dtype, param_dtype=jnp.float32,
                     name="num_fc1")(n)
        n = nn.relu(n)
        n = nn.Dense(self.num_mlp_out, dtype=self.dtype,
                     param_dtype=jnp.float32, name="num_fc2")(n)

        fused = jnp.concatenate([feats, n], axis=-1)       # (B, T, 640)
        out = StackedLSTM(hidden=self.lstm_hidden,
                          num_layers=self.lstm_layers,
                          dropout=self.dropout, dtype=self.dtype,
                          name="lstm")(fused, train=train)
        final = last_step(out)                             # (B, 256)
        return FusionClassifier(num_classes=self.num_classes,
                                hidden_dim=128, dropout=self.dropout,
                                dtype=self.dtype,
                                name="classifier")(final, train=train)
