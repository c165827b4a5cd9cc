"""Custom 3D-conv spatiotemporal models: Ji3DCNN and Quadtree3DCNN.

``Ji3DCNN`` — parity with ``cnn+lstm/models.py:93-142``: visual stream
Conv3d 3→32→64→128 (each Conv+BN3d+ReLU per ``conv_3d_block``,
``models.py:6-11``) with pools (1,2,2) then (2,2,2), global avg-pool →
128; numeric 1-layer LSTM hidden 64 (last step); classifier
192→128→ReLU→Dropout(0.5)→classes.

``Quadtree3DCNN`` — parity with ``3dcnn/models.py:96-214``: Conv3d stack
3→32→64→128→256, each Conv(k3,p1)+BN3d+ReLU+MaxPool3d with pool shapes
(1,2,2),(2,2,2),(2,2,2),(1,2,2); final Conv3d 256→1024+BN+ReLU; GAP →
1024; numeric 2-layer LSTM hidden 188 (47·4, inter-layer dropout 0.6) →
projection 188→512+ReLU+Dropout; modes fusion (1536) / image_only
(1024); classifier dim→dim/2→classes, dropout 0.6.

TPU formulation: NDHWC layout (B,T,H,W,C) — 3D convs via ``nn.Conv`` with
3-element kernels lower to ``lax.conv_general_dilated`` XLA ops the TPU
tiles onto the MXU; pooling via ``nn.max_pool`` 3-D windows; GAP is a
fused mean reduction; LSTM is a lax.scan.
"""

from __future__ import annotations

from functools import partial
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from surya_tpu.models.common import FusionClassifier
from surya_tpu.models.temporal.recurrent import StackedLSTM, last_step

QT3D_MODES = ("fusion", "image_only")


class Conv3dAs2D(nn.Module):
    """k=(3,3,3) SAME conv3d computed as 3 temporally-shifted batched
    2D convs: y[t] = Σ_dt conv2d(x[t+dt-1], K[dt]).

    Structural lever for the reference's Conv3d stacks
    (``3dcnn/models.py:107-139``): TPU conv units are 2-D — XLA lowers
    a (3,3,3) conv3d by materializing the temporal taps itself, and
    this formulation instead folds T into the batch axis so each tap is
    one large batched NHWC conv (maximal MXU tiling, no temporal
    window bookkeeping in the hot loop). Parameter tree IDENTICAL to
    ``nn.Conv(features, (3,3,3))`` — kernel (3,3,3,Cin,Cout) + bias —
    so checkpoints/imports are unaffected and the two paths are
    swappable per config (``ModelConfig.conv3d_as_2d``); equivalence is
    pinned by tests/test_models.py.
    """

    features: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        kernel = self.param("kernel",
                            nn.initializers.lecun_normal(),
                            (3, 3, 3, cin, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32)
        b, t, h, w, _ = x.shape
        xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0), (0, 0)))
        y = None
        for dt in range(3):
            xi = xp[:, dt:dt + t].reshape(b * t, h, w, cin)
            yi = jax.lax.conv_general_dilated(
                xi.astype(self.dtype), kernel[dt].astype(self.dtype),
                window_strides=(1, 1), padding=((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            y = yi if y is None else y + yi
        y = y + bias.astype(self.dtype)
        return y.reshape(b, t, h, w, self.features)


def _conv3d_block(x, ch, dtype, train, name, as_2d=False):
    """Conv3d(k3,p1) + BN + ReLU — conv_3d_block equivalent."""
    if as_2d:
        x = Conv3dAs2D(ch, dtype=dtype, name=f"{name}_conv")(x)
    else:
        x = nn.Conv(ch, (3, 3, 3), padding=((1, 1), (1, 1), (1, 1)),
                    dtype=dtype, param_dtype=jnp.float32,
                    name=f"{name}_conv")(x)
    x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                     epsilon=1e-5, dtype=dtype, param_dtype=jnp.float32,
                     name=f"{name}_bn")(x)
    return nn.relu(x)


def _pool3d(x, window):
    return nn.max_pool(x, window, strides=window)


class Ji3DCNN(nn.Module):
    num_classes: int = 8
    dropout: float = 0.5
    dtype: Any = jnp.bfloat16
    conv3d_as_2d: bool = False  # Conv3dAs2D decomposition (same params)

    @nn.compact
    def __call__(self, image_sequence, numerical_sequence,
                 train: bool = False):
        """image_sequence (B,T,H,W,3) NDHWC; numerical (B,T,47)."""
        if image_sequence.shape[1] < 2:
            raise ValueError(
                f"Ji3DCNN needs seq_len >= 2 to survive its (2,2,2) "
                f"temporal pooling, got T={image_sequence.shape[1]} — a "
                f"shorter clip would pool to a zero-size temporal dim "
                f"(torch raises 'Output size is too small' here, "
                f"cnn+lstm/models.py:99-106)")
        x = image_sequence.astype(self.dtype)
        as2d = self.conv3d_as_2d
        x = _conv3d_block(x, 32, self.dtype, train, "block1", as2d)
        x = _pool3d(x, (1, 2, 2))
        x = _conv3d_block(x, 64, self.dtype, train, "block2", as2d)
        x = _pool3d(x, (2, 2, 2))
        x = _conv3d_block(x, 128, self.dtype, train, "block3", as2d)
        v = jnp.mean(x, axis=(1, 2, 3), dtype=self.dtype)  # (B, 128)

        lstm_out = StackedLSTM(hidden=64, num_layers=1, dtype=self.dtype,
                               name="numerical_lstm")(numerical_sequence,
                                                      train=train)
        n = last_step(lstm_out)                            # (B, 64)

        fused = jnp.concatenate([v, n], axis=-1)           # (B, 192)
        return FusionClassifier(num_classes=self.num_classes,
                                hidden_dim=128, dropout=self.dropout,
                                dtype=self.dtype,
                                name="classifier")(fused, train=train)


class Quadtree3DCNN(nn.Module):
    num_classes: int = 8
    mode: str = "fusion"
    feature_dim: int = 1024
    num_features: int = 47
    dropout: float = 0.6
    dtype: Any = jnp.bfloat16
    conv3d_as_2d: bool = False  # Conv3dAs2D decomposition (same params)

    @nn.compact
    def __call__(self, image_sequence, numerical_sequence,
                 train: bool = False):
        if self.mode not in QT3D_MODES:
            raise ValueError(f"mode must be one of {QT3D_MODES}")
        if image_sequence.shape[1] < 4:
            raise ValueError(
                f"Quadtree3DCNN needs seq_len >= 4 to survive its two "
                f"(2,2,2) temporal poolings, got "
                f"T={image_sequence.shape[1]} — a shorter clip pools to "
                f"a zero-size temporal dim whose mean is silently NaN "
                f"(torch raises 'Output size is too small'; the "
                f"reference trains with T=5, "
                f"3dcnn/train_3D_Quadtree_cnn_model.py:35)")
        block = partial(_conv3d_block, dtype=self.dtype, train=train,
                        as_2d=self.conv3d_as_2d)

        x = image_sequence.astype(self.dtype)
        x = _pool3d(block(x, ch=32, name="block1"), (1, 2, 2))
        x = _pool3d(block(x, ch=64, name="block2"), (2, 2, 2))
        x = _pool3d(block(x, ch=128, name="block3"), (2, 2, 2))
        x = _pool3d(block(x, ch=256, name="block4"), (1, 2, 2))
        x = block(x, ch=self.feature_dim, name="final")
        img = jnp.mean(x, axis=(1, 2, 3), dtype=self.dtype)  # (B, 1024)

        if self.mode == "fusion":
            lstm_out = StackedLSTM(hidden=self.num_features * 4,
                                   num_layers=2, dropout=self.dropout,
                                   dtype=self.dtype,
                                   name="numerical_lstm")(
                                       numerical_sequence, train=train)
            n = last_step(lstm_out)                          # (B, 188)
            n = nn.Dense(self.feature_dim // 2, dtype=self.dtype,
                         param_dtype=jnp.float32,
                         name="numerical_projection")(n)
            n = nn.relu(n)
            n = nn.Dropout(self.dropout, deterministic=not train)(n)
            fused = jnp.concatenate([img, n], axis=-1)       # (B, 1536)
        else:
            fused = img

        return FusionClassifier(num_classes=self.num_classes,
                                hidden_dim=fused.shape[-1] // 2,
                                dropout=self.dropout, dtype=self.dtype,
                                name="classifier")(fused, train=train)
