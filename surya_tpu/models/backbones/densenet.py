"""NHWC DenseNet-121 backbone (feature extractor form).

Equivalent of torchvision ``densenet121`` with the classifier stripped
(``comparative analysis/model.py:34-38``): dense blocks (6,12,24,16),
growth 32, transitions halving channels, final BN+ReLU+GAP → (B, 1024).

TPU note: dense connectivity is concatenation-heavy; XLA handles the
concats as layout-preserving fusions, and all convs stay NHWC/bf16.
"""

from __future__ import annotations

from functools import partial
from typing import Any

import flax.linen as nn
import jax.numpy as jnp

_BLOCKS = (6, 12, 24, 16)
_GROWTH = 32
_BN_SIZE = 4

FEATURE_DIM = 1024


class DenseLayer(nn.Module):
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = partial(nn.BatchNorm, use_running_average=not train,
                       momentum=0.9, epsilon=1e-5, dtype=self.dtype,
                       param_dtype=jnp.float32)
        y = nn.relu(norm(name="bn1")(x))
        y = nn.Conv(_BN_SIZE * _GROWTH, (1, 1), use_bias=False,
                    dtype=self.dtype, param_dtype=jnp.float32,
                    name="conv1")(y)
        y = nn.relu(norm(name="bn2")(y))
        y = nn.Conv(_GROWTH, (3, 3), padding=((1, 1), (1, 1)),
                    use_bias=False, dtype=self.dtype,
                    param_dtype=jnp.float32, name="conv2")(y)
        return jnp.concatenate([x, y], axis=-1)


class DenseNet121Features(nn.Module):
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = partial(nn.BatchNorm, use_running_average=not train,
                       momentum=0.9, epsilon=1e-5, dtype=self.dtype,
                       param_dtype=jnp.float32)
        x = x.astype(self.dtype)
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
                    use_bias=False, dtype=self.dtype,
                    param_dtype=jnp.float32, name="stem_conv")(x)
        x = nn.relu(norm(name="stem_bn")(x))
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        for bi, n_layers in enumerate(_BLOCKS):
            for li in range(n_layers):
                x = DenseLayer(dtype=self.dtype,
                               name=f"block{bi}_layer{li}")(x, train=train)
            if bi != len(_BLOCKS) - 1:
                # Transition: BN+ReLU+1×1 conv (half channels)+avgpool2.
                x = nn.relu(norm(name=f"trans{bi}_bn")(x))
                x = nn.Conv(x.shape[-1] // 2, (1, 1), use_bias=False,
                            dtype=self.dtype, param_dtype=jnp.float32,
                            name=f"trans{bi}_conv")(x)
                x = nn.avg_pool(x, (2, 2), strides=(2, 2))

        x = nn.relu(norm(name="final_bn")(x))
        return jnp.mean(x, axis=(1, 2), dtype=self.dtype)  # (B, 1024)
