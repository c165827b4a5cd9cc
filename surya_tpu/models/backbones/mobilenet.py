"""NHWC MobileNetV2 backbone (feature extractor form).

Equivalent of torchvision ``mobilenet_v2`` with the classifier stripped
(``comparative analysis/model.py:29-33``): inverted-residual stack +
final 1×1 conv to 1280 + GAP → (B, 1280).
"""

from __future__ import annotations

from functools import partial
from typing import Any

import flax.linen as nn
import jax.numpy as jnp

# (expansion t, channels c, repeats n, stride s) — MobileNetV2 table 2.
_SETTINGS = ((1, 16, 1, 1), (6, 24, 2, 2), (6, 32, 3, 2), (6, 64, 4, 2),
             (6, 96, 3, 1), (6, 160, 3, 2), (6, 320, 1, 1))

FEATURE_DIM = 1280


def _relu6(x):
    return jnp.minimum(nn.relu(x), 6.0)


class InvertedResidual(nn.Module):
    out_ch: int
    stride: int
    expand: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = partial(nn.BatchNorm, use_running_average=not train,
                       momentum=0.9, epsilon=1e-5, dtype=self.dtype,
                       param_dtype=jnp.float32)
        in_ch = x.shape[-1]
        hidden = in_ch * self.expand
        y = x
        if self.expand != 1:
            y = nn.Conv(hidden, (1, 1), use_bias=False, dtype=self.dtype,
                        param_dtype=jnp.float32, name="expand_conv")(y)
            y = _relu6(norm(name="expand_bn")(y))
        # Depthwise 3×3.
        y = nn.Conv(hidden, (3, 3), strides=(self.stride, self.stride),
                    padding=((1, 1), (1, 1)), feature_group_count=hidden,
                    use_bias=False, dtype=self.dtype,
                    param_dtype=jnp.float32, name="dw_conv")(y)
        y = _relu6(norm(name="dw_bn")(y))
        # Linear projection.
        y = nn.Conv(self.out_ch, (1, 1), use_bias=False, dtype=self.dtype,
                    param_dtype=jnp.float32, name="project_conv")(y)
        y = norm(name="project_bn")(y)
        if self.stride == 1 and in_ch == self.out_ch:
            y = y + x
        return y


class MobileNetV2Features(nn.Module):
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = partial(nn.BatchNorm, use_running_average=not train,
                       momentum=0.9, epsilon=1e-5, dtype=self.dtype,
                       param_dtype=jnp.float32)
        x = x.astype(self.dtype)
        x = nn.Conv(32, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                    use_bias=False, dtype=self.dtype,
                    param_dtype=jnp.float32, name="stem_conv")(x)
        x = _relu6(norm(name="stem_bn")(x))
        block = 0
        for t, c, n, s in _SETTINGS:
            for i in range(n):
                x = InvertedResidual(out_ch=c, stride=s if i == 0 else 1,
                                     expand=t, dtype=self.dtype,
                                     name=f"block{block}")(x, train=train)
                block += 1
        x = nn.Conv(FEATURE_DIM, (1, 1), use_bias=False, dtype=self.dtype,
                    param_dtype=jnp.float32, name="head_conv")(x)
        x = _relu6(norm(name="head_bn")(x))
        return jnp.mean(x, axis=(1, 2), dtype=self.dtype)  # (B, 1280)
