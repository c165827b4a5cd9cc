"""NHWC VGG-16 backbone (feature extractor form).

Equivalent of torchvision ``vgg16`` as used by the comparative sweep
(``comparative analysis/model.py:24-27``): the conv feature stack +
7×7 adaptive pool, classifier stripped → a flattened 25088-d (7·7·512)
feature vector. No batch norm (torchvision vgg16 config D).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

# torchvision cfg "D": conv widths with 'M' maxpools between blocks.
_CFG_D = (64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
          512, 512, 512, "M", 512, 512, 512, "M")

FEATURE_DIM = 7 * 7 * 512  # 25088


class VGG16Features(nn.Module):
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        del train  # no BN/dropout in the feature stack
        x = x.astype(self.dtype)
        conv_idx = 0
        for v in _CFG_D:
            if v == "M":
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            else:
                x = nn.Conv(v, (3, 3), padding=((1, 1), (1, 1)),
                            dtype=self.dtype, param_dtype=jnp.float32,
                            name=f"conv{conv_idx}")(x)
                x = nn.relu(x)
                conv_idx += 1
        # 224 input → (B,7,7,512); adaptive-pool target is already 7×7.
        b = x.shape[0]
        return x.reshape(b, -1)  # (B, 25088)
