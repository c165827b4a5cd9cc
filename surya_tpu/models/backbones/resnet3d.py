"""NDHWC 3D ResNet-18 (r3d_18) backbone in Flax linen.

Equivalent of ``torchvision.models.video.r3d_18`` used by the reference's
``ResNet3DVideo`` and ``HybridQuadtree3DCNN`` (``3dcnn/models.py:224,
275-297``): stem Conv3d(3→64, k=(3,7,7), s=(1,2,2)) + BN + ReLU, four
stages of two BasicBlock3d (full 3×3×3 convs), widths 64/128/256/512,
stride-2 (t,h,w) downsampling in stages 2-4.

Layout is (B, T, H, W, C); weight import handles the torchvision
(C_out, C_in, t, h, w) → (t, h, w, C_in, C_out) transpose.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

STAGES3D = ("stem", "layer1", "layer2", "layer3", "layer4")


class BasicBlock3D(nn.Module):
    filters: int
    stride: int = 1
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = partial(nn.BatchNorm, use_running_average=not train,
                       momentum=0.9, epsilon=1e-5, dtype=self.dtype,
                       param_dtype=jnp.float32)
        conv = partial(nn.Conv, use_bias=False, dtype=self.dtype,
                       param_dtype=jnp.float32)
        s = (self.stride,) * 3
        residual = x
        y = conv(self.filters, (3, 3, 3), strides=s,
                 padding=((1, 1), (1, 1), (1, 1)), name="conv1")(x)
        y = nn.relu(norm(name="bn1")(y))
        y = conv(self.filters, (3, 3, 3),
                 padding=((1, 1), (1, 1), (1, 1)), name="conv2")(y)
        y = norm(name="bn2")(y)
        if residual.shape[-1] != self.filters or self.stride != 1:
            residual = conv(self.filters, (1, 1, 1), strides=s,
                            name="downsample_conv")(residual)
            residual = norm(name="downsample_bn")(residual)
        return nn.relu(y + residual)


class ResNet3D(nn.Module):
    """r3d_18 trunk; returns dict with requested captures + 'out'."""

    stage_sizes: Sequence[int] = (2, 2, 2, 2)
    width: int = 64
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False,
                 capture: Sequence[str] = (),
                 train_stages: Sequence[str] | None = None):
        # train_stages: stages whose BN runs in batch-stats mode when
        # train=True (None = all). Partial-unfreeze models pass
        # {"layer4"} so the trainable stage's BN statistics track its
        # drifting convs while frozen stages keep inference-mode BN.
        def stage_train(stage: str) -> bool:
            return train and (train_stages is None
                              or stage in train_stages)

        norm = partial(nn.BatchNorm,
                       use_running_average=not stage_train("stem"),
                       momentum=0.9, epsilon=1e-5, dtype=self.dtype,
                       param_dtype=jnp.float32)
        x = x.astype(self.dtype)
        # torchvision r3d stem: k=(3,7,7), s=(1,2,2), p=(1,3,3).
        x = nn.Conv(self.width, (3, 7, 7), strides=(1, 2, 2),
                    padding=((1, 1), (3, 3), (3, 3)), use_bias=False,
                    dtype=self.dtype, param_dtype=jnp.float32,
                    name="stem_conv")(x)
        x = nn.relu(norm(name="stem_bn")(x))

        outs = {}
        if "stem" in capture:
            outs["stem"] = x
        for i, n_blocks in enumerate(self.stage_sizes):
            stage = f"layer{i + 1}"
            filters = self.width * (2 ** i)
            for j in range(n_blocks):
                stride = 2 if (i > 0 and j == 0) else 1
                x = BasicBlock3D(filters=filters, stride=stride,
                                 dtype=self.dtype,
                                 name=f"{stage}_block{j}")(
                                     x, train=stage_train(stage))
            if stage in capture:
                outs[stage] = x
        outs["out"] = x
        return outs


def r3d_18(dtype=jnp.bfloat16, name=None) -> ResNet3D:
    return ResNet3D(stage_sizes=(2, 2, 2, 2), dtype=dtype, name=name)
