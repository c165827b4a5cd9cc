"""NHWC ResNet backbones in Flax linen, TPU-first.

Functional equivalent of the torchvision ``resnet18``/``resnet50`` the
reference uses as its feature extractor everywhere (e.g.
``Quadtree_from scratch/models.py:221-230``), redesigned for TPU:

- NHWC layout (channels-last feeds the MXU's (8,128)/(16,128) tiling; the
  reference's NCHW is a CUDA convention with no TPU benefit).
- bfloat16 compute / float32 params by default; BN statistics in float32.
- a ``capture`` mechanism returns intermediate stage maps so quadtree
  models can split layer2/layer3 outputs without forward hooks
  (the reference re-instantiates and slices ``nn.Sequential`` children,
  ``models.py:222-243``; here stages are first-class).

Weight import from torchvision checkpoints is in
``surya_tpu.models.backbones.torch_import`` (NCHW→NHWC transposes there).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

# Stage names in forward order. stem = conv1+bn+relu+maxpool.
STAGES = ("stem", "layer1", "layer2", "layer3", "layer4")


def space_to_depth(x: jnp.ndarray, block: int = 2) -> jnp.ndarray:
    """(B, H, W, C) → (B, H/b, W/b, b²·C), channel order (ry, rx, c)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // block, block, w // block, block, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h // block, w // block, block * block * c)


def stem_kernel_to_s2d(k7):
    """(7,7,C,CO) standard stem kernel → the mathematically equivalent
    (4,4,4C,CO) kernel for the space-to-depth stem.

    Derivation: pad the 7-tap kernel to 8 on the LEFT (output index o
    reads input rows 2o-3..2o+3 = blocks o-2..o+1, i.e. 4 blocks with
    the first tap of an 8-tap kernel zero); then fold each (2×2, C) tap
    group into the s2d channel axis in (ry, rx, c) order.
    """
    import numpy as _np

    k7 = _np.asarray(k7)
    c, co = k7.shape[2], k7.shape[3]
    k8 = _np.zeros((8, 8, c, co), k7.dtype)
    k8[1:, 1:] = k7
    k8 = k8.reshape(4, 2, 4, 2, c, co).transpose(0, 2, 1, 3, 4, 5)
    return k8.reshape(4, 4, 4 * c, co)


class _FoldedNorm:
    """Identity stand-in for BatchNorm in ``fold_bn`` mode: the affine
    is pre-folded into the preceding conv's kernel+bias
    (:func:`fold_resnet_params`), so the normalize op disappears from
    the graph entirely (inference-only — no batch stats exist)."""

    def __init__(self, name=None):
        del name

    def __call__(self, x):
        return x


def _layers(fold_bn: bool, train: bool, dtype):
    if fold_bn:
        if train:
            raise ValueError("fold_bn is inference-only (no batch stats)")
        return _FoldedNorm, partial(nn.Conv, use_bias=True, dtype=dtype,
                                    param_dtype=jnp.float32)
    norm = partial(nn.BatchNorm, use_running_average=not train,
                   momentum=0.9, epsilon=1e-5, dtype=dtype,
                   param_dtype=jnp.float32)
    conv = partial(nn.Conv, use_bias=False, dtype=dtype,
                   param_dtype=jnp.float32)
    return norm, conv


class BasicBlock(nn.Module):
    """2×(3×3 conv) residual block (torchvision BasicBlock equivalent)."""

    filters: int
    stride: int = 1
    dtype: Any = jnp.bfloat16
    fold_bn: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm, conv = _layers(self.fold_bn, train, self.dtype)

        residual = x
        y = conv(self.filters, (3, 3), strides=(self.stride, self.stride),
                 padding=((1, 1), (1, 1)), name="conv1")(x)
        y = norm(name="bn1")(y)
        y = nn.relu(y)
        y = conv(self.filters, (3, 3), padding=((1, 1), (1, 1)),
                 name="conv2")(y)
        y = norm(name="bn2")(y)

        if residual.shape[-1] != self.filters or self.stride != 1:
            residual = conv(self.filters, (1, 1),
                            strides=(self.stride, self.stride),
                            name="downsample_conv")(residual)
            residual = norm(name="downsample_bn")(residual)
        return nn.relu(y + residual)


class Bottleneck(nn.Module):
    """1×1 → 3×3 → 1×1 bottleneck block (torchvision Bottleneck, expansion 4)."""

    filters: int
    stride: int = 1
    dtype: Any = jnp.bfloat16
    expansion: int = 4
    fold_bn: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm, conv = _layers(self.fold_bn, train, self.dtype)

        out_ch = self.filters * self.expansion
        residual = x
        y = conv(self.filters, (1, 1), name="conv1")(x)
        y = nn.relu(norm(name="bn1")(y))
        y = conv(self.filters, (3, 3), strides=(self.stride, self.stride),
                 padding=((1, 1), (1, 1)), name="conv2")(y)
        y = nn.relu(norm(name="bn2")(y))
        y = conv(out_ch, (1, 1), name="conv3")(y)
        y = norm(name="bn3")(y)

        if residual.shape[-1] != out_ch or self.stride != 1:
            residual = conv(out_ch, (1, 1),
                            strides=(self.stride, self.stride),
                            name="downsample_conv")(residual)
            residual = norm(name="downsample_bn")(residual)
        return nn.relu(y + residual)


class ResNet(nn.Module):
    """ResNet trunk. Returns the requested stage outputs as a dict.

    ``upto`` truncates computation after a given stage — the quadtree
    models stop at layer3 (``Quadtree_from scratch/models.py:222-230``)
    or layer2 (hierarchical, ``models.py:114-117``), and run layer4 as a
    separate "global branch"; with ``capture`` both come from one trunk
    call without recompute.
    """

    block: type = BasicBlock
    stage_sizes: Sequence[int] = (2, 2, 2, 2)
    width: int = 64
    dtype: Any = jnp.bfloat16
    # Space-to-depth stem (MLPerf TPU ResNet trick): the 7×7/s2 conv on
    # 3 channels wastes the MXU's 128 input lanes (measured: 37% of the
    # trunk's forward time); s2d folds 2×2 pixel blocks into channels
    # (3→12) and runs the mathematically equivalent 4×4/s1 conv.
    # Weight import converts standard kernels via stem_kernel_to_s2d.
    stem_space_to_depth: bool = False
    # Inference-only: BatchNorm affines pre-folded into conv kernels
    # (build params with fold_resnet_params; no batch_stats collection).
    fold_bn: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False, upto: str = "layer4",
                 capture: Sequence[str] = (), start: str | None = None):
        """Run stages [start..upto]. ``start=None`` begins at the stem.

        ``start='layerK'`` skips the stem and earlier stages — used by
        interpret/gradcam to re-run just the tail from a captured
        activation (flax ignores the unused params of skipped stages, so
        the full trunk param tree applies unchanged).
        """
        if upto not in STAGES:
            raise ValueError(f"upto must be one of {STAGES}, got {upto!r}")
        if start is not None and start not in STAGES[1:]:
            raise ValueError(f"start must be one of {STAGES[1:]}")
        norm, conv = _layers(self.fold_bn, train, self.dtype)

        x = x.astype(self.dtype)
        outs = {}
        if start is None:
            if self.stem_space_to_depth:
                x = space_to_depth(x, 2)
                x = conv(self.width, (4, 4), strides=(1, 1),
                         padding=((2, 1), (2, 1)), name="conv1")(x)
            else:
                x = conv(self.width, (7, 7), strides=(2, 2),
                         padding=((3, 3), (3, 3)), name="conv1")(x)
            x = norm(name="bn1")(x)
            x = nn.relu(x)
            # nn.max_pool on purpose: XLA's SelectAndScatter backward
            # (~7 ms/step at BS 256) beat every alternative tried —
            # see BENCH_NOTES.md "Negative result: maxpool backward"
            # and ops/maxpool.py (the exact-semantics reference).
            x = nn.max_pool(x, (3, 3), strides=(2, 2),
                            padding=((1, 1), (1, 1)))
            if "stem" in capture:
                outs["stem"] = x
            if upto == "stem":
                outs["out"] = x
                return outs

        started = start is None
        for i, n_blocks in enumerate(self.stage_sizes):
            stage = f"layer{i + 1}"
            if not started:
                if stage == start:
                    started = True
                else:
                    continue
            filters = self.width * (2 ** i)
            for j in range(n_blocks):
                stride = 2 if (i > 0 and j == 0) else 1
                x = self.block(filters=filters, stride=stride,
                               dtype=self.dtype, fold_bn=self.fold_bn,
                               name=f"{stage}_block{j}")(x, train=train)
            if stage in capture:
                outs[stage] = x
            if upto == stage:
                outs["out"] = x
                return outs
        outs["out"] = x
        return outs


def resnet18(dtype=jnp.bfloat16, name=None, stem_s2d=False,
             fold_bn=False) -> ResNet:
    return ResNet(block=BasicBlock, stage_sizes=(2, 2, 2, 2), dtype=dtype,
                  name=name, stem_space_to_depth=stem_s2d, fold_bn=fold_bn)


def resnet34(dtype=jnp.bfloat16, name=None, stem_s2d=False,
             fold_bn=False) -> ResNet:
    return ResNet(block=BasicBlock, stage_sizes=(3, 4, 6, 3), dtype=dtype,
                  name=name, stem_space_to_depth=stem_s2d, fold_bn=fold_bn)


def resnet50(dtype=jnp.bfloat16, name=None, stem_s2d=False,
             fold_bn=False) -> ResNet:
    return ResNet(block=Bottleneck, stage_sizes=(3, 4, 6, 3), dtype=dtype,
                  name=name, stem_space_to_depth=stem_s2d, fold_bn=fold_bn)


def feature_dim(name: str) -> int:
    """Final (layer4) channel count of a named resnet."""
    return {"resnet18": 512, "resnet34": 512, "resnet50": 2048}[name]


def make_resnet(arch: str, dtype=jnp.bfloat16, name=None,
                stem_s2d=False, fold_bn=False) -> ResNet:
    try:
        return {"resnet18": resnet18, "resnet34": resnet34,
                "resnet50": resnet50}[arch](dtype=dtype, name=name,
                                            stem_s2d=stem_s2d,
                                            fold_bn=fold_bn)
    except KeyError:
        raise ValueError(f"unknown resnet {arch!r}") from None


def stem_is_s2d(trunk_params) -> bool:
    """Infer the stem variant from a param tree's conv1 kernel shape."""
    return trunk_params["conv1"]["kernel"].shape[0] == 4


# conv param name → its following BatchNorm's param name, per the
# module definitions above (every conv in this file is conv→bn).
_BN_FOR_CONV = {"conv1": "bn1", "conv2": "bn2", "conv3": "bn3",
                "downsample_conv": "downsample_bn"}


def fold_resnet_params(params, stats, eps: float = 1e-5):
    """Trained (params, batch_stats) → params for ``ResNet(fold_bn=True)``.

    Inference-mode BatchNorm is a per-channel affine
    ``y = (x − μ)/√(σ²+ε)·γ + β``; with ``g = γ/√(σ²+ε)`` it folds into
    the preceding bias-free conv as ``kernel' = kernel·g`` (HWIO, g over
    O) and ``bias' = β − μ·g`` — the standard deployment transform.
    Exactness vs the unfolded trunk is pinned by test; whether it's
    *faster* on TPU is an empirical question (XLA may already fuse the
    affine into the conv) — see BENCH_NOTES.
    """
    def fold(p, s):
        out = {}
        for k, v in p.items():
            if k in _BN_FOR_CONV.values():
                continue  # consumed by its conv
            if not isinstance(v, dict):
                out[k] = v
            elif "kernel" not in v:
                out[k] = fold(v, s.get(k, {}))
            else:
                bn = _BN_FOR_CONV.get(k)
                if bn is not None and bn in p:
                    g = p[bn]["scale"] / jnp.sqrt(s[bn]["var"] + eps)
                    bias = p[bn]["bias"] - s[bn]["mean"] * g
                    if "bias" in v:
                        bias = bias + v["bias"] * g
                    out[k] = {"kernel": v["kernel"] * g, "bias": bias}
                else:
                    out[k] = dict(v)
        return out

    return fold(params, stats)
