"""Model registry — the single ``get_model`` factory.

The reference scatters ``get_model`` factories across six files
(``Quadtree_from scratch/models.py:309``, ``experiment/models_cnn.py:120``,
``resnet/models.py:183``, ``comparative analysis/model.py:122``,
``cnn+lstm/models.py:145``, ``3dcnn/models.py:493``). Here one registry
covers every family; construction is config-driven.
"""

from __future__ import annotations

from typing import Callable

import jax.numpy as jnp

from surya_tpu.core.config import ModelConfig

_REGISTRY: dict[str, Callable] = {}

# Families whose inputs are (B, T, H, W, 3)/(B, T, F) sequences — the
# single source of truth for CLI/bench/serving input-shape dispatch.
TEMPORAL_MODELS = frozenset({"cnn_lstm", "ji_3dcnn", "quadtree_3d",
                             "resnet3d_video", "hybrid_quadtree_3d",
                             "fact"})


def register(name: str):
    def deco(fn):
        _REGISTRY[name] = fn
        return fn
    return deco


def list_models() -> list[str]:
    return sorted(_REGISTRY)


def get_model(cfg: ModelConfig):
    """Build a Flax module from a ModelConfig."""
    if cfg.name not in _REGISTRY:
        raise ValueError(
            f"unknown model {cfg.name!r}; available: {list_models()}")
    return _REGISTRY[cfg.name](cfg)


def _dtype(cfg: ModelConfig):
    return jnp.dtype(cfg.compute_dtype)


def _opt(cfg: ModelConfig, *, num_features: bool = False) -> dict:
    """kwargs for per-family optional overrides: cfg.dropout=None means
    'keep the family's reference default', so nothing is forwarded."""
    kw = {}
    if cfg.dropout is not None:
        kw["dropout"] = cfg.dropout
    if num_features:
        kw["num_features"] = cfg.num_features
    return kw


# --- spatial -------------------------------------------------------------

@register("quadtree")
def _quadtree(cfg: ModelConfig):
    from surya_tpu.models.spatial.quadtree import QuadtreeCNN
    return QuadtreeCNN(num_classes=cfg.num_classes, mode=cfg.mode,
                       backbone=cfg.backbone,
                       dtype=_dtype(cfg), use_pallas=cfg.use_pallas,
                       stem_s2d=cfg.stem_space_to_depth, **_opt(cfg))


@register("hierarchical_quadtree")
def _hier(cfg: ModelConfig):
    from surya_tpu.models.spatial.hierarchical import HierarchicalQuadtreeCNN
    return HierarchicalQuadtreeCNN(num_classes=cfg.num_classes,
                                   mode=cfg.mode, backbone=cfg.backbone,
                                   dtype=_dtype(cfg),
                                   stem_s2d=cfg.stem_space_to_depth)


@register("attention_hierarchical")
def _attn_hier(cfg: ModelConfig):
    from surya_tpu.models.spatial.hierarchical import AttentionHierarchicalCNN
    return AttentionHierarchicalCNN(num_classes=cfg.num_classes,
                                    mode=cfg.mode, backbone=cfg.backbone,
                                    dtype=_dtype(cfg),
                                    stem_s2d=cfg.stem_space_to_depth)


@register("standard_resnet")
def _std_resnet(cfg: ModelConfig):
    from surya_tpu.models.spatial.standard import StandardResNetCNN
    return StandardResNetCNN(num_classes=cfg.num_classes,
                             backbone=cfg.backbone, dtype=_dtype(cfg),
                             stem_s2d=cfg.stem_space_to_depth)


@register("standard_multimodal")
def _std_multi(cfg: ModelConfig):
    from surya_tpu.models.spatial.standard import StandardMultimodalCNN
    return StandardMultimodalCNN(num_classes=cfg.num_classes, mode=cfg.mode,
                                 backbone=cfg.backbone, dtype=_dtype(cfg),
                                 stem_s2d=cfg.stem_space_to_depth)


# --- temporal ------------------------------------------------------------

@register("cnn_lstm")
def _cnn_lstm(cfg: ModelConfig):
    from surya_tpu.models.temporal.cnn_lstm import CnnLstm
    return CnnLstm(num_classes=cfg.num_classes, backbone=cfg.backbone,
                   lstm_hidden=cfg.lstm_hidden, lstm_layers=cfg.lstm_layers,
                   dtype=_dtype(cfg),
                   freeze_backbone=cfg.freeze_backbone, **_opt(cfg))


@register("ji_3dcnn")
def _ji3d(cfg: ModelConfig):
    from surya_tpu.models.temporal.conv3d import Ji3DCNN
    return Ji3DCNN(num_classes=cfg.num_classes, dtype=_dtype(cfg),
                   conv3d_as_2d=cfg.conv3d_as_2d, **_opt(cfg))


@register("quadtree_3d")
def _qt3d(cfg: ModelConfig):
    from surya_tpu.models.temporal.conv3d import Quadtree3DCNN
    return Quadtree3DCNN(num_classes=cfg.num_classes, mode=cfg.mode,
                         dtype=_dtype(cfg),
                         conv3d_as_2d=cfg.conv3d_as_2d,
                         **_opt(cfg, num_features=True))


@register("resnet3d_video")
def _r3d(cfg: ModelConfig):
    from surya_tpu.models.temporal.resnet3d_video import ResNet3DVideo
    return ResNet3DVideo(num_classes=cfg.num_classes, dtype=_dtype(cfg),
                         freeze_backbone=cfg.freeze_backbone,
                         **_opt(cfg))


@register("hybrid_quadtree_3d")
def _hybrid3d(cfg: ModelConfig):
    from surya_tpu.models.temporal.resnet3d_video import HybridQuadtree3DCNN
    return HybridQuadtree3DCNN(num_classes=cfg.num_classes, mode=cfg.mode,
                               dtype=_dtype(cfg),
                               freeze_backbone=cfg.freeze_backbone,
                               **_opt(cfg, num_features=True))


@register("fact")
def _fact(cfg: ModelConfig):
    from surya_tpu.models.temporal.fact import FactModel
    return FactModel(num_classes=cfg.num_classes, seq_len=cfg.seq_len,
                     num_layers=cfg.fusion_layers, num_heads=cfg.fusion_heads,
                     embed_dim=cfg.fusion_dim, dtype=_dtype(cfg),
                     freeze_backbone=cfg.freeze_backbone,
                     moe_experts=cfg.moe_experts,
                     moe_top_k=cfg.moe_top_k,
                     **_opt(cfg, num_features=True))
