"""Shared model components: numerical-feature MLP, fusion classifier, modes.

Every spatial model in the reference repeats the same two heads:
- numerical MLP Linear(47→94)→ReLU→Dropout(0.5)→Linear(94→256), NO final
  activation (``Quadtree_from scratch/models.py:255-260``, ``comparative
  analysis/model.py:43-48``, ``experiment/models_cnn.py:47-52``)
- single-layer numeric variant Linear(47→128)→ReLU→Dropout(0.5) used by
  the hierarchical models (``Quadtree_from scratch/models.py:151-155``)
- fusion classifier (img_dim+num_dim)→hidden→ReLU→Dropout(0.5)→classes
  (``models.py:266-271``)
plus the fusion/image_only/numerical_only ablation switch
(``experiment/models_cnn.py:55-116``). Here they are single modules.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

MODES = ("fusion", "image_only", "numerical_only")


def check_mode(mode: str) -> None:
    if mode not in MODES:
        raise ValueError(f"mode must be one of {MODES}, got {mode!r}")


def apply_mode_ablation(mode: str, images, feats):
    """Zero the unused modality for the ablation modes (the reference
    feeds dummy tensors, ``experiment/test_on_video_cnn.py:264-271``).
    Single owner of the rule for both inference tiers (infer/video.py,
    infer/serve.py)."""
    if mode == "numerical_only":
        images = jnp.zeros_like(images)
    if mode == "image_only":
        feats = jnp.zeros_like(feats)
    return images, feats


class NumericalMLP(nn.Module):
    """47 → hidden (=2×in) → ReLU → Dropout → out projection (no final
    activation, matching ``Quadtree_from scratch/models.py:255-260``)."""

    out_dim: int = 256
    hidden_dim: int | None = None  # default 2× input dim (47→94)
    dropout: float = 0.5
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x.astype(self.dtype)
        hidden = self.hidden_dim or 2 * x.shape[-1]
        x = nn.Dense(hidden, dtype=self.dtype, param_dtype=jnp.float32,
                     name="fc1")(x)
        x = nn.relu(x)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return nn.Dense(self.out_dim, dtype=self.dtype,
                        param_dtype=jnp.float32, name="fc2")(x)


class SingleLayerNumericalMLP(nn.Module):
    """Linear(47→128) → ReLU → Dropout — the hierarchical models' numeric
    branch (``Quadtree_from scratch/models.py:151-155`` and ``:44-47``).
    Note dropout is the LAST op (active at train time on the output)."""

    out_dim: int = 128
    dropout: float = 0.5
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Dense(self.out_dim, dtype=self.dtype,
                     param_dtype=jnp.float32, name="fc1")(
                         x.astype(self.dtype))
        x = nn.relu(x)
        return nn.Dropout(self.dropout, deterministic=not train)(x)


class _DenseParams(nn.Module):
    """Declares kernel/bias params with nn.Dense's names, shapes and
    initializers WITHOUT computing — lets the Pallas fused head share the
    exact same parameter tree as the nn.Dense path (checkpoints, sharding
    rules and weight importers see one layout)."""

    features: int

    @nn.compact
    def __call__(self, in_dim: int):
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (in_dim, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32)
        return kernel, bias


class FusionClassifier(nn.Module):
    """concat(features) → hidden → ReLU → Dropout → logits (float32).

    ``use_pallas=True`` routes through the VMEM-fused Pallas head
    (ops/pallas/fusion_head.py — fc1+ReLU+in-kernel-dropout+fc2 in one
    pass, no HBM round-trip of the (B, hidden) activations); both paths
    share the same fc1/fc2 parameters so the flag is a runtime choice.
    """

    num_classes: int
    hidden_dim: int | None = None  # default = in_dim // 2
    dropout: float = 0.5
    dtype: Any = jnp.bfloat16
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x.astype(self.dtype)
        hidden = self.hidden_dim or max(x.shape[-1] // 2, self.num_classes)

        if self.use_pallas:
            from surya_tpu.ops.pallas.fusion_head import fusion_head

            k1, b1 = _DenseParams(hidden, name="fc1")(x.shape[-1])
            k2, b2 = _DenseParams(self.num_classes, name="fc2")(hidden)
            rate = self.dropout if train else 0.0
            seed = None
            if rate > 0.0:
                # per-step scalar seed from the dropout PRNG stream
                key = self.make_rng("dropout")
                seed = jax.random.key_data(key).ravel()[-1].astype(
                    jnp.int32)
            return fusion_head(x, k1, b1, k2, b2, rate=rate, seed=seed)

        x = nn.Dense(hidden, dtype=self.dtype, param_dtype=jnp.float32,
                     name="fc1")(x)
        x = nn.relu(x)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        x = nn.Dense(self.num_classes, dtype=jnp.float32,
                     param_dtype=jnp.float32, name="fc2")(x)
        return x  # logits in float32 for a stable softmax/CE


def fuse_by_mode(mode: str, image_feat, num_feat):
    """Select classifier input per the reference's ablation switch."""
    if mode == "fusion":
        return jnp.concatenate(
            [image_feat, num_feat.astype(image_feat.dtype)], axis=-1)
    if mode == "image_only":
        return image_feat
    if mode == "numerical_only":
        return num_feat
    raise ValueError(f"bad mode {mode!r}")
