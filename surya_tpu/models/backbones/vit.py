"""ViT-B/16 backbone in Flax linen (timm vit_base_patch16_224 equivalent).

The reference's FACT model uses a frozen timm
``vit_base_patch16_224.augreg_in21k_ft_in1k`` with ``num_classes=0`` as a
per-frame CLS-embedding extractor (``VIT/fact_model.py:74-81``). This is
the same architecture: 16×16 patch embed → 768, learned CLS token +
position embeddings, 12 pre-LN transformer blocks (12 heads, MLP 3072,
GELU), final LN; returns the CLS embedding.

TPU notes: attention runs as batched (B·T, 197, 768) matmuls in bf16 on
the MXU; the patch embed is a strided conv (NHWC). All shapes static.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp


class MlpBlock(nn.Module):
    mlp_dim: int
    dropout: float = 0.0
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = x.shape[-1]
        x = nn.Dense(self.mlp_dim, dtype=self.dtype,
                     param_dtype=jnp.float32, name="fc1")(x)
        x = nn.gelu(x, approximate=False)  # timm/torch exact-erf GELU
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        x = nn.Dense(d, dtype=self.dtype, param_dtype=jnp.float32,
                     name="fc2")(x)
        return nn.Dropout(self.dropout, deterministic=not train)(x)


class EncoderBlock(nn.Module):
    num_heads: int
    mlp_dim: int
    dropout: float = 0.0
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = nn.LayerNorm(dtype=self.dtype, param_dtype=jnp.float32,
                         name="ln1")(x)
        y = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, dtype=self.dtype,
            param_dtype=jnp.float32,
            dropout_rate=self.dropout, deterministic=not train,
            name="attn")(y, y)
        x = x + y
        y = nn.LayerNorm(dtype=self.dtype, param_dtype=jnp.float32,
                         name="ln2")(x)
        y = MlpBlock(mlp_dim=self.mlp_dim, dropout=self.dropout,
                     dtype=self.dtype, name="mlp")(y, train=train)
        return x + y


class ViT(nn.Module):
    """Returns the final-LN CLS embedding: (B, H, W, 3) → (B, embed_dim)."""

    patch: int = 16
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_dim: int = 3072
    dropout: float = 0.0
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, _ = x.shape
        x = x.astype(self.dtype)
        x = nn.Conv(self.embed_dim, (self.patch, self.patch),
                    strides=(self.patch, self.patch), dtype=self.dtype,
                    param_dtype=jnp.float32, name="patch_embed")(x)
        n = (h // self.patch) * (w // self.patch)
        x = x.reshape(b, n, self.embed_dim)

        cls = self.param("cls_token", nn.initializers.zeros,
                         (1, 1, self.embed_dim), jnp.float32)
        x = jnp.concatenate(
            [jnp.broadcast_to(cls, (b, 1, self.embed_dim)).astype(
                self.dtype), x], axis=1)
        pos = self.param("pos_embed",
                         nn.initializers.normal(stddev=0.02),
                         (1, n + 1, self.embed_dim), jnp.float32)
        x = x + pos.astype(self.dtype)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)

        for i in range(self.depth):
            x = EncoderBlock(num_heads=self.num_heads,
                             mlp_dim=self.mlp_dim, dropout=self.dropout,
                             dtype=self.dtype,
                             name=f"block{i}")(x, train=train)
        x = nn.LayerNorm(dtype=self.dtype, param_dtype=jnp.float32,
                         name="ln_final")(x)
        return x[:, 0]  # CLS embedding


def vit_base_patch16(dtype=jnp.bfloat16, name=None) -> ViT:
    return ViT(dtype=dtype, name=name)
