"""FACT — Fused Action-Conditioned Transformer (ViT spatiotemporal fusion).

Parity with ``VIT/fact_model.py:7-147``: a frozen ViT-B/16 extracts one
CLS embedding (768) per frame; a numeric projector maps 47→384→ReLU→768
per timestep; token-type embeddings (0=image, 1=numeric) are added; the
tokens interleave as [img_1, num_1, …, img_T, num_T]; a learned CLS token
is prepended and a learned positional embedding of length 2T+1 added; a
4-layer post-LN TransformerEncoder (d=768, 8 heads, ff=3072, dropout 0.1,
ReLU — matching ``nn.TransformerEncoderLayer`` defaults at ``:50-58``)
runs over the fused sequence; the head is LayerNorm+Linear on the CLS
output.

(The reference constructs its ViT twice and the second overwrites the
first, ``fact_model.py:24-38`` vs ``:74-81`` — here it is built once.)

TPU formulation: all T frames fold into the batch for the ViT; the fusion
encoder attention is sequence-parallel capable via
``surya_tpu.parallel.ring_attention`` when the ('seq',) mesh axis is >1;
the homogeneous 4-layer encoder stack is pipeline-parallel capable via
``fact_apply_pipelined`` (parallel/pipeline.py GPipe schedule). The
model is split into ``embed`` / ``encoder_stack`` / ``head`` methods so
the pipeline runner can drive the stack itself; the parameter tree is
identical to the monolithic form (checkpoints and the torch importer
are unaffected).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P


class PostLNEncoderLayer(nn.Module):
    """torch nn.TransformerEncoderLayer equivalent (post-LN, ReLU FFN).

    ``attention_fn`` switches the attention implementation without
    changing parameters — e.g. the ring-attention CP path from
    ``surya_tpu.parallel.ring_attention.make_flax_attention_fn``.
    """

    num_heads: int = 8
    ff_dim: int = 3072
    dropout: float = 0.1
    dtype: Any = jnp.bfloat16
    attention_fn: Any = None
    # >0 replaces the dense FFN with a Mixture-of-Experts FFN
    # (parallel/moe.py) — the beyond-reference EP variant; 0 keeps the
    # reference-parity dense path (param tree unchanged).
    moe_experts: int = 0
    moe_top_k: int = 2
    moe_mesh: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        attn_kwargs = {}
        if self.attention_fn is not None:
            attn_kwargs["attention_fn"] = self.attention_fn
        y = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, dtype=self.dtype,
            param_dtype=jnp.float32, dropout_rate=self.dropout,
            deterministic=not train, name="attn",
            **attn_kwargs)(x, x)
        y = nn.Dropout(self.dropout, deterministic=not train)(y)
        x = nn.LayerNorm(dtype=self.dtype, param_dtype=jnp.float32,
                         name="ln1")(x + y)
        if self.moe_experts:
            from surya_tpu.parallel.moe import MoEFFN

            y = MoEFFN(num_experts=self.moe_experts,
                       ff_dim=self.ff_dim, top_k=self.moe_top_k,
                       dropout=self.dropout, dtype=self.dtype,
                       mesh=self.moe_mesh, name="moe")(x, train=train)
        else:
            y = nn.Dense(self.ff_dim, dtype=self.dtype,
                         param_dtype=jnp.float32, name="ff1")(x)
            y = nn.relu(y)
            y = nn.Dropout(self.dropout, deterministic=not train)(y)
            y = nn.Dense(x.shape[-1], dtype=self.dtype,
                         param_dtype=jnp.float32, name="ff2")(y)
        y = nn.Dropout(self.dropout, deterministic=not train)(y)
        return nn.LayerNorm(dtype=self.dtype, param_dtype=jnp.float32,
                            name="ln2")(x + y)


class FactModel(nn.Module):
    num_classes: int = 8
    seq_len: int = 4
    num_features: int = 47
    embed_dim: int = 768
    num_layers: int = 4
    num_heads: int = 8
    dropout: float = 0.1
    dtype: Any = jnp.bfloat16
    freeze_backbone: bool = True
    # ViT backbone dims (defaults = ViT-B/16 as in the reference; the
    # backbone embed width is tied to the fusion width like timm's
    # num_classes=0 CLS output feeding the fusion transformer directly).
    vit_depth: int = 12
    vit_heads: int = 12
    # Optional jax.sharding.Mesh with a >1 'seq' axis: the fusion
    # attention runs sequence-parallel via ring attention (same params).
    cp_mesh: Any = None
    # >0: MoE FFN in every fusion layer (EP-shardable over an 'expert'
    # mesh axis via moe_mesh) — beyond-reference extension.
    moe_experts: int = 0
    moe_top_k: int = 2
    moe_mesh: Any = None

    def setup(self):
        from surya_tpu.models.backbones.vit import ViT

        d = self.embed_dim
        self.vit_backbone = ViT(embed_dim=d, depth=self.vit_depth,
                                num_heads=self.vit_heads, mlp_dim=4 * d,
                                dtype=self.dtype)
        self.num_proj1 = nn.Dense(d // 2, dtype=self.dtype,
                                  param_dtype=jnp.float32)
        self.num_proj2 = nn.Dense(d, dtype=self.dtype,
                                  param_dtype=jnp.float32)
        # stddev 1.0: the reference's nn.Embedding(2, d) default init is
        # N(0,1) (VIT/fact_model.py:89), same scale as cls/pos below
        self.token_type_embed = self.param(
            "token_type_embed", nn.initializers.normal(stddev=1.0),
            (2, d), jnp.float32)
        self.cls_token = self.param(
            "cls_token", nn.initializers.normal(stddev=1.0), (1, 1, d),
            jnp.float32)
        self.pos_embed = self.param(
            "pos_embed", nn.initializers.normal(stddev=1.0),
            (1, 2 * self.seq_len + 1, d), jnp.float32)

        attention_fn = None
        if self.cp_mesh is not None and self.cp_mesh.shape.get(
                "seq", 1) > 1:
            from surya_tpu.parallel.ring_attention import (
                make_flax_attention_fn,
            )
            attention_fn = make_flax_attention_fn(self.cp_mesh)
        # setattr keeps the flax scope names fusion0..fusionN-1 (a list
        # attribute would rename them fusion_layers_0..; name= is not
        # allowed on setup-assigned modules)
        for i in range(self.num_layers):
            setattr(self, f"fusion{i}", PostLNEncoderLayer(
                num_heads=self.num_heads, ff_dim=4 * d,
                dropout=self.dropout, dtype=self.dtype,
                attention_fn=attention_fn,
                moe_experts=self.moe_experts,
                moe_top_k=self.moe_top_k, moe_mesh=self.moe_mesh))

        self.head_ln = nn.LayerNorm(dtype=self.dtype,
                                    param_dtype=jnp.float32)
        self.head_fc = nn.Dense(self.num_classes, dtype=jnp.float32,
                                param_dtype=jnp.float32)

    def embed(self, image_sequence, numerical_sequence,
              train: bool = False):
        """Steps 1-5: per-frame ViT CLS + numeric projector + type
        embeddings + interleave + CLS/positional — (B, 2T+1, d)."""
        b, t = image_sequence.shape[:2]
        if t != self.seq_len:
            raise ValueError(
                f"FactModel(seq_len={self.seq_len}) got a T={t} "
                f"sequence — pos_embed is sized 2*seq_len+1; set "
                f"model.seq_len to match data.seq_len")
        d = self.embed_dim

        frames = image_sequence.reshape(
            (b * t,) + image_sequence.shape[2:])
        img_tok = self.vit_backbone(
            frames, train=train and not self.freeze_backbone)
        img_tok = img_tok.reshape(b, t, d)

        # Numeric projector 47→d/2→ReLU→d (fact_model.py:42-46).
        n = numerical_sequence.astype(self.dtype)
        num_tok = self.num_proj2(nn.relu(self.num_proj1(n)))

        type_embed = self.token_type_embed.astype(self.dtype)
        img_tok = img_tok + type_embed[0]
        num_tok = num_tok + type_embed[1]

        # Interleave [img_1, num_1, img_2, num_2, ...] → (B, 2T, d).
        fused = jnp.stack([img_tok, num_tok], axis=2).reshape(
            b, 2 * t, d)

        full = jnp.concatenate(
            [jnp.broadcast_to(self.cls_token, (b, 1, d)).astype(
                self.dtype), fused], axis=1)
        return full + self.pos_embed.astype(self.dtype)

    def encoder_stack(self, full, train: bool = False):
        """Step 6: the homogeneous 4-layer post-LN encoder."""
        for i in range(self.num_layers):
            full = getattr(self, f"fusion{i}")(full, train=train)
        return full

    def head(self, full):
        """Step 7: LN + Linear on the CLS output."""
        return self.head_fc(self.head_ln(full[:, 0]))

    def __call__(self, image_sequence, numerical_sequence,
                 train: bool = False):
        """image_sequence (B,T,H,W,3); numerical_sequence (B,T,47)."""
        full = self.embed(image_sequence, numerical_sequence, train=train)
        full = self.encoder_stack(full, train=train)
        return self.head(full)


def fact_apply_pipelined(model: FactModel, variables, image_sequence,
                         numerical_sequence, mesh, *,
                         pipe_axis: str = "pipe",
                         num_microbatches: int | None = None,
                         batch_spec: P = P(),
                         train: bool = False, rngs=None,
                         manual_axes=None):
    """FACT forward with the encoder stack pipeline-parallel.

    ``embed`` and ``head`` run as ordinary (replicated / data-parallel)
    applies; the 4 identical ``fusionN`` layers run through
    ``parallel.pipeline.pipeline_apply`` — per-layer params stacked and
    sharded over ``pipe_axis``, microbatched activations hopping stages
    on ``lax.ppermute``. Logits match ``model.apply`` exactly in
    deterministic mode (same layers, same order, same dtypes); in train
    mode dropout masks are an independent draw (documented in
    pipeline_apply). CP (ring attention) composes with DP/TP, not with
    PP — the pipelined path uses plain attention.
    """
    from surya_tpu.parallel.pipeline import (
        pipeline_apply,
        stack_layer_params,
    )

    if model.moe_experts:
        raise NotImplementedError(
            "fact_apply_pipelined does not support MoE layers "
            "(PP x EP composition is out of scope): the pipelined "
            "stage layer is the dense PostLNEncoderLayer and the "
            "router aux-loss sow cannot cross the shard_map scan. "
            "Use the regular model.apply with an 'expert' mesh axis "
            "(parallel/moe.py) instead.")
    emb = model.apply(variables, image_sequence, numerical_sequence,
                      train=train, method="embed", rngs=rngs)
    names = [f"fusion{i}" for i in range(model.num_layers)]
    stacked = stack_layer_params(variables["params"], names)
    layer = PostLNEncoderLayer(num_heads=model.num_heads,
                               ff_dim=4 * model.embed_dim,
                               dropout=model.dropout, dtype=model.dtype)

    rng = (rngs or {}).get("dropout") if train else None
    if train and model.dropout > 0 and rng is None:
        # match model.apply's contract: training with dropout but no
        # rng must error, not silently run the encoder in eval mode
        raise ValueError(
            "fact_apply_pipelined(train=True) needs rngs={'dropout': key}")
    if rng is not None:
        def layer_fn(p, x, key):
            return layer.apply({"params": p}, x, train=True,
                               rngs={"dropout": key})
    else:
        def layer_fn(p, x):
            return layer.apply({"params": p}, x, train=False)

    full = pipeline_apply(layer_fn, stacked, emb, mesh,
                          pipe_axis=pipe_axis,
                          num_microbatches=num_microbatches,
                          batch_spec=batch_spec, rng=rng,
                          manual_axes=manual_axes)
    return model.apply(variables, full, method="head")
