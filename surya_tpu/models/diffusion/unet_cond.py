"""The real Zero123-Plus-class conditional diffusion UNet, TPU-native.

The reference's multiview stage runs ``sudo-ai/zero123plus-v1.1``
through diffusers (``Zero123/batch_aug.py:59-67``) — a Stable
Diffusion-2 UNet2DConditionModel conditioned two ways: *globally*
through cross-attention over CLIP-vision-derived tokens, and *locally*
by "reference attention" (the clean conditioning image's latents run
through the very same UNet once, and every self-attention layer's
post-norm hidden states are appended to that layer's K/V source when
denoising — the RefOnly mechanism zero123plus's custom pipeline
installs via attention processors).

This module is that architecture in Flax/NHWC, MXU-friendly (bf16
compute / f32 params, attention softmax in f32), with the reference
attention expressed *functionally*: a write pass returns the per-layer
hidden-state list, a read pass consumes it — no processor mutation, so
the whole two-pass denoiser jits as one XLA program.

Param naming mirrors diffusers' ``UNet2DConditionModel`` state_dict
1:1 (``down_blocks.0.attentions.1.transformer_blocks.0.attn1.to_q`` →
``down_blocks_0/attentions_1/transformer_blocks_0/attn1/to_q``), so
:func:`import_unet` is a mechanical walk. Parity with a
diffusers-named torch implementation is pinned by
``tests/test_unet_cond.py``; the pretrained zero123plus weights
themselves are egress-blocked in this environment — when a checkpoint
is available, ``import_unet(torch.load(...))`` is the only step.

Config: :func:`zero123plus_config` is the SD2-backbone shape
(320/640/1280/1280, 64-d heads, cross dim 1024, linear projections,
v-prediction schedule lives in euler_ancestral.py).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class UNetConfig:
    """Shape config (field names follow diffusers' where they exist)."""

    in_channels: int = 4
    out_channels: int = 4
    block_out_channels: tuple = (320, 640, 1280, 1280)
    layers_per_block: int = 1
    # number of attention heads per resolution level (diffusers calls
    # this attention_head_dim for SD2 — a historical misnomer; head
    # width = channels // heads = 64 for every SD2 level)
    num_heads: tuple = (5, 10, 20, 20)
    # which down levels carry cross-attention transformers (SD2: all
    # but the last); up levels are the mirror image
    down_has_attn: tuple = (True, True, True, False)
    cross_attention_dim: int = 1024
    use_linear_projection: bool = True
    norm_num_groups: int = 32
    dtype: Any = jnp.float32

    @property
    def up_has_attn(self) -> tuple:
        return tuple(reversed(self.down_has_attn))


def zero123plus_config(dtype=jnp.bfloat16) -> UNetConfig:
    """The SD2 backbone zero123plus v1.1 fine-tunes (4-ch latents,
    2 layers/block, 1024-d cross attention over CLIP-derived tokens)."""
    return UNetConfig(layers_per_block=2, dtype=dtype)


def tiny_config(dtype=jnp.float32) -> UNetConfig:
    """Test-sized instance of the same topology."""
    return UNetConfig(
        in_channels=4, out_channels=4, block_out_channels=(8, 16),
        layers_per_block=1, num_heads=(2, 2), down_has_attn=(True, False),
        cross_attention_dim=12, norm_num_groups=4, dtype=dtype)


def get_timestep_embedding(timesteps, dim: int,
                           max_period: float = 10000.0):
    """diffusers ``get_timestep_embedding`` with SD's settings
    (``flip_sin_to_cos=True, downscale_freq_shift=0``): (B,) → (B, dim),
    ``[cos | sin]`` halves."""
    half = dim // 2
    exponent = -np.log(max_period) * jnp.arange(
        half, dtype=jnp.float32) / half
    ang = timesteps.astype(jnp.float32)[:, None] * jnp.exp(exponent)[None]
    return jnp.concatenate([jnp.cos(ang), jnp.sin(ang)], axis=-1)


# SD2/zero123plus use one BasicTransformerBlock per Transformer2DModel
# (diffusers transformer_layers_per_block=1); the ref-bank accounting in
# UNet2DCondition.attn_block assumes this matches Transformer2DModel's
# num_layers default.
_LAYERS_PER_TRANSFORMER = 1


class ResnetBlock2D(nn.Module):
    """diffusers ResnetBlock2D: GN→SiLU→conv ×2 with a time-embedding
    shift between, 1×1 shortcut on channel change."""

    out_channels: int
    groups: int = 32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, temb):
        conv = lambda n, k, name: nn.Conv(  # noqa: E731
            n, (k, k), padding=[(k // 2,) * 2] * 2, dtype=self.dtype,
            param_dtype=jnp.float32, name=name)
        h = nn.GroupNorm(self.groups, epsilon=1e-5, dtype=self.dtype,
                         param_dtype=jnp.float32, name="norm1")(x)
        h = nn.swish(h)
        h = conv(self.out_channels, 3, "conv1")(h)
        t = nn.Dense(self.out_channels, dtype=self.dtype,
                     param_dtype=jnp.float32,
                     name="time_emb_proj")(nn.swish(temb))
        h = h + t[:, None, None, :]
        h = nn.GroupNorm(self.groups, epsilon=1e-5, dtype=self.dtype,
                         param_dtype=jnp.float32, name="norm2")(h)
        h = nn.swish(h)
        h = conv(self.out_channels, 3, "conv2")(h)
        if x.shape[-1] != self.out_channels:
            x = conv(self.out_channels, 1, "conv_shortcut")(x)
        return x + h


class Attention(nn.Module):
    """diffusers Attention: no-bias q/k/v, biased output projection,
    f32 softmax. ``context=None`` → self-attention."""

    query_dim: int
    heads: int
    dim_head: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, context=None):
        inner = self.heads * self.dim_head
        dense = lambda n, name, bias: nn.Dense(  # noqa: E731
            n, use_bias=bias, dtype=self.dtype, param_dtype=jnp.float32,
            name=name)
        ctx = x if context is None else context
        q = dense(inner, "to_q", False)(x)
        k = dense(inner, "to_k", False)(ctx)
        v = dense(inner, "to_v", False)(ctx)
        b, t, _ = q.shape
        s = k.shape[1]
        q = q.reshape(b, t, self.heads, self.dim_head)
        k = k.reshape(b, s, self.heads, self.dim_head)
        v = v.reshape(b, s, self.heads, self.dim_head)
        logits = jnp.einsum("bthd,bshd->bhts", q, k,
                            preferred_element_type=jnp.float32)
        logits = logits * (1.0 / np.sqrt(self.dim_head))
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        out = jnp.einsum("bhts,bshd->bthd", probs.astype(v.dtype), v)
        out = out.reshape(b, t, inner)
        return dense(self.query_dim, "to_out_0", True)(out)


class FeedForward(nn.Module):
    """diffusers FeedForward with GEGLU (``ff.net.0.proj`` /
    ``ff.net.2``); exact (erf) GELU like torch's default."""

    dim: int
    mult: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        inner = self.dim * self.mult
        h = nn.Dense(inner * 2, dtype=self.dtype, param_dtype=jnp.float32,
                     name="net_0_proj")(x)
        h, gate = jnp.split(h, 2, axis=-1)
        h = h * nn.gelu(gate.astype(jnp.float32),
                        approximate=False).astype(h.dtype)
        return nn.Dense(self.dim, dtype=self.dtype,
                        param_dtype=jnp.float32, name="net_2")(h)


class BasicTransformerBlock(nn.Module):
    """self-attn → cross-attn → GEGLU FF, pre-LayerNorm residuals.

    Reference attention: the post-norm1 hidden states are what the
    zero123plus RefOnly processors bank/append, so this block returns
    them (write side) and accepts ``ref`` to append to the
    self-attention K/V source (read side).
    """

    dim: int
    heads: int
    dim_head: int
    cross_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, context, ref=None):
        ln = lambda name: nn.LayerNorm(  # noqa: E731
            epsilon=1e-5, dtype=self.dtype, param_dtype=jnp.float32,
            name=name)
        h = ln("norm1")(x)
        banked = h
        kv = h if ref is None else jnp.concatenate(
            [h, ref.astype(h.dtype)], axis=1)
        x = x + Attention(self.dim, self.heads, self.dim_head,
                          dtype=self.dtype, name="attn1")(h, kv)
        h = ln("norm2")(x)
        x = x + Attention(self.dim, self.heads, self.dim_head,
                          dtype=self.dtype, name="attn2")(h, context)
        h = ln("norm3")(x)
        x = x + FeedForward(self.dim, dtype=self.dtype, name="ff")(h)
        return x, banked


class Transformer2DModel(nn.Module):
    """GroupNorm → (linear|1×1-conv) proj in → N transformer blocks →
    proj out, spatial residual."""

    heads: int
    dim_head: int
    cross_dim: int
    groups: int = 32
    use_linear_projection: bool = True
    num_layers: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, context, refs=None):
        b, hgt, wid, c = x.shape
        inner = self.heads * self.dim_head
        residual = x
        h = nn.GroupNorm(self.groups, epsilon=1e-6, dtype=self.dtype,
                         param_dtype=jnp.float32, name="norm")(x)
        if self.use_linear_projection:
            h = h.reshape(b, hgt * wid, c)
            h = nn.Dense(inner, dtype=self.dtype, param_dtype=jnp.float32,
                         name="proj_in")(h)
        else:
            h = nn.Conv(inner, (1, 1), dtype=self.dtype,
                        param_dtype=jnp.float32, name="proj_in")(h)
            h = h.reshape(b, hgt * wid, inner)
        banked = []
        for i in range(self.num_layers):
            h, bank = BasicTransformerBlock(
                inner, self.heads, self.dim_head, self.cross_dim,
                dtype=self.dtype, name=f"transformer_blocks_{i}")(
                    h, context, None if refs is None else refs[i])
            banked.append(bank)
        if self.use_linear_projection:
            h = nn.Dense(c, dtype=self.dtype, param_dtype=jnp.float32,
                         name="proj_out")(h)
            h = h.reshape(b, hgt, wid, c)
        else:
            h = h.reshape(b, hgt, wid, inner)
            h = nn.Conv(c, (1, 1), dtype=self.dtype,
                        param_dtype=jnp.float32, name="proj_out")(h)
        return h + residual, banked


class UNet2DCondition(nn.Module):
    """The full conditional UNet. ``refs=None`` is a plain forward that
    also *returns* the self-attention hidden-state bank (write pass);
    pass that bank back as ``refs`` to denoise with reference attention
    (read pass). Banks are position-matched lists, one entry per
    transformer block in traversal order.

    Call: ``(sample (B,H,W,Cin), timesteps (B,) or scalar,
    encoder_hidden_states (B,S,cross_dim)) → (eps/v (B,H,W,Cout),
    bank list)``.
    """

    config: UNetConfig

    @nn.compact
    def __call__(self, sample, timesteps, encoder_hidden_states,
                 refs: Optional[Sequence[jax.Array]] = None):
        cfg = self.config
        dt = cfg.dtype
        conv = lambda n, k, s, name: nn.Conv(  # noqa: E731
            n, (k, k), strides=(s, s), padding=[(k // 2,) * 2] * 2,
            dtype=dt, param_dtype=jnp.float32, name=name)
        if timesteps.ndim == 0:
            timesteps = jnp.broadcast_to(timesteps, (sample.shape[0],))
        context = encoder_hidden_states.astype(dt)

        # time embedding: sinusoidal(ch0) → MLP(4*ch0)
        temb = get_timestep_embedding(timesteps, cfg.block_out_channels[0])
        tdim = cfg.block_out_channels[0] * 4
        temb = nn.Dense(tdim, dtype=dt, param_dtype=jnp.float32,
                        name="time_embedding_linear_1")(temb.astype(dt))
        temb = nn.Dense(tdim, dtype=dt, param_dtype=jnp.float32,
                        name="time_embedding_linear_2")(nn.swish(temb))

        bank_out: list = []
        ref_iter = iter(refs) if refs is not None else None

        def attn_block(x, level_heads, ch, name):
            block_refs = None
            if ref_iter is not None:
                block_refs = [next(ref_iter)
                              for _ in range(_LAYERS_PER_TRANSFORMER)]
            y, banked = Transformer2DModel(
                heads=level_heads, dim_head=ch // level_heads,
                cross_dim=cfg.cross_attention_dim,
                groups=cfg.norm_num_groups,
                use_linear_projection=cfg.use_linear_projection,
                dtype=dt, name=name)(x, context, block_refs)
            bank_out.extend(banked)
            return y

        x = conv(cfg.block_out_channels[0], 3, 1, "conv_in")(
            sample.astype(dt))
        skips = [x]
        n_levels = len(cfg.block_out_channels)

        # down path
        for i, ch in enumerate(cfg.block_out_channels):
            for j in range(cfg.layers_per_block):
                x = ResnetBlock2D(ch, cfg.norm_num_groups, dtype=dt,
                                  name=f"down_blocks_{i}_resnets_{j}")(
                                      x, temb)
                if cfg.down_has_attn[i]:
                    x = attn_block(x, cfg.num_heads[i], ch,
                                   f"down_blocks_{i}_attentions_{j}")
                skips.append(x)
            if i < n_levels - 1:
                x = conv(ch, 3, 2,
                         f"down_blocks_{i}_downsamplers_0_conv")(x)
                skips.append(x)

        # mid
        mid_ch = cfg.block_out_channels[-1]
        x = ResnetBlock2D(mid_ch, cfg.norm_num_groups, dtype=dt,
                          name="mid_block_resnets_0")(x, temb)
        x = attn_block(x, cfg.num_heads[-1], mid_ch,
                       "mid_block_attentions_0")
        x = ResnetBlock2D(mid_ch, cfg.norm_num_groups, dtype=dt,
                          name="mid_block_resnets_1")(x, temb)

        # up path
        rev_ch = tuple(reversed(cfg.block_out_channels))
        for i, ch in enumerate(rev_ch):
            for j in range(cfg.layers_per_block + 1):
                skip = skips.pop()
                x = jnp.concatenate([x, skip], axis=-1)
                x = ResnetBlock2D(ch, cfg.norm_num_groups, dtype=dt,
                                  name=f"up_blocks_{i}_resnets_{j}")(
                                      x, temb)
                if cfg.up_has_attn[i]:
                    x = attn_block(
                        x, tuple(reversed(cfg.num_heads))[i], ch,
                        f"up_blocks_{i}_attentions_{j}")
            if i < n_levels - 1:
                b, hh, ww, cc = x.shape
                x = jax.image.resize(x, (b, hh * 2, ww * 2, cc),
                                     "nearest")
                x = conv(ch, 3, 1, f"up_blocks_{i}_upsamplers_0_conv")(x)

        x = nn.GroupNorm(cfg.norm_num_groups, epsilon=1e-5, dtype=dt,
                         param_dtype=jnp.float32, name="conv_norm_out")(x)
        x = nn.swish(x)
        x = conv(cfg.out_channels, 3, 1, "conv_out")(x)
        return x.astype(jnp.float32), bank_out


def reference_conditioned_denoiser(model: UNet2DCondition, params,
                                   schedule, encoder_hidden_states,
                                   cond_latents, key):
    """Build the zero123plus two-pass denoiser as ONE jittable fn.

    Per zero123plus's ``RefOnlyNoisedUNet``: at each step the clean
    conditioning latents are forward-noised to the step's sigma
    (``scheduler.add_noise``) and input-scaled, then run through the
    UNet (write pass) to collect every self-attention's post-norm
    hidden states; the working latents are denoised with those banks
    appended to each self-attention's K/V (read pass). Fresh cond noise
    per step (the reference uses ``randn_like`` per call) comes from
    ``fold_in(key, step)`` so the whole trajectory stays one jittable
    program. Returns ``denoiser(scaled_latents, t) → model_output``
    matching :func:`euler_ancestral.sample`'s contract; ``schedule`` is
    the :class:`EulerAncestralSchedule` driving the sampler (the step
    index is recovered from ``t`` against its static timestep table).
    """
    timesteps = jnp.asarray(schedule.timesteps)
    sigmas = jnp.asarray(schedule.sigmas)

    def denoiser(scaled, t):
        i = jnp.argmin(jnp.abs(timesteps - t))
        sigma = sigmas[i]
        noise = jax.random.normal(jax.random.fold_in(key, i),
                                  cond_latents.shape, jnp.float32)
        noisy_cond = (cond_latents + sigma * noise) \
            / jnp.sqrt(sigma ** 2 + 1.0)
        ts = jnp.broadcast_to(t, (scaled.shape[0],))
        _, bank = model.apply({"params": params}, noisy_cond, ts,
                              encoder_hidden_states)
        out, _ = model.apply({"params": params}, scaled, ts,
                             encoder_hidden_states, refs=bank)
        return out

    return denoiser


# ---------------------------------------------------------------------------
# diffusers state_dict import
# ---------------------------------------------------------------------------

# parent segments whose integer-indexed children become name_N modules
_LIST_PARENTS = {"down_blocks", "up_blocks", "resnets", "attentions",
                 "downsamplers", "upsamplers", "transformer_blocks"}


def _flax_path(torch_key: str) -> tuple:
    """``down_blocks.0.attentions.1.transformer_blocks.0.attn1.to_q.weight``
    → path tuple matching this module's (flattened) naming."""
    parts = torch_key.split(".")
    out: list[str] = []
    i = 0
    while i < len(parts):
        p = parts[i]
        if p in _LIST_PARENTS and i + 1 < len(parts) and \
                parts[i + 1].isdigit():
            out.append(f"{p}_{parts[i + 1]}")
            i += 2
        elif p == "to_out":          # to_out.0 → to_out_0
            out.append("to_out_0")
            i += 2
        elif p == "net":             # ff.net.0.proj → net_0_proj ; net.2
            if parts[i + 1] == "0":
                out.append("net_0_proj")
                i += 3
            else:
                out.append(f"net_{parts[i + 1]}")
                i += 2
        elif p == "time_embedding":  # time_embedding.linear_1 (top level)
            out.append(f"time_embedding_{parts[i + 1]}")
            i += 2
        else:
            out.append(p)
            i += 1
    return tuple(out)


def import_unet(state_dict) -> dict:
    """diffusers ``UNet2DConditionModel.state_dict()`` (torch tensors or
    numpy arrays) → ``{"params": ...}`` for :class:`UNet2DCondition`.

    Layout conversions: conv OIHW→HWIO, linear (out,in)→(in,out),
    norm weight→scale. The down/up block containers are flattened into
    the top level (this module names submodules
    ``down_blocks_0_resnets_0`` etc.), which the path join handles.
    """
    params: dict = {}

    def put(path, leaf_name, value):
        node = params
        # flatten block-level nesting: our module names join the first
        # two diffusers levels with underscores for blocks
        for seg in path:
            node = node.setdefault(seg, {})
        node[leaf_name] = value

    for key, tensor in state_dict.items():
        arr = np.asarray(getattr(tensor, "detach", lambda: tensor)()
                         .cpu().numpy()
                         if hasattr(tensor, "detach") else tensor)
        path = _flax_path(key)
        *mods, leaf = path
        # our UNet flattens 'down_blocks_0.resnets_0' into one module
        # name 'down_blocks_0_resnets_0'; ditto downsamplers' conv and
        # mid_block/up_blocks children — join consecutive structural
        # segments. The flax tree has exactly two levels of module
        # nesting inside attentions (transformer blocks + attn/ff), so
        # join only the block-path prefix.
        joined = _join_block_prefix(mods)
        put(joined, _leaf_name(leaf, arr), _convert(leaf, arr))
    return {"params": params}


def _join_block_prefix(mods: list) -> list:
    """['down_blocks_0','resnets_0','conv1'] → ['down_blocks_0_resnets_0',
    'conv1']; attention interiors keep their own nesting."""
    if not mods:
        return mods
    first = mods[0]
    if first.startswith(("down_blocks", "up_blocks", "mid_block")):
        # join until (and including) the resnets_N/attentions_N/
        # downsamplers_N segment
        j = [first]
        rest = mods[1:]
        if rest and (rest[0].startswith(("resnets_", "attentions_",
                                         "downsamplers_",
                                         "upsamplers_"))):
            j[0] = f"{first}_{rest[0]}"
            rest = rest[1:]
            if j[0].endswith(("downsamplers_0", "upsamplers_0")) and \
                    rest and rest[0] == "conv":
                j[0] = f"{j[0]}_conv"
                rest = rest[1:]
        return j + rest
    return mods


def _leaf_name(torch_leaf: str, arr: np.ndarray) -> str:
    if torch_leaf == "weight":
        return "scale" if arr.ndim == 1 else "kernel"
    return torch_leaf


def _convert(torch_leaf: str, arr: np.ndarray) -> jnp.ndarray:
    if torch_leaf == "weight":
        if arr.ndim == 4:            # conv OIHW → HWIO
            arr = arr.transpose(2, 3, 1, 0)
        elif arr.ndim == 2:          # linear (out,in) → (in,out)
            arr = arr.T
    return jnp.asarray(arr)
