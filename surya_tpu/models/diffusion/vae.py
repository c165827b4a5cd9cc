"""AutoencoderKL — the SD-family VAE zero123plus runs its latents
through — TPU-native in Flax/NHWC.

Completes the latent diffusion stack around
:mod:`surya_tpu.models.diffusion.unet_cond`: the reference's multiview
stage (``Zero123/batch_aug.py:59-67``) operates pixel→latent→pixel
via diffusers' AutoencoderKL; this is that architecture with
diffusers-exact param naming (``encoder.down_blocks.0.resnets.0...``,
``quant_conv`` …) so :func:`import_vae` converts a pretrained
state_dict mechanically. Parity vs a from-scratch diffusers-named
torch mirror is pinned by ``tests/test_vae.py``.

Structure notes (diffusers semantics):
- encoder downsample convs use the VAE's asymmetric (0,1,0,1) pad +
  VALID stride-2 conv (unlike the UNet's SAME-padded downsample);
- the mid-block attention is a single-head full-width spatial
  attention with a pre-GroupNorm and residual;
- all GroupNorms are eps=1e-6 (the VAE config), SiLU activations;
- ``encode`` returns the diagonal-Gaussian moments; ``sample_latents``
  reparameterizes; the SD scaling factor (0.18215) is the *pipeline's*
  multiplier, exposed as a constant here.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from surya_tpu.models.diffusion.unet_cond import (
    _convert,
    _flax_path,
    _join_block_prefix,
    _leaf_name,
)

SD_SCALING_FACTOR = 0.18215


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    in_channels: int = 3
    out_channels: int = 3
    latent_channels: int = 4
    block_out_channels: tuple = (128, 256, 512, 512)
    layers_per_block: int = 2
    norm_num_groups: int = 32
    dtype: Any = jnp.float32


def sd_vae_config(dtype=jnp.bfloat16) -> VAEConfig:
    return VAEConfig(dtype=dtype)


def tiny_vae_config(dtype=jnp.float32) -> VAEConfig:
    return VAEConfig(block_out_channels=(8, 16), layers_per_block=1,
                     norm_num_groups=4)


def _conv(n, k, name, dtype, stride=1, pad=None):
    if pad is None:
        pad = [(k // 2,) * 2] * 2
    return nn.Conv(n, (k, k), strides=(stride, stride), padding=pad,
                   dtype=dtype, param_dtype=jnp.float32, name=name)


class VAEResnetBlock(nn.Module):
    """UNet ResnetBlock2D minus the time-embedding shift."""

    out_channels: int
    groups: int
    dtype: Any

    @nn.compact
    def __call__(self, x):
        h = nn.GroupNorm(self.groups, epsilon=1e-6, dtype=self.dtype,
                         param_dtype=jnp.float32, name="norm1")(x)
        h = _conv(self.out_channels, 3, "conv1", self.dtype)(nn.swish(h))
        h = nn.GroupNorm(self.groups, epsilon=1e-6, dtype=self.dtype,
                         param_dtype=jnp.float32, name="norm2")(h)
        h = _conv(self.out_channels, 3, "conv2", self.dtype)(nn.swish(h))
        if x.shape[-1] != self.out_channels:
            x = _conv(self.out_channels, 1, "conv_shortcut", self.dtype)(x)
        return x + h


class VAEAttention(nn.Module):
    """Single-head full-width spatial attention (diffusers' VAE
    mid-block Attention): pre-GroupNorm, biased q/k/v/out linears,
    residual."""

    groups: int
    dtype: Any

    @nn.compact
    def __call__(self, x):
        b, hh, ww, c = x.shape
        h = nn.GroupNorm(self.groups, epsilon=1e-6, dtype=self.dtype,
                         param_dtype=jnp.float32, name="group_norm")(x)
        h = h.reshape(b, hh * ww, c)
        dense = lambda name: nn.Dense(  # noqa: E731
            c, dtype=self.dtype, param_dtype=jnp.float32, name=name)
        q, k, v = dense("to_q")(h), dense("to_k")(h), dense("to_v")(h)
        logits = jnp.einsum("btc,bsc->bts", q, k,
                            preferred_element_type=jnp.float32)
        probs = jax.nn.softmax(
            logits.astype(jnp.float32) / np.sqrt(c), axis=-1)
        out = jnp.einsum("bts,bsc->btc", probs.astype(v.dtype), v)
        out = dense("to_out_0")(out).reshape(b, hh, ww, c)
        return x + out


class _Coder(nn.Module):
    """Shared down/up tower body (module names follow diffusers)."""

    config: VAEConfig
    is_encoder: bool

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        dt = cfg.dtype
        g = cfg.norm_num_groups
        x = x.astype(dt)

        if self.is_encoder:
            x = _conv(cfg.block_out_channels[0], 3, "conv_in", dt)(x)
            n = len(cfg.block_out_channels)
            for i, ch in enumerate(cfg.block_out_channels):
                for j in range(cfg.layers_per_block):
                    x = VAEResnetBlock(
                        ch, g, dt,
                        name=f"down_blocks_{i}_resnets_{j}")(x)
                if i < n - 1:
                    # diffusers VAE Downsample2D: pad (0,1,0,1), VALID
                    x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
                    x = _conv(ch, 3, f"down_blocks_{i}_downsamplers_0_conv",
                              dt, stride=2, pad=[(0, 0), (0, 0)])(x)
            mid_ch = cfg.block_out_channels[-1]
            x = VAEResnetBlock(mid_ch, g, dt, name="mid_block_resnets_0")(x)
            x = VAEAttention(g, dt, name="mid_block_attentions_0")(x)
            x = VAEResnetBlock(mid_ch, g, dt, name="mid_block_resnets_1")(x)
            out_ch = 2 * cfg.latent_channels
        else:
            mid_ch = cfg.block_out_channels[-1]
            x = _conv(mid_ch, 3, "conv_in", dt)(x)
            x = VAEResnetBlock(mid_ch, g, dt, name="mid_block_resnets_0")(x)
            x = VAEAttention(g, dt, name="mid_block_attentions_0")(x)
            x = VAEResnetBlock(mid_ch, g, dt, name="mid_block_resnets_1")(x)
            rev = tuple(reversed(cfg.block_out_channels))
            n = len(rev)
            for i, ch in enumerate(rev):
                for j in range(cfg.layers_per_block + 1):
                    x = VAEResnetBlock(
                        ch, g, dt, name=f"up_blocks_{i}_resnets_{j}")(x)
                if i < n - 1:
                    b, hh, ww, cc = x.shape
                    x = jax.image.resize(x, (b, hh * 2, ww * 2, cc),
                                         "nearest")
                    x = _conv(ch, 3, f"up_blocks_{i}_upsamplers_0_conv",
                              dt)(x)
            out_ch = cfg.out_channels
        x = nn.GroupNorm(g, epsilon=1e-6, dtype=dt,
                         param_dtype=jnp.float32, name="conv_norm_out")(x)
        x = _conv(out_ch, 3, "conv_out", dt)(nn.swish(x))
        return x.astype(jnp.float32)


class AutoencoderKL(nn.Module):
    """``encode`` → (mean, logvar); ``decode`` ← latents. Call runs a
    full reconstruction round-trip (used by tests/fine-tuning)."""

    config: VAEConfig

    def setup(self):
        # attribute names become module names (diffusers-matching)
        self.encoder = _Coder(self.config, True)
        self.decoder = _Coder(self.config, False)
        lc = self.config.latent_channels
        self.quant_conv = nn.Conv(
            2 * lc, (1, 1), dtype=self.config.dtype,
            param_dtype=jnp.float32)
        self.post_quant_conv = nn.Conv(
            lc, (1, 1), dtype=self.config.dtype, param_dtype=jnp.float32)

    def encode(self, x):
        moments = self.quant_conv(self.encoder(x))
        mean, logvar = jnp.split(moments, 2, axis=-1)
        return mean.astype(jnp.float32), jnp.clip(
            logvar.astype(jnp.float32), -30.0, 20.0)

    def decode(self, z):
        return self.decoder(self.post_quant_conv(
            z.astype(self.config.dtype)))

    def __call__(self, x, key=None):
        mean, logvar = self.encode(x)
        z = mean if key is None else sample_latents(mean, logvar, key)
        return self.decode(z), (mean, logvar)


def sample_latents(mean, logvar, key):
    """Diagonal-Gaussian reparameterization (diffusers
    DiagonalGaussianDistribution.sample)."""
    return mean + jnp.exp(0.5 * logvar) * jax.random.normal(
        key, mean.shape, jnp.float32)


def import_vae(state_dict) -> dict:
    """diffusers ``AutoencoderKL.state_dict()`` → ``{"params": ...}``.

    Reuses the UNet importer's mechanical conversions; the only extra
    structure is the encoder/decoder nesting level.
    """
    params: dict = {}
    for key, tensor in state_dict.items():
        arr = np.asarray(getattr(tensor, "detach", lambda: tensor)()
                         .cpu().numpy()
                         if hasattr(tensor, "detach") else tensor)
        segs = list(_flax_path(key))
        *mods, leaf = segs
        if mods and mods[0] in ("encoder", "decoder"):
            mods = [mods[0]] + _join_block_prefix(mods[1:])
        node = params
        for seg in mods:
            node = node.setdefault(seg, {})
        node[_leaf_name(leaf, arr)] = _convert(leaf, arr)
    return {"params": params}
