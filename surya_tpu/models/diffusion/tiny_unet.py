"""Small pixel-space conditional denoiser for the diffusion scaffold.

Stands in for the zero123plus UNet (whose pretrained weights are
egress-blocked here) so the full TPU sampling path —
``EulerAncestralSchedule`` + ``sample``'s fused ``lax.scan`` +
``augmentgen.multiview`` grid slicing — is executable and testable end
to end. It is a real trainable denoiser (sinusoidal timestep
embedding, conditioning-image concat, strided conv down / resize up),
just a toy-sized one; swap ``denoiser`` in
``multiview.jax_diffusion_generate_fn`` for a full UNet when weights
exist.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp


def timestep_embedding(t, dim: int, max_period: float = 10000.0):
    """Sinusoidal embedding of a scalar (train-timestep) → (dim,)."""
    half = dim // 2
    freqs = jnp.exp(-jnp.log(max_period)
                    * jnp.arange(half, dtype=jnp.float32) / half)
    ang = t.astype(jnp.float32) * freqs
    return jnp.concatenate([jnp.cos(ang), jnp.sin(ang)])


class TinyDenoiser(nn.Module):
    """(B,H,W,3) noisy + (B,H,W,3) conditioning → (B,H,W,3) output."""

    features: int = 32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, t, cond):
        f = self.features
        temb = timestep_embedding(t, f * 2)
        temb = nn.Dense(f, name="temb_dense")(temb)

        h = jnp.concatenate([x, cond], -1).astype(self.dtype)
        h = nn.Conv(f, (3, 3), padding="SAME", name="in_conv")(h)
        h = h + temb[None, None, None, :]
        h = nn.swish(nn.GroupNorm(8, name="gn0")(h))
        skip = h
        h = nn.Conv(f * 2, (3, 3), strides=(2, 2), padding="SAME",
                    name="down")(h)
        h = nn.swish(nn.GroupNorm(8, name="gn1")(h))
        h = nn.Conv(f * 2, (3, 3), padding="SAME", name="mid")(h)
        h = nn.swish(nn.GroupNorm(8, name="gn2")(h))
        # resize to the skip's exact dims (not 2×): SAME-padded stride-2
        # gives ceil(h/2), so doubling would mismatch odd inputs
        b, _, _, c = h.shape
        h = jax.image.resize(
            h, (b, skip.shape[1], skip.shape[2], c), "nearest")
        h = nn.Conv(f, (3, 3), padding="SAME", name="up")(h)
        h = nn.swish(nn.GroupNorm(8, name="gn3")(h))
        h = jnp.concatenate([h, skip], -1)
        out = nn.Conv(3, (3, 3), padding="SAME",
                      kernel_init=nn.initializers.zeros,
                      name="out_conv")(h)
        return out.astype(jnp.float32)
