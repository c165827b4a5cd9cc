"""Torch mirror of diffusers' UNet2DConditionModel (SD2/zero123plus
topology), with diffusers-exact state_dict key names.

Built from scratch (diffusers is absent in this image) to pin
`surya_tpu.models.diffusion.unet_cond.import_unet`: a state_dict from
this mirror must import and produce matching logits. Key-name parity
with upstream diffusers is what makes the importer real — keys follow
``conv_in / time_embedding.linear_{1,2} /
down_blocks.N.{resnets,attentions,downsamplers}.M... / mid_block... /
up_blocks... / conv_norm_out / conv_out`` exactly, including
``attn{1,2}.to_{q,k,v}``, ``to_out.0``, ``ff.net.0.proj``, ``ff.net.2``.
"""

from __future__ import annotations

import math

import torch
import torch.nn.functional as F
from torch import nn


def timestep_embedding(t: torch.Tensor, dim: int) -> torch.Tensor:
    """diffusers get_timestep_embedding, flip_sin_to_cos=True,
    downscale_freq_shift=0 (the SD family settings)."""
    half = dim // 2
    exponent = -math.log(10000.0) * torch.arange(
        half, dtype=torch.float32) / half
    ang = t.float()[:, None] * exponent.exp()[None]
    return torch.cat([ang.cos(), ang.sin()], dim=-1)


class ResnetBlock2D(nn.Module):
    def __init__(self, cin, cout, temb_dim, groups):
        super().__init__()
        self.norm1 = nn.GroupNorm(groups, cin, eps=1e-5)
        self.conv1 = nn.Conv2d(cin, cout, 3, padding=1)
        self.time_emb_proj = nn.Linear(temb_dim, cout)
        self.norm2 = nn.GroupNorm(groups, cout, eps=1e-5)
        self.conv2 = nn.Conv2d(cout, cout, 3, padding=1)
        self.conv_shortcut = (nn.Conv2d(cin, cout, 1)
                              if cin != cout else None)

    def forward(self, x, temb):
        h = self.conv1(F.silu(self.norm1(x)))
        h = h + self.time_emb_proj(F.silu(temb))[:, :, None, None]
        h = self.conv2(F.silu(self.norm2(h)))
        sc = x if self.conv_shortcut is None else self.conv_shortcut(x)
        return sc + h


class Attention(nn.Module):
    def __init__(self, qdim, ctx_dim, heads, dim_head):
        super().__init__()
        inner = heads * dim_head
        self.heads, self.dim_head = heads, dim_head
        self.to_q = nn.Linear(qdim, inner, bias=False)
        self.to_k = nn.Linear(ctx_dim, inner, bias=False)
        self.to_v = nn.Linear(ctx_dim, inner, bias=False)
        self.to_out = nn.ModuleList([nn.Linear(inner, qdim)])

    def forward(self, x, ctx=None):
        ctx = x if ctx is None else ctx
        b, t, _ = x.shape
        s = ctx.shape[1]
        h, d = self.heads, self.dim_head
        q = self.to_q(x).view(b, t, h, d).transpose(1, 2)
        k = self.to_k(ctx).view(b, s, h, d).transpose(1, 2)
        v = self.to_v(ctx).view(b, s, h, d).transpose(1, 2)
        attn = torch.softmax(q @ k.transpose(-1, -2) / math.sqrt(d), -1)
        out = (attn @ v).transpose(1, 2).reshape(b, t, h * d)
        return self.to_out[0](out)


class GEGLU(nn.Module):
    def __init__(self, dim, inner):
        super().__init__()
        self.proj = nn.Linear(dim, inner * 2)

    def forward(self, x):
        x, gate = self.proj(x).chunk(2, dim=-1)
        return x * F.gelu(gate)


class FeedForward(nn.Module):
    def __init__(self, dim, mult=4):
        super().__init__()
        inner = dim * mult
        self.net = nn.ModuleList([GEGLU(dim, inner), nn.Identity(),
                                  nn.Linear(inner, dim)])

    def forward(self, x):
        for m in self.net:
            x = m(x)
        return x


class BasicTransformerBlock(nn.Module):
    def __init__(self, dim, heads, dim_head, ctx_dim):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim)
        self.attn1 = Attention(dim, dim, heads, dim_head)
        self.norm2 = nn.LayerNorm(dim)
        self.attn2 = Attention(dim, ctx_dim, heads, dim_head)
        self.norm3 = nn.LayerNorm(dim)
        self.ff = FeedForward(dim)

    def forward(self, x, ctx):
        x = x + self.attn1(self.norm1(x))
        x = x + self.attn2(self.norm2(x), ctx)
        return x + self.ff(self.norm3(x))


class Transformer2DModel(nn.Module):
    def __init__(self, channels, heads, dim_head, ctx_dim, groups):
        super().__init__()
        inner = heads * dim_head
        self.norm = nn.GroupNorm(groups, channels, eps=1e-6)
        self.proj_in = nn.Linear(channels, inner)
        self.transformer_blocks = nn.ModuleList(
            [BasicTransformerBlock(inner, heads, dim_head, ctx_dim)])
        self.proj_out = nn.Linear(inner, channels)

    def forward(self, x, ctx):
        b, c, hh, ww = x.shape
        residual = x
        h = self.norm(x).permute(0, 2, 3, 1).reshape(b, hh * ww, c)
        h = self.proj_in(h)
        for blk in self.transformer_blocks:
            h = blk(h, ctx)
        h = self.proj_out(h)
        h = h.reshape(b, hh, ww, c).permute(0, 3, 1, 2)
        return h + residual


class Downsample2D(nn.Module):
    def __init__(self, c):
        super().__init__()
        self.conv = nn.Conv2d(c, c, 3, stride=2, padding=1)

    def forward(self, x):
        return self.conv(x)


class Upsample2D(nn.Module):
    def __init__(self, c):
        super().__init__()
        self.conv = nn.Conv2d(c, c, 3, padding=1)

    def forward(self, x):
        return self.conv(F.interpolate(x, scale_factor=2.0,
                                       mode="nearest"))


class DownBlock(nn.Module):
    def __init__(self, cin, cout, temb_dim, layers, groups, heads,
                 ctx_dim, has_attn, add_down):
        super().__init__()
        self.resnets = nn.ModuleList(
            [ResnetBlock2D(cin if j == 0 else cout, cout, temb_dim,
                           groups) for j in range(layers)])
        self.attentions = (nn.ModuleList(
            [Transformer2DModel(cout, heads, cout // heads, ctx_dim,
                                groups) for _ in range(layers)])
            if has_attn else None)
        self.downsamplers = (nn.ModuleList([Downsample2D(cout)])
                             if add_down else None)

    def forward(self, x, temb, ctx, skips):
        for j, res in enumerate(self.resnets):
            x = res(x, temb)
            if self.attentions is not None:
                x = self.attentions[j](x, ctx)
            skips.append(x)
        if self.downsamplers is not None:
            x = self.downsamplers[0](x)
            skips.append(x)
        return x


class MidBlock(nn.Module):
    def __init__(self, c, temb_dim, groups, heads, ctx_dim):
        super().__init__()
        self.resnets = nn.ModuleList(
            [ResnetBlock2D(c, c, temb_dim, groups),
             ResnetBlock2D(c, c, temb_dim, groups)])
        self.attentions = nn.ModuleList(
            [Transformer2DModel(c, heads, c // heads, ctx_dim, groups)])

    def forward(self, x, temb, ctx):
        x = self.resnets[0](x, temb)
        x = self.attentions[0](x, ctx)
        return self.resnets[1](x, temb)


class UpBlock(nn.Module):
    def __init__(self, prev_out, cout, cin_skip, temb_dim, layers,
                 groups, heads, ctx_dim, has_attn, add_up):
        super().__init__()
        resnets = []
        for j in range(layers + 1):
            skip_ch = cin_skip if j == layers else cout
            res_in = prev_out if j == 0 else cout
            resnets.append(ResnetBlock2D(res_in + skip_ch, cout,
                                         temb_dim, groups))
        self.resnets = nn.ModuleList(resnets)
        self.attentions = (nn.ModuleList(
            [Transformer2DModel(cout, heads, cout // heads, ctx_dim,
                                groups) for _ in range(layers + 1)])
            if has_attn else None)
        self.upsamplers = (nn.ModuleList([Upsample2D(cout)])
                           if add_up else None)

    def forward(self, x, temb, ctx, skips):
        for j, res in enumerate(self.resnets):
            x = torch.cat([x, skips.pop()], dim=1)
            x = res(x, temb)
            if self.attentions is not None:
                x = self.attentions[j](x, ctx)
        if self.upsamplers is not None:
            x = self.upsamplers[0](x)
        return x


class TimestepEmbedding(nn.Module):
    def __init__(self, cin, dim):
        super().__init__()
        self.linear_1 = nn.Linear(cin, dim)
        self.linear_2 = nn.Linear(dim, dim)

    def forward(self, x):
        return self.linear_2(F.silu(self.linear_1(x)))


class MirrorUNet2DCondition(nn.Module):
    """Mirrors surya_tpu...unet_cond.UNetConfig topology with diffusers
    state_dict names."""

    def __init__(self, in_channels=4, out_channels=4,
                 block_out_channels=(8, 16), layers_per_block=1,
                 num_heads=(2, 2), down_has_attn=(True, False),
                 cross_attention_dim=12, norm_num_groups=4):
        super().__init__()
        ch = block_out_channels
        tdim = ch[0] * 4
        self.ch0 = ch[0]
        self.conv_in = nn.Conv2d(in_channels, ch[0], 3, padding=1)
        self.time_embedding = TimestepEmbedding(ch[0], tdim)

        self.down_blocks = nn.ModuleList()
        for i, cout in enumerate(ch):
            cin = ch[i - 1] if i > 0 else ch[0]
            self.down_blocks.append(DownBlock(
                cin, cout, tdim, layers_per_block, norm_num_groups,
                num_heads[i], cross_attention_dim, down_has_attn[i],
                add_down=i < len(ch) - 1))

        self.mid_block = MidBlock(ch[-1], tdim, norm_num_groups,
                                  num_heads[-1], cross_attention_dim)

        rev = list(reversed(ch))
        rev_heads = list(reversed(num_heads))
        up_has_attn = list(reversed(down_has_attn))
        self.up_blocks = nn.ModuleList()
        for i, cout in enumerate(rev):
            prev_out = rev[0] if i == 0 else rev[i - 1]
            cin_skip = rev[min(i + 1, len(rev) - 1)]
            self.up_blocks.append(UpBlock(
                prev_out, cout, cin_skip, tdim, layers_per_block,
                norm_num_groups, rev_heads[i], cross_attention_dim,
                up_has_attn[i], add_up=i < len(ch) - 1))

        self.conv_norm_out = nn.GroupNorm(norm_num_groups, ch[0],
                                          eps=1e-5)
        self.conv_out = nn.Conv2d(ch[0], out_channels, 3, padding=1)

    def forward(self, sample, timesteps, encoder_hidden_states):
        if timesteps.ndim == 0:
            timesteps = timesteps.expand(sample.shape[0])
        temb = self.time_embedding(
            timestep_embedding(timesteps, self.ch0))
        x = self.conv_in(sample)
        skips = [x]
        for blk in self.down_blocks:
            x = blk(x, temb, encoder_hidden_states, skips)
        x = self.mid_block(x, temb, encoder_hidden_states)
        for blk in self.up_blocks:
            x = blk(x, temb, encoder_hidden_states, skips)
        return self.conv_out(F.silu(self.conv_norm_out(x)))
