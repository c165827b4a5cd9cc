"""U²-Net salient-object segmentation in Flax, TPU-first (NHWC).

The reference's background-removal stage calls ``rembg.remove()``
(``Background_remove/batch_remove_background.py:114``), which runs the
U²-Net model (Qin et al. 2020, the ``u2net``/``u2netp`` onnx files)
through onnxruntime on the host CPU. This module makes that model a
first-class TPU component instead of an opaque host dependency:

- full ``u2net`` (~44M params) and small ``u2netp`` (~1.1M, rembg's
  lightweight variant) configs behind one module;
- NHWC, bf16-capable compute with f32 params/BN stats (repo
  convention); XLA fuses the conv+BN+ReLU chains, resizes are
  ``jax.image.resize`` (half-pixel bilinear == torch
  ``align_corners=False``);
- ceil-mode 2×2 max pooling matches torch ``MaxPool2d(2, 2,
  ceil_mode=True)`` exactly (pad odd edges with -inf);
- ``import_u2net`` converts a canonical torch ``state_dict``
  (``stage1.rebnconvin.conv_s1.weight`` naming, as published by
  xuebinqin/U-2-Net and used to build rembg's onnx) into this tree —
  logit parity is pinned by ``tests/test_u2net.py`` against a
  torch U²-NetP built with that naming;
- ``remove_background`` reproduces rembg's basic matting semantics
  (resize→normalize→forward→min-max→alpha), so
  ``augmentgen.background.process_pipeline`` can run end-to-end on
  TPU with no host inference dependency;
- ``u2net_loss`` is the paper's deep-supervision BCE sum over the
  fused + 6 side outputs, enabling in-framework fine-tuning.

No pretrained weights ship in this environment (no network egress);
load converted weights via ``import_u2net`` when a ``.pth`` is
available, or fine-tune from random init.
"""

from __future__ import annotations

from functools import partial
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

# Per-stage specs: (kind, height L or None, mid, out). Encoder stages
# 1-6 then decoder stages 5d-1d; decoder input = concat(skip, up) so
# in-channels are implicit. Side convs read the decoder outputs (+
# stage6) in d1..d6 order.
_CONFIGS = {
    "u2net": {
        "enc": [("rsu", 7, 32, 64), ("rsu", 6, 32, 128),
                ("rsu", 5, 64, 256), ("rsu", 4, 128, 512),
                ("rsu4f", None, 256, 512), ("rsu4f", None, 256, 512)],
        "dec": [("rsu4f", None, 256, 512), ("rsu", 4, 128, 256),
                ("rsu", 5, 64, 128), ("rsu", 6, 32, 64),
                ("rsu", 7, 16, 64)],
    },
    "u2netp": {
        "enc": [("rsu", 7, 16, 64), ("rsu", 6, 16, 64),
                ("rsu", 5, 16, 64), ("rsu", 4, 16, 64),
                ("rsu4f", None, 16, 64), ("rsu4f", None, 16, 64)],
        "dec": [("rsu4f", None, 16, 64), ("rsu", 4, 16, 64),
                ("rsu", 5, 16, 64), ("rsu", 6, 16, 64),
                ("rsu", 7, 16, 64)],
    },
}


def _maxpool_ceil(x: jnp.ndarray) -> jnp.ndarray:
    """2×2/2 max pool with torch ceil_mode=True semantics."""
    _, h, w, _ = x.shape
    ph, pw = h % 2, w % 2
    if ph or pw:
        x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)),
                    constant_values=-jnp.inf)
    return nn.max_pool(x, (2, 2), strides=(2, 2))


def _upsample_like(x: jnp.ndarray, ref: jnp.ndarray) -> jnp.ndarray:
    """Bilinear resize of x to ref's spatial dims (torch
    ``_upsample_like``: F.interpolate align_corners=False — same
    half-pixel convention as jax.image.resize)."""
    b, _, _, c = x.shape
    return jax.image.resize(x, (b, ref.shape[1], ref.shape[2], c),
                            method="bilinear")


class REBNCONV(nn.Module):
    """Conv3×3(dilated) + BN + ReLU (torch ``REBNCONV``: conv_s1/bn_s1)."""

    features: int
    dilation: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = self.dilation
        x = nn.Conv(self.features, (3, 3), padding=((d, d), (d, d)),
                    kernel_dilation=(d, d), dtype=self.dtype,
                    param_dtype=jnp.float32, name="conv_s1")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype,
                         param_dtype=jnp.float32, name="bn_s1")(x)
        return nn.relu(x)


class RSU(nn.Module):
    """Residual U-block of height L: L-2 internal ceil-mode pools down,
    bilinear ups back, dilation-2 bridge at the bottom."""

    height: int  # L in RSU-L
    mid: int
    out: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        reb = partial(REBNCONV, dtype=self.dtype)
        hxin = reb(self.out, name="rebnconvin")(x, train)

        enc = [reb(self.mid, name="rebnconv1")(hxin, train)]
        hx = enc[0]
        for i in range(2, self.height):
            hx = _maxpool_ceil(hx)
            hx = reb(self.mid, name=f"rebnconv{i}")(hx, train)
            enc.append(hx)
        # dilated bridge, no pooling (torch rebnconv{L}, dirate=2)
        hx = reb(self.mid, dilation=2,
                 name=f"rebnconv{self.height}")(enc[-1], train)

        for i in range(self.height - 1, 1, -1):
            hx = reb(self.mid, name=f"rebnconv{i}d")(
                jnp.concatenate([hx, enc[i - 1]], -1), train)
            hx = _upsample_like(hx, enc[i - 2])
        hx1d = reb(self.out, name="rebnconv1d")(
            jnp.concatenate([hx, enc[0]], -1), train)
        return hxin + hx1d


class RSU4F(nn.Module):
    """Flat RSU-4: dilations 1/2/4/8 instead of pooling (torch RSU4F)."""

    mid: int
    out: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        reb = partial(REBNCONV, dtype=self.dtype)
        hxin = reb(self.out, name="rebnconvin")(x, train)
        hx1 = reb(self.mid, dilation=1, name="rebnconv1")(hxin, train)
        hx2 = reb(self.mid, dilation=2, name="rebnconv2")(hx1, train)
        hx3 = reb(self.mid, dilation=4, name="rebnconv3")(hx2, train)
        hx4 = reb(self.mid, dilation=8, name="rebnconv4")(hx3, train)
        hx3d = reb(self.mid, dilation=4, name="rebnconv3d")(
            jnp.concatenate([hx4, hx3], -1), train)
        hx2d = reb(self.mid, dilation=2, name="rebnconv2d")(
            jnp.concatenate([hx3d, hx2], -1), train)
        hx1d = reb(self.out, dilation=1, name="rebnconv1d")(
            jnp.concatenate([hx2d, hx1], -1), train)
        return hxin + hx1d


def _make_stage(spec, name, dtype):
    kind, height, mid, out = spec
    if kind == "rsu4f":
        return RSU4F(mid=mid, out=out, dtype=dtype, name=name)
    return RSU(height=height, mid=mid, out=out, dtype=dtype, name=name)


class U2Net(nn.Module):
    """6-stage encoder / 5-stage decoder U²-Net with deep supervision.

    Returns ``(fused, sides)``: the fused saliency probability map
    (B, H, W, 1) and the list [d1..d6] of side probabilities at input
    resolution (torch forward returns the same 7 sigmoids).
    """

    variant: str = "u2netp"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        cfg = _CONFIGS[self.variant]
        x = x.astype(self.dtype)

        hx = x
        enc = []
        for i, spec in enumerate(cfg["enc"]):
            stage = _make_stage(spec, f"stage{i + 1}", self.dtype)
            hx = stage(hx, train)
            enc.append(hx)
            if i < 5:  # pool12..pool56 between encoder stages
                hx = _maxpool_ceil(hx)
        hx6 = enc[5]

        hx = _upsample_like(hx6, enc[4])
        dec_outs = []
        for i, spec in enumerate(cfg["dec"]):
            skip = enc[4 - i]
            stage = _make_stage(spec, f"stage{5 - i}d", self.dtype)
            d = stage(jnp.concatenate([hx, skip], -1), train)
            dec_outs.append(d)
            if i < 4:
                hx = _upsample_like(d, enc[3 - i])

        conv1 = partial(nn.Conv, features=1, kernel_size=(3, 3),
                        padding=((1, 1), (1, 1)), dtype=self.dtype,
                        param_dtype=jnp.float32)
        # d1..d5 from decoder outputs (reversed: dec_outs[-1] is
        # stage1d), d6 from the encoder bottleneck
        heads = list(reversed(dec_outs)) + [hx6]
        sides = []
        for i, h in enumerate(heads):
            s = conv1(name=f"side{i + 1}")(h)
            sides.append(_upsample_like(s, x) if i else s)
        d0 = nn.Conv(1, (1, 1), dtype=self.dtype, param_dtype=jnp.float32,
                     name="outconv")(jnp.concatenate(sides, -1))
        sig = lambda t: nn.sigmoid(t.astype(jnp.float32))  # noqa: E731
        return sig(d0), [sig(s) for s in sides]


def u2net_loss(logits_fused, logits_sides, target):
    """Deep-supervision loss: sum of BCE over fused + side outputs
    (the paper's training objective; rembg's weights were trained with
    it). Takes *probabilities* (the model's outputs) and a (B,H,W,1)
    target in [0,1]."""
    eps = 1e-7

    def bce(p):
        p = jnp.clip(p, eps, 1.0 - eps)
        return -jnp.mean(target * jnp.log(p)
                         + (1.0 - target) * jnp.log(1.0 - p))

    return bce(logits_fused) + sum(bce(s) for s in logits_sides)


# --- rembg-semantics matting -------------------------------------------------

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def saliency_fn(model: U2Net, params, size: int = 320):
    """jit-able (H,W,3) uint8 → (H,W) float32 alpha in [0,1].

    rembg's preprocessing for u2net: bilinear resize to 320², scale by
    the image max, ImageNet mean/std normalize; postprocessing: min-max
    normalize the fused map, resize back to the source size."""

    def fn(image_u8: jnp.ndarray) -> jnp.ndarray:
        img = image_u8.astype(jnp.float32)
        img = jax.image.resize(img, (size, size, 3), method="bilinear")
        img = img / jnp.maximum(jnp.max(img), 1e-6)
        img = (img - jnp.asarray(IMAGENET_MEAN)) / jnp.asarray(IMAGENET_STD)
        fused, _ = model.apply(params, img[None], train=False)
        m = fused[0, :, :, 0]
        lo, hi = jnp.min(m), jnp.max(m)
        m = (m - lo) / jnp.maximum(hi - lo, 1e-6)
        return jax.image.resize(
            m, (image_u8.shape[0], image_u8.shape[1]), method="bilinear")

    return fn


# --- torch state_dict import -------------------------------------------------

def import_u2net(state_dict, variant: str = "u2netp"):
    """Canonical torch U²-Net ``state_dict`` → ``{"params": …,
    "batch_stats": …}`` for :class:`U2Net` (parity pinned by
    tests/test_u2net.py). Torch keys look like
    ``stage1.rebnconvin.conv_s1.weight``; flax module names mirror
    them 1:1, so the walk is mechanical."""
    from surya_tpu.models.backbones.torch_import import _bn, _np, conv_kernel

    params: dict = {}
    stats: dict = {}

    def rebnconv(prefix):
        p, s = _bn(state_dict, f"{prefix}.bn_s1")
        return ({"conv_s1": {
                    "kernel": conv_kernel(state_dict[f"{prefix}.conv_s1.weight"]),
                    "bias": _np(state_dict[f"{prefix}.conv_s1.bias"])},
                 "bn_s1": p},
                {"bn_s1": s})

    names = sorted({k.split(".")[0] for k in state_dict})
    for mod in names:
        if mod.startswith("side"):
            params[mod] = {
                "kernel": conv_kernel(state_dict[f"{mod}.weight"]),
                "bias": _np(state_dict[f"{mod}.bias"])}
        elif mod == "outconv":
            params[mod] = {
                "kernel": conv_kernel(state_dict[f"{mod}.weight"]),
                "bias": _np(state_dict[f"{mod}.bias"])}
        else:  # stage{N} / stage{N}d: a dict of REBNCONVs
            subs = sorted({k.split(".")[1] for k in state_dict
                           if k.startswith(mod + ".")})
            params[mod], stats[mod] = {}, {}
            for sub in subs:
                p, s = rebnconv(f"{mod}.{sub}")
                params[mod][sub] = p
                stats[mod][sub] = s
    return {"params": params, "batch_stats": stats}
