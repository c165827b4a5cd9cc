"""On-device batched image augmentations (the reference transform set).

Reproduces the torchvision train pipeline of
``experiment/dataloader_cnn.py:31-46`` — RandomResizedCrop(224,
scale=(0.8,1.0)), HorizontalFlip(0.5), ColorJitter(0.2,0.2,0.2,0.1),
RandomRotation(10°), GaussianBlur(k=(5,9), σ=(0.1,0.5)), ImageNet
normalize — as ONE jit-compiled jnp program over the whole batch,
keyed by a PRNG key (no per-sample host RNG, no CPU worker pool: the
augmentation runs on the TPU fused with the train step's input side).

Geometry (crop + rotation) composes into a single affine bilinear
resample per image, so each output pixel is sampled exactly once.
Inputs are float32 [0,1] HWC batches; output is normalized NHWC.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def normalize(images: jnp.ndarray) -> jnp.ndarray:
    mean = jnp.asarray(IMAGENET_MEAN, images.dtype)
    std = jnp.asarray(IMAGENET_STD, images.dtype)
    return (images - mean) / std


def _bilinear_sample(images, ys, xs):
    """Per-sample bilinear sampling.

    images (B,H,W,C); ys/xs (B,Ho,Wo) source coordinates (pixel units).
    Out-of-bounds samples clamp to the border (matching the edge
    behavior close enough to torchvision's default fill for the ≤10°
    rotations used here; bounds are documented in the module docstring).
    """
    b, h, w, c = images.shape
    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    wy = (ys - y0)[..., None]
    wx = (xs - x0)[..., None]
    y0 = jnp.clip(y0.astype(jnp.int32), 0, h - 1)
    x0 = jnp.clip(x0.astype(jnp.int32), 0, w - 1)
    y1 = jnp.clip(y0 + 1, 0, h - 1)
    x1 = jnp.clip(x0 + 1, 0, w - 1)

    bidx = jnp.arange(b)[:, None, None]
    p00 = images[bidx, y0, x0]
    p01 = images[bidx, y0, x1]
    p10 = images[bidx, y1, x0]
    p11 = images[bidx, y1, x1]
    top = p00 * (1 - wx) + p01 * wx
    bot = p10 * (1 - wx) + p11 * wx
    return top * (1 - wy) + bot * wy


def _rrc_params(key, b, h, w, scale_min, scale_max, ratio=(3 / 4, 4 / 3)):
    """RandomResizedCrop box sampling (single-try variant of
    torchvision's rejection loop: clamp the box into the image —
    equivalent distribution for scale ≥ 0.8 where boxes almost always
    fit)."""
    k1, k2, k3, k4 = jax.random.split(key, 4)
    area = h * w * jax.random.uniform(k1, (b,), minval=scale_min,
                                      maxval=scale_max)
    log_r = jax.random.uniform(k2, (b,), minval=jnp.log(ratio[0]),
                               maxval=jnp.log(ratio[1]))
    # Clamp the aspect ratio so the box always fits (the analytic
    # equivalent of torchvision's 10-try rejection loop + fallback):
    # cw = sqrt(area·r) ≤ w  ⇔  r ≤ w²/area;  ch ≤ h  ⇔  r ≥ area/h².
    r = jnp.clip(jnp.exp(log_r), area / (h * h), (w * w) / area)
    cw = jnp.sqrt(area * r)
    ch = jnp.sqrt(area / r)
    y0 = jax.random.uniform(k3, (b,)) * (h - ch)
    x0 = jax.random.uniform(k4, (b,)) * (w - cw)
    return y0, x0, ch, cw


def _rgb_to_hsv(rgb):
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    maxc = jnp.max(rgb, axis=-1)
    minc = jnp.min(rgb, axis=-1)
    v = maxc
    rng = maxc - minc
    s = jnp.where(maxc > 0, rng / jnp.maximum(maxc, 1e-12), 0.0)
    safe = jnp.maximum(rng, 1e-12)
    rc = (maxc - r) / safe
    gc = (maxc - g) / safe
    bc = (maxc - b) / safe
    h = jnp.where(maxc == r, bc - gc,
                  jnp.where(maxc == g, 2.0 + rc - bc, 4.0 + gc - rc))
    h = (h / 6.0) % 1.0
    h = jnp.where(rng == 0, 0.0, h)
    return jnp.stack([h, s, v], axis=-1)


def _hsv_to_rgb(hsv):
    h, s, v = hsv[..., 0], hsv[..., 1], hsv[..., 2]
    i = jnp.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1 - s)
    q = v * (1 - f * s)
    t = v * (1 - (1 - f) * s)
    i = i.astype(jnp.int32) % 6
    r = jnp.choose(i, [v, q, p, p, t, v], mode="clip")
    g = jnp.choose(i, [t, v, v, q, p, p], mode="clip")
    b = jnp.choose(i, [p, p, t, v, v, q], mode="clip")
    return jnp.stack([r, g, b], axis=-1)


def color_jitter(key, images, brightness=0.2, contrast=0.2,
                 saturation=0.2, hue=0.1):
    """torchvision ColorJitter semantics, fixed op order (b, c, s, h).

    Factors sampled per sample: brightness/contrast/saturation ∈
    [1−x, 1+x], hue ∈ [−hue, +hue] (in HSV turns). torchvision also
    shuffles the op ORDER per call; we fix the order — a documented
    simplification with negligible distributional effect at these
    strengths."""
    kb, kc, ks, kh = jax.random.split(key, 4)
    b = images.shape[0]
    shape = (b, 1, 1, 1)
    if brightness > 0:
        f = jax.random.uniform(kb, shape, minval=1 - brightness,
                               maxval=1 + brightness)
        images = images * f
    if contrast > 0:
        f = jax.random.uniform(kc, shape, minval=1 - contrast,
                               maxval=1 + contrast)
        # torchvision: blend with the mean of the grayscale image.
        gray = (0.2989 * images[..., 0] + 0.587 * images[..., 1]
                + 0.114 * images[..., 2])
        mean = gray.mean(axis=(1, 2)).reshape(b, 1, 1, 1)
        images = (images - mean) * f + mean
    images = jnp.clip(images, 0.0, 1.0)
    if saturation > 0:
        # torchvision adjust_saturation: blend with the grayscale image
        # (NOT an HSV S-multiply — e.g. a pure-red pixel is invariant
        # under the S-multiply but shifts under the blend)
        fs = jax.random.uniform(ks, shape, minval=1 - saturation,
                                maxval=1 + saturation)
        gray = (0.2989 * images[..., 0] + 0.587 * images[..., 1]
                + 0.114 * images[..., 2])[..., None]
        images = jnp.clip(gray + (images - gray) * fs, 0.0, 1.0)
    if hue > 0:
        hsv = _rgb_to_hsv(images)
        fh = jax.random.uniform(kh, (b, 1, 1), minval=-hue, maxval=hue)
        hsv = jnp.stack([(hsv[..., 0] + fh) % 1.0, hsv[..., 1],
                         hsv[..., 2]], axis=-1)
        images = _hsv_to_rgb(hsv)
    return jnp.clip(images, 0.0, 1.0)


def gaussian_blur(key, images, kernel_hw=(9, 5), sigma=(0.1, 0.5)):
    """Separable Gaussian blur with per-sample random σ (torchvision
    GaussianBlur(kernel_size=(5,9), σ=(0.1,0.5)) — kx=5, ky=9)."""
    b = images.shape[0]
    kh, kw = kernel_hw
    s = jax.random.uniform(key, (b, 1), minval=sigma[0], maxval=sigma[1])

    def kern(n):
        x = jnp.arange(n, dtype=jnp.float32) - (n - 1) / 2
        w = jnp.exp(-(x[None, :] ** 2) / (2 * s ** 2))
        return w / w.sum(axis=1, keepdims=True)        # (B, n)

    ky_ = kern(kh)
    kx_ = kern(kw)
    # Depthwise separable conv via einsum-style gather: pad + weighted
    # sum of shifted copies (kh + kw shifts total — cheap and fusable).
    pad_h, pad_w = kh // 2, kw // 2
    x = jnp.pad(images, ((0, 0), (pad_h, pad_h), (0, 0), (0, 0)),
                mode="edge")
    h = images.shape[1]
    out = jnp.zeros_like(images)
    for i in range(kh):
        out = out + x[:, i:i + h] * ky_[:, i].reshape(b, 1, 1, 1)
    x = jnp.pad(out, ((0, 0), (0, 0), (pad_w, pad_w), (0, 0)),
                mode="edge")
    w = images.shape[2]
    out = jnp.zeros_like(images)
    for i in range(kw):
        out = out + x[:, :, i:i + w] * kx_[:, i].reshape(b, 1, 1, 1)
    return out


@partial(jax.jit, static_argnames=("out_size", "scale_min", "hflip_prob",
                                   "jitter", "rotation_deg", "blur_sigma"))
def augment_batch(key, images, out_size: int = 224,
                  scale_min: float = 0.8, hflip_prob: float = 0.5,
                  jitter: tuple = (0.2, 0.2, 0.2, 0.1),
                  rotation_deg: float = 10.0,
                  blur_sigma: tuple = (0.1, 0.5)) -> jnp.ndarray:
    """Full train-time augmentation: (B,H,W,C) float32 [0,1] →
    (B,out,out,C) normalized."""
    b, h, w, _ = images.shape
    k_crop, k_flip, k_rot, k_jit, k_blur = jax.random.split(key, 5)

    # --- fused geometry: rotation ∘ flip ∘ crop-resize ------------------
    y0, x0, ch, cw = _rrc_params(k_crop, b, h, w, scale_min, 1.0)
    theta = jnp.deg2rad(jax.random.uniform(
        k_rot, (b,), minval=-rotation_deg, maxval=rotation_deg))
    flip = jax.random.bernoulli(k_flip, hflip_prob, (b,))

    # output grid, centered
    oy = (jnp.arange(out_size, dtype=jnp.float32) + 0.5)[None, :, None]
    ox = (jnp.arange(out_size, dtype=jnp.float32) + 0.5)[None, None, :]
    # rotate about the output center
    cy = cx = out_size / 2.0
    cos = jnp.cos(theta)[:, None, None]
    sin = jnp.sin(theta)[:, None, None]
    ry = cy + (oy - cy) * cos - (ox - cx) * sin
    rx = cx + (oy - cy) * sin + (ox - cx) * cos
    # horizontal flip in output space
    rx = jnp.where(flip[:, None, None], out_size - rx, rx)
    # map into the crop box
    sy = (ch / out_size)[:, None, None]
    sx = (cw / out_size)[:, None, None]
    ys = y0[:, None, None] + ry * sy - 0.5
    xs = x0[:, None, None] + rx * sx - 0.5

    out = _bilinear_sample(images, ys, xs)

    # --- photometric ----------------------------------------------------
    out = color_jitter(k_jit, out, *jitter)
    out = gaussian_blur(k_blur, out, sigma=blur_sigma)
    return normalize(out)


@partial(jax.jit, static_argnames=("out_size",))
def eval_preprocess(images, out_size: int = 224) -> jnp.ndarray:
    """Eval path: resize (bilinear) + normalize
    (``dataloader_cnn.py:42-46``)."""
    b = images.shape[0]
    out = jax.image.resize(images, (b, out_size, out_size,
                                    images.shape[-1]), "bilinear")
    return normalize(out)
