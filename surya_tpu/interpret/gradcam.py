"""Grad-CAM via functional forward-splitting + jax.vjp — no hooks.

The reference registers forward/backward hooks on ``layer4`` and
replays a one-hot backward (``Quadtree_from scratch/grad_cam.py:70-96``,
``resnet/grad_cam_analysis.py:237-324``). In JAX the same quantity —
d score / d activation — comes from ``jax.vjp`` through a *tail*
function that maps the target activation to the logits. Our ResNet
trunk supports ``start='layerK'`` so the tail reuses the full trunk
param tree with no model surgery.

Heatmap math (parity with ``grad_cam.py:82-87``): channel weights =
mean of gradients over spatial dims; cam = ReLU(Σ_c w_c · act_c),
max-normalized.

Supported models: ``quadtree`` (targets ``layer3`` — the quadtree's
shared map — or ``layer4`` — the global branch, the reference's choice),
``standard_resnet`` and ``standard_multimodal`` with resnet backbones
(target ``layer4``), and the hierarchical families
``hierarchical_quadtree`` / ``attention_hierarchical`` (targets:
``layer2`` — the shared 28×28 base map every hierarchy level reads —
or ``level1`` / ``level2`` — the shared quadrant-conv activations,
whose per-quadrant CAMs are stitched back into a full-image map with
``quadrant_merge``). The reference CAMs only its resnet-ish models; the
hierarchical coverage here is an extension enabled by the functional
formulation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from surya_tpu.core.config import ModelConfig
from surya_tpu.models.backbones.resnet import make_resnet, stem_is_s2d
from surya_tpu.models.common import (
    FusionClassifier,
    NumericalMLP,
    SingleLayerNumericalMLP,
)
from surya_tpu.ops.quadtree import (
    quadrant_flatten,
    quadrant_merge,
    quadrant_split,
)


def _trunk_vars(variables, *path):
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    for p in path:
        params = params[p]
        stats = stats.get(p, {}) if isinstance(stats, dict) else {}
    return {"params": params, "batch_stats": stats}


def _cam_raw(act, grad):
    """(B,h,w,C) activation+gradient → (B,h,w) unnormalized heatmap."""
    weights = jnp.mean(grad, axis=(1, 2), keepdims=True)   # (B,1,1,C)
    return jax.nn.relu(jnp.sum(weights * act, axis=-1))    # (B,h,w)


def _cam_normalize(cam):
    maxv = jnp.max(cam, axis=(1, 2), keepdims=True)
    return cam / jnp.maximum(maxv, 1e-12)


def _cam_from(act, grad):
    return _cam_normalize(_cam_raw(act, grad))


def _one_hot_seed(logits, target_class):
    preds = jnp.argmax(logits, axis=-1)
    target = preds if target_class is None else jnp.full_like(
        preds, target_class)
    return jax.nn.one_hot(target, logits.shape[-1],
                          dtype=logits.dtype), preds


def _quadtree_logits_from(cfg: ModelConfig, variables, act, fmap, feats,
                          target_layer):
    """Tail forward for QuadtreeCNN from the target activation."""
    params = variables["params"]
    trunk = make_resnet(cfg.backbone, dtype=jnp.float32,
                        stem_s2d=stem_is_s2d(params["trunk"]))
    tv = _trunk_vars(variables, "trunk")

    if target_layer == "layer3":
        fmap = act
        gmap = trunk.apply(tv, fmap, train=False, start="layer4")["out"]
    else:  # layer4: quadrant branch consumes the (constant) layer3 map
        gmap = act
    global_feat = jnp.mean(gmap, axis=(1, 2))

    quads = quadrant_split(fmap)
    q = jax.lax.conv_general_dilated(
        quads, params["quadrant_conv_kernel"].astype(quads.dtype),
        window_strides=(1, 1), padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    q = jax.nn.relu(q + params["quadrant_conv_bias"].astype(q.dtype))
    b = fmap.shape[0]
    q = jax.lax.reduce_window(q, -jnp.inf, jax.lax.max,
                              (1, 2, 2, 1), (1, 2, 2, 1), "VALID")
    quad_flat = quadrant_flatten(q, b)
    img_feat = jnp.concatenate([global_feat, quad_flat], axis=-1)

    if cfg.mode == "fusion":
        num_feat = NumericalMLP(out_dim=256, dropout=0.5,
                                dtype=jnp.float32).apply(
            {"params": params["numerical_mlp"]}, feats, train=False)
        fused = jnp.concatenate([img_feat, num_feat], axis=-1)
    else:
        fused = img_feat
    return FusionClassifier(num_classes=cfg.num_classes,
                            dropout=(0.5 if cfg.dropout is None
                                     else cfg.dropout),
                            dtype=jnp.float32).apply(
        {"params": params["classifier"]}, fused, train=False)


def _conv3x3_relu(x, kernel, bias):
    y = jax.lax.conv_general_dilated(
        x, kernel.astype(x.dtype), window_strides=(1, 1),
        padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return jax.nn.relu(y + bias.astype(y.dtype))


def _hier_head(cfg: ModelConfig, params, g, l1_feat, l2_feat, feats):
    """Hierarchical classifier head from the three level embeddings:
    g (B,512), l1_feat (B,4,128), l2_feat (B,16,64)."""
    b = g.shape[0]
    if cfg.name == "attention_hierarchical":
        scores = l2_feat @ params["attn_fc1"]["kernel"] + \
            params["attn_fc1"]["bias"]
        scores = jax.nn.relu(scores)
        scores = scores @ params["attn_fc2"]["kernel"] + \
            params["attn_fc2"]["bias"]                      # (B,16,1)
        weights = jax.nn.softmax(scores, axis=1)
        l2_out = jnp.sum(weights * l2_feat, axis=1)         # (B,64)
    else:
        l2_out = l2_feat.reshape(b, -1)                     # (B,1024)
    img_feat = jnp.concatenate([g, l1_feat.reshape(b, -1), l2_out],
                               axis=-1)
    if cfg.mode == "fusion":
        num_feat = SingleLayerNumericalMLP(
            out_dim=128, dtype=jnp.float32).apply(
            {"params": params["numerical_mlp"]}, feats, train=False)
        img_feat = jnp.concatenate([img_feat, num_feat], axis=-1)
    return FusionClassifier(num_classes=cfg.num_classes,
                            hidden_dim=1024, dropout=0.5,
                            dtype=jnp.float32).apply(
        {"params": params["classifier"]}, img_feat, train=False)


def _hier_logits_from(cfg: ModelConfig, variables, act, consts, feats,
                      target_layer):
    """Tail forward for the hierarchical families.

    target_layer='layer2': act is the shared base map (B,28,28,128) —
    everything recomputes from it. 'level1'/'level2': act is the shared
    quadrant-conv activation ((4B|16B),h,w,C) pre-GAP; the other
    branches enter as constants."""
    params = variables["params"]
    if target_layer == "layer2":
        base = act
        b = base.shape[0]
        trunk = make_resnet(cfg.backbone, dtype=jnp.float32,
                            stem_s2d=stem_is_s2d(params["trunk"]))
        tv = _trunk_vars(variables, "trunk")
        gmap = trunk.apply(tv, base, train=False, start="layer3")["out"]
        g = jnp.mean(gmap, axis=(1, 2))
        l1_raw = quadrant_split(base)
        l1_feat = jnp.mean(_conv3x3_relu(
            l1_raw, params["level1_conv"]["kernel"],
            params["level1_conv"]["bias"]), axis=(1, 2)).reshape(b, 4, 128)
        l2_raw = quadrant_split(l1_raw)
        l2_feat = jnp.mean(_conv3x3_relu(
            l2_raw, params["level2_conv"]["kernel"],
            params["level2_conv"]["bias"]), axis=(1, 2)).reshape(b, 16, 64)
    elif target_layer == "level1":
        b = consts["g"].shape[0]
        g, l2_feat = consts["g"], consts["l2_feat"]
        l1_feat = jnp.mean(act, axis=(1, 2)).reshape(b, 4, 128)
    else:  # level2
        b = consts["g"].shape[0]
        g, l1_feat = consts["g"], consts["l1_feat"]
        l2_feat = jnp.mean(act, axis=(1, 2)).reshape(b, 16, 64)
    return _hier_head(cfg, params, g, l1_feat, l2_feat, feats)


def _standard_logits_from(cfg: ModelConfig, variables, act, feats):
    params = variables["params"]
    feat = jnp.mean(act, axis=(1, 2))
    if cfg.name == "standard_multimodal" and cfg.mode == "fusion":
        num_feat = NumericalMLP(out_dim=256, dropout=0.5,
                                dtype=jnp.float32).apply(
            {"params": params["numerical_mlp"]}, feats, train=False)
        feat = jnp.concatenate([feat, num_feat], axis=-1)
        hidden = 512
    else:
        hidden = 256 if cfg.name == "standard_resnet" else 512
    return FusionClassifier(num_classes=cfg.num_classes, hidden_dim=hidden,
                            dropout=0.5, dtype=jnp.float32).apply(
        {"params": params["classifier"]}, feat, train=False)


def grad_cam(cfg: ModelConfig, variables, images, feats,
             target_layer: str = "layer4", target_class: int | None = None):
    """Returns (heatmaps (B,h,w), preds (B,), logits (B,C))."""
    images = jnp.asarray(images, jnp.float32)
    feats = jnp.asarray(feats, jnp.float32)
    params = variables["params"]
    if cfg.name in ("quadtree", "hierarchical_quadtree",
                    "attention_hierarchical"):
        s2d = stem_is_s2d(params["trunk"])
    else:
        s2d = stem_is_s2d(params["trunk"]["resnet"])
    trunk = make_resnet(cfg.backbone, dtype=jnp.float32, stem_s2d=s2d)

    if cfg.name == "quadtree":
        tv = _trunk_vars(variables, "trunk")
        fmap = trunk.apply(tv, images, train=False, upto="layer3")["out"]
        if target_layer == "layer3":
            act = fmap
        elif target_layer == "layer4":
            act = trunk.apply(tv, fmap, train=False,
                              start="layer4")["out"]
        else:
            raise ValueError("quadtree targets: layer3 | layer4")
        tail = lambda a: _quadtree_logits_from(  # noqa: E731
            cfg, variables, a, fmap, feats, target_layer)
    elif cfg.name in ("hierarchical_quadtree", "attention_hierarchical"):
        tv = _trunk_vars(variables, "trunk")
        base = trunk.apply(tv, images, train=False, upto="layer2")["out"]
        merges = 0
        consts = {}
        if target_layer in ("layer2", "base", "layer4"):
            # layer4 is the generic drivers' default — for the
            # hierarchical families the shared base map is the analogue
            target_layer = "layer2"
            act = base
        elif target_layer in ("level1", "level2"):
            l1_raw = quadrant_split(base)
            l1_act = _conv3x3_relu(l1_raw,
                                   params["level1_conv"]["kernel"],
                                   params["level1_conv"]["bias"])
            gmap = trunk.apply(tv, base, train=False,
                               start="layer3")["out"]
            b = base.shape[0]
            consts["g"] = jnp.mean(gmap, axis=(1, 2))
            if target_layer == "level1":
                act = l1_act
                merges = 1
                consts["l2_feat"] = jnp.mean(_conv3x3_relu(
                    quadrant_split(l1_raw),
                    params["level2_conv"]["kernel"],
                    params["level2_conv"]["bias"]),
                    axis=(1, 2)).reshape(b, 16, 64)
            else:
                act = _conv3x3_relu(quadrant_split(l1_raw),
                                    params["level2_conv"]["kernel"],
                                    params["level2_conv"]["bias"])
                merges = 2
                consts["l1_feat"] = jnp.mean(l1_act,
                                             axis=(1, 2)).reshape(b, 4,
                                                                  128)
        else:
            raise ValueError(
                "hierarchical targets: layer2 | level1 | level2")
        tl = target_layer
        tail = lambda a: _hier_logits_from(  # noqa: E731
            cfg, variables, a, consts, feats, tl)
        logits, vjp = jax.vjp(tail, act)
        seed, preds = _one_hot_seed(logits, target_class)
        (grad,) = vjp(seed)
        cam = _cam_raw(act, grad)                 # (B·4^merges, h, w)
        for _ in range(merges):                   # stitch quadrants back
            cam = quadrant_merge(cam[..., None],
                                 cam.shape[0] // 4)[..., 0]
        return _cam_normalize(cam), preds, logits
    elif cfg.name in ("standard_resnet", "standard_multimodal"):
        if not cfg.backbone.startswith("resnet"):
            raise NotImplementedError(
                "grad_cam supports resnet backbones (the reference hooks "
                "resnet layer4 only, resnet/grad_cam_analysis.py:258)")
        tv = _trunk_vars(variables, "trunk", "resnet")
        act = trunk.apply(tv, images, train=False, upto="layer4")["out"]
        tail = lambda a: _standard_logits_from(  # noqa: E731
            cfg, variables, a, feats)
    else:
        raise NotImplementedError(f"grad_cam for {cfg.name!r}")

    logits, vjp = jax.vjp(tail, act)
    seed, preds = _one_hot_seed(logits, target_class)
    (grad,) = vjp(seed)
    return _cam_from(act, grad), preds, logits


def resize_bilinear(cam: jnp.ndarray, size: tuple[int, int]) -> jnp.ndarray:
    """(B,h,w) → (B,H,W) bilinear upsample (cv2.resize equivalent)."""
    return jax.image.resize(cam, (cam.shape[0],) + tuple(size),
                            method="bilinear")


def overlay_heatmap(image: np.ndarray, cam: np.ndarray,
                    alpha: float = 0.4) -> np.ndarray:
    """Blend a [0,1] heatmap onto an HWC uint8/float image (JET colormap,
    parity with ``grad_cam.py:89-96``'s cv2.COLORMAP_JET blend)."""
    import matplotlib.cm as mcm

    cam = np.asarray(jax.image.resize(jnp.asarray(cam), image.shape[:2],
                                      method="bilinear"))
    colored = mcm.jet(np.clip(cam, 0, 1))[..., :3]
    img = np.asarray(image, np.float32)
    if img.max() > 1.5:
        img = img / 255.0
    out = (1 - alpha) * img + alpha * colored
    return (np.clip(out, 0, 1) * 255).astype(np.uint8)


def batch_grad_cam(cfg: ModelConfig, variables, batches,
                   target_layer: str = "layer4"):
    """Batch driver (parity with resnet/grad_cam_analysis.py:237-441):
    yields (heatmaps, preds, labels) per batch; skips numerical_only
    (``:238-241`` — no spatial evidence to attribute)."""
    if cfg.mode == "numerical_only":
        raise ValueError("grad-cam is undefined for numerical_only mode")
    fn = jax.jit(lambda imgs, fts: grad_cam(cfg, variables, imgs, fts,
                                            target_layer))
    for images, feats, labels in batches:
        cams, preds, _ = fn(images, feats)
        yield np.asarray(cams), np.asarray(preds), np.asarray(labels)


def save_batch_grad_cam(cfg: ModelConfig, variables, batches,
                        class_names, out_dir: str,
                        target_layer: str = "layer4",
                        alpha: float = 0.4) -> int:
    """Save ``<idx>_pred_<label>_cam.jpg`` overlays into per-true-class
    dirs (output naming parity with ``grad_cam_analysis.py:417-427``).
    Returns the number of images written.

    Batches may be (model_images, feats, labels) or
    (model_images, feats, labels, display_images) — the latter overlays
    on the raw (unnormalized) frames while classifying the former.
    """
    import os

    from PIL import Image

    if cfg.mode == "numerical_only":
        raise ValueError("grad-cam is undefined for numerical_only mode")
    # one compiled program per batch shape — eager per-op dispatch is
    # orders of magnitude slower through the tunnel (CLAUDE.md)
    fn = jax.jit(lambda imgs, fts: grad_cam(cfg, variables, imgs, fts,
                                            target_layer))
    n = 0
    for batch in batches:
        images, feats, labels = batch[:3]
        display = batch[3] if len(batch) > 3 else images
        cams, preds, _ = (np.asarray(x) for x in fn(images, feats))
        for i in range(len(labels)):
            if int(labels[i]) < 0:
                continue  # sentinel pad row (multi-chip eval padding)
            true_name = class_names[int(labels[i])]
            pred_name = class_names[int(preds[i])]
            d = os.path.join(out_dir, true_name)
            os.makedirs(d, exist_ok=True)
            img = np.asarray(display[i])
            if img.max() <= 1.5:
                img = (np.clip(img, 0, 1) * 255).astype(np.uint8)
            else:
                img = np.clip(img, 0, 255).astype(np.uint8)
            out = overlay_heatmap(img, cams[i], alpha)
            Image.fromarray(out).save(
                os.path.join(d, f"{n:05d}_pred_{pred_name}_cam.jpg"))
            n += 1
    return n
