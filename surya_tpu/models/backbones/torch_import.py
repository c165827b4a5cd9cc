"""Torch-checkpoint → Flax parameter conversion.

The reference initializes every backbone from torchvision ImageNet /
Kinetics weights (``Quadtree_from scratch/models.py:221``,
``3dcnn/models.py:224``). This environment has no network egress and no
torchvision, so the converters take a torch ``state_dict`` (loaded from
a user-provided ``.pth``) with standard torchvision key naming and emit
our NHWC flax trees:

- conv weights (O, I, kh, kw) → (kh, kw, I, O); 3-D (O, I, t, h, w) →
  (t, h, w, I, O)
- BatchNorm weight/bias → scale/bias params; running_mean/var →
  batch_stats
- Linear weight (O, I) → kernel (I, O)

Numeric equivalence (same logits as torch within fp tolerance) is
pinned by tests/test_torch_import.py against a torch model with
torchvision naming.

Usage:
  params, stats = import_resnet18(torch.load("resnet18.pth"))
"""

from __future__ import annotations

import numpy as np


def _np(t):
    # np.array (copy), NOT np.asarray: torch optimizers update tensors
    # in-place, and a view would silently mutate already-imported params
    return np.array(t.detach().cpu().numpy() if hasattr(t, "detach")
                    else t)


def conv_kernel(w) -> np.ndarray:
    """(O, I, kh, kw) → (kh, kw, I, O)."""
    return _np(w).transpose(2, 3, 1, 0)


def conv3d_kernel(w) -> np.ndarray:
    """(O, I, t, h, w) → (t, h, w, I, O)."""
    return _np(w).transpose(2, 3, 4, 1, 0)


def linear_kernel(w) -> np.ndarray:
    """(O, I) → (I, O)."""
    return _np(w).transpose(1, 0)


def _bn(sd, prefix):
    params = {"scale": _np(sd[f"{prefix}.weight"]),
              "bias": _np(sd[f"{prefix}.bias"])}
    stats = {"mean": _np(sd[f"{prefix}.running_mean"]),
             "var": _np(sd[f"{prefix}.running_var"])}
    return params, stats


def import_resnet(state_dict, stage_sizes=(2, 2, 2, 2),
                  bottleneck: bool = False, stem_s2d: bool = False):
    """torchvision resnet18/34/50 state_dict → (params, batch_stats)
    for surya_tpu.models.backbones.resnet.ResNet.

    ``stem_s2d=True`` converts the 7×7 stem kernel into the equivalent
    space-to-depth (4,4,12,CO) kernel (resnet.stem_kernel_to_s2d)."""
    sd = state_dict
    k1 = conv_kernel(sd["conv1.weight"])
    if stem_s2d:
        from surya_tpu.models.backbones.resnet import stem_kernel_to_s2d

        k1 = stem_kernel_to_s2d(k1)
    params: dict = {"conv1": {"kernel": k1}}
    stats: dict = {}
    params["bn1"], stats["bn1"] = _bn(sd, "bn1")

    convs = ("conv1", "conv2", "conv3") if bottleneck else ("conv1",
                                                            "conv2")
    for i, n_blocks in enumerate(stage_sizes):
        stage = f"layer{i + 1}"
        for j in range(n_blocks):
            name = f"{stage}_block{j}"
            tp = f"{stage}.{j}"
            bp: dict = {}
            bs: dict = {}
            for ci, conv in enumerate(convs):
                bp[conv] = {"kernel": conv_kernel(
                    sd[f"{tp}.{conv}.weight"])}
                bn_name = f"bn{ci + 1}"
                bp[bn_name], bs[bn_name] = _bn(sd, f"{tp}.{bn_name}")
            if f"{tp}.downsample.0.weight" in sd:
                bp["downsample_conv"] = {"kernel": conv_kernel(
                    sd[f"{tp}.downsample.0.weight"])}
                bp["downsample_bn"], bs["downsample_bn"] = _bn(
                    sd, f"{tp}.downsample.1")
            params[name] = bp
            stats[name] = bs
    return params, stats


def import_resnet18(state_dict):
    return import_resnet(state_dict, (2, 2, 2, 2), bottleneck=False)


def import_resnet50(state_dict):
    return import_resnet(state_dict, (3, 4, 6, 3), bottleneck=True)


def import_r3d18(state_dict):
    """torchvision video r3d_18 → surya_tpu ResNet3D (params, stats).

    torchvision naming: stem.0 (conv) / stem.1 (bn);
    layerX.Y.conv1.0 (conv) / layerX.Y.conv1.1 (bn), conv2 likewise;
    layerX.Y.downsample.0 / .1.
    """
    sd = state_dict
    params: dict = {"stem_conv": {"kernel": conv3d_kernel(
        sd["stem.0.weight"])}}
    stats: dict = {}
    params["stem_bn"], stats["stem_bn"] = _bn(sd, "stem.1")
    for i, n_blocks in enumerate((2, 2, 2, 2)):
        stage = f"layer{i + 1}"
        for j in range(n_blocks):
            name = f"{stage}_block{j}"
            tp = f"{stage}.{j}"
            bp: dict = {}
            bs: dict = {}
            for k in (1, 2):
                bp[f"conv{k}"] = {"kernel": conv3d_kernel(
                    sd[f"{tp}.conv{k}.0.weight"])}
                bp[f"bn{k}"], bs[f"bn{k}"] = _bn(sd, f"{tp}.conv{k}.1")
            if f"{tp}.downsample.0.weight" in sd:
                bp["downsample_conv"] = {"kernel": conv3d_kernel(
                    sd[f"{tp}.downsample.0.weight"])}
                bp["downsample_bn"], bs["downsample_bn"] = _bn(
                    sd, f"{tp}.downsample.1")
            params[name] = bp
            stats[name] = bs
    return params, stats


def import_vit_base(state_dict, heads: int = 12):
    """timm vit_base_patch16_224 → surya_tpu ViT params.

    timm naming: patch_embed.proj, cls_token, pos_embed,
    blocks.N.{norm1,attn.qkv,attn.proj,norm2,mlp.fc1,mlp.fc2}, norm.
    The fused qkv (3·D, D) splits into flax MultiHeadDotProductAttention
    query/key/value kernels (D, H, D/H).
    """
    sd = state_dict
    d = _np(sd["cls_token"]).shape[-1]
    hd = d // heads
    params: dict = {
        "patch_embed": {"kernel": conv_kernel(
            sd["patch_embed.proj.weight"]),
            "bias": _np(sd["patch_embed.proj.bias"])},
        "cls_token": _np(sd["cls_token"]).reshape(1, 1, d),
        "pos_embed": _np(sd["pos_embed"]),
        "ln_final": {"scale": _np(sd["norm.weight"]),
                     "bias": _np(sd["norm.bias"])},
    }
    n_blocks = len({k.split(".")[1] for k in sd
                    if k.startswith("blocks.")})
    for i in range(n_blocks):
        p = f"blocks.{i}"
        qkv_w = _np(sd[f"{p}.attn.qkv.weight"])      # (3D, D)
        qkv_b = _np(sd[f"{p}.attn.qkv.bias"])
        wq, wk, wv = np.split(qkv_w, 3, axis=0)      # each (D, D)
        bq, bk, bv = np.split(qkv_b, 3, axis=0)
        proj_w = _np(sd[f"{p}.attn.proj.weight"])    # (D, D)

        def head_kernel(w):
            # torch (O=D, I=D) → flax (D_in, heads, head_dim)
            return w.transpose(1, 0).reshape(d, heads, hd)

        params[f"block{i}"] = {
            "ln1": {"scale": _np(sd[f"{p}.norm1.weight"]),
                    "bias": _np(sd[f"{p}.norm1.bias"])},
            "attn": {
                "query": {"kernel": head_kernel(wq),
                          "bias": bq.reshape(heads, hd)},
                "key": {"kernel": head_kernel(wk),
                        "bias": bk.reshape(heads, hd)},
                "value": {"kernel": head_kernel(wv),
                          "bias": bv.reshape(heads, hd)},
                "out": {"kernel": proj_w.transpose(1, 0).reshape(
                    heads, hd, d),
                    "bias": _np(sd[f"{p}.attn.proj.bias"])},
            },
            "ln2": {"scale": _np(sd[f"{p}.norm2.weight"]),
                    "bias": _np(sd[f"{p}.norm2.bias"])},
            "mlp": {
                "fc1": {"kernel": linear_kernel(
                    sd[f"{p}.mlp.fc1.weight"]),
                    "bias": _np(sd[f"{p}.mlp.fc1.bias"])},
                "fc2": {"kernel": linear_kernel(
                    sd[f"{p}.mlp.fc2.weight"]),
                    "bias": _np(sd[f"{p}.mlp.fc2.bias"])},
            },
        }
    return params
