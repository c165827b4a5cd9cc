"""Flax variables → reference-named torch ``state_dict`` exporters.

The inverse of ``surya_tpu.models.full_import``: every exporter takes
the ``{"params": ..., "batch_stats": ...}`` variables of a surya_tpu
model and emits a flat dict of numpy arrays keyed with the reference's
own torch module naming (``Quadtree_from scratch/models.py``,
``cnn+lstm/models.py``, ``3dcnn/models.py``, ``VIT/fact_model.py`` —
the same key roots documented in ``full_import``), so a model trained
here can be handed back to a reference user as a ``.pth`` their
scripts load directly (``load_state_dict`` with the matching
``get_model``). ``python -m surya_tpu export-torch`` wraps this and
``torch.save``s the result.

Exactness: every mapping is a transpose/reshape/split/concat, so
``IMPORTERS[name](EXPORTERS[name](vars))`` reproduces the original
variables bit-for-bit — pinned for all 11 families by
``tests/test_full_export.py``. Torch-only bookkeeping the reference's
``load_state_dict`` expects but flax has no counterpart for is
synthesized: ``num_batches_tracked`` = 0 per BN, and the summed flax
LSTM gate bias is emitted as ``bias_ih`` with ``bias_hh`` = 0 (torch
always adds the two, so the forward is unchanged).
"""

from __future__ import annotations

import numpy as np


def _np(x) -> np.ndarray:
    return np.array(x)


def conv_weight(kernel) -> np.ndarray:
    """(kh, kw, I, O) → (O, I, kh, kw)."""
    return _np(kernel).transpose(3, 2, 0, 1)


def conv3d_weight(kernel) -> np.ndarray:
    """(t, h, w, I, O) → (O, I, t, h, w)."""
    return _np(kernel).transpose(4, 3, 0, 1, 2)


def linear_weight(kernel) -> np.ndarray:
    """(I, O) → (O, I)."""
    return _np(kernel).transpose(1, 0)


def export_linear(out: dict, prefix: str, p: dict) -> None:
    out[f"{prefix}.weight"] = linear_weight(p["kernel"])
    if "bias" in p:
        out[f"{prefix}.bias"] = _np(p["bias"])


def export_conv(out: dict, prefix: str, p: dict) -> None:
    out[f"{prefix}.weight"] = conv_weight(p["kernel"])
    if "bias" in p:
        out[f"{prefix}.bias"] = _np(p["bias"])


def export_conv3(out: dict, prefix: str, p: dict) -> None:
    out[f"{prefix}.weight"] = conv3d_weight(p["kernel"])
    if "bias" in p:
        out[f"{prefix}.bias"] = _np(p["bias"])


def export_bn(out: dict, prefix: str, p: dict, s: dict) -> None:
    out[f"{prefix}.weight"] = _np(p["scale"])
    out[f"{prefix}.bias"] = _np(p["bias"])
    out[f"{prefix}.running_mean"] = _np(s["mean"])
    out[f"{prefix}.running_var"] = _np(s["var"])
    out[f"{prefix}.num_batches_tracked"] = np.zeros((), np.int64)


def export_lstm(out: dict, prefix: str, p: dict) -> None:
    """flax ``StackedLSTM`` params → torch ``nn.LSTM`` keys.

    Inverse of ``full_import.import_lstm``: gate order [i, f, g, o];
    the summed flax gate bias goes to ``bias_ih`` (``bias_hh`` = 0)."""
    layers = sorted(int(k.rsplit("_", 1)[1]) for k in p
                    if k.startswith("OptimizedLSTMCell_"))
    for k in layers:
        cell = p[f"OptimizedLSTMCell_{k}"]
        w_ih = np.concatenate([_np(cell[f"i{g}"]["kernel"]).transpose(1, 0)
                               for g in "ifgo"], axis=0)
        w_hh = np.concatenate([_np(cell[f"h{g}"]["kernel"]).transpose(1, 0)
                               for g in "ifgo"], axis=0)
        bias = np.concatenate([_np(cell[f"h{g}"]["bias"]) for g in "ifgo"],
                              axis=0)
        out[f"{prefix}.weight_ih_l{k}"] = w_ih
        out[f"{prefix}.weight_hh_l{k}"] = w_hh
        out[f"{prefix}.bias_ih_l{k}"] = bias
        out[f"{prefix}.bias_hh_l{k}"] = np.zeros_like(bias)


def _merge_heads_in(k) -> np.ndarray:
    """flax q/k/v kernel (D, H, hd) → torch (O=D, I=D) weight."""
    k = _np(k)
    d = k.shape[0]
    return k.reshape(d, -1).transpose(1, 0)


def export_encoder_layer(out: dict, prefix: str, p: dict) -> None:
    """``PostLNEncoderLayer`` → torch ``nn.TransformerEncoderLayer``."""
    a = p["attn"]
    out[f"{prefix}.self_attn.in_proj_weight"] = np.concatenate(
        [_merge_heads_in(a[n]["kernel"]) for n in ("query", "key",
                                                   "value")], axis=0)
    out[f"{prefix}.self_attn.in_proj_bias"] = np.concatenate(
        [_np(a[n]["bias"]).reshape(-1) for n in ("query", "key",
                                                 "value")], axis=0)
    ok = _np(a["out"]["kernel"])                  # (H, hd, D)
    d = ok.shape[-1]
    out[f"{prefix}.self_attn.out_proj.weight"] = ok.reshape(
        -1, d).transpose(1, 0)
    out[f"{prefix}.self_attn.out_proj.bias"] = _np(a["out"]["bias"])
    for ln, tname in (("ln1", "norm1"), ("ln2", "norm2")):
        out[f"{prefix}.{tname}.weight"] = _np(p[ln]["scale"])
        out[f"{prefix}.{tname}.bias"] = _np(p[ln]["bias"])
    export_linear(out, f"{prefix}.linear1", p["ff1"])
    export_linear(out, f"{prefix}.linear2", p["ff2"])


def hwc_to_chw_rows(kernel: np.ndarray, c: int, h: int, w: int,
                    offset: int, blocks: int) -> np.ndarray:
    """Inverse of ``full_import.chw_to_hwc_rows``."""
    kernel = np.array(kernel)
    span = c * h * w
    idx = np.arange(span).reshape(c, h, w).transpose(1, 2, 0).ravel()
    inv = np.argsort(idx)
    for q in range(blocks):
        s = offset + q * span
        kernel[s:s + span] = kernel[s:s + span][inv]
    return kernel


# --------------------------------------------------------------------------
# backbones (inverses of torch_import.import_resnet / import_r3d18 /
# import_vit_base)


def stem_kernel_from_s2d(k4: np.ndarray) -> np.ndarray:
    """(4,4,4C,CO) space-to-depth stem kernel → the original (7,7,C,CO)
    (inverse of ``backbones.resnet.stem_kernel_to_s2d``)."""
    k4 = np.asarray(k4)
    c4, co = k4.shape[2], k4.shape[3]
    c = c4 // 4
    k8 = k4.reshape(4, 4, 2, 2, c, co).transpose(0, 2, 1, 3, 4, 5)
    return k8.reshape(8, 8, c, co)[1:, 1:]


def export_resnet(params: dict, stats: dict, out: dict,
                  prefix: str = "") -> None:
    """surya_tpu ResNet tree → torchvision resnet key names."""
    k1 = _np(params["conv1"]["kernel"])
    if k1.shape[:2] == (4, 4):  # space-to-depth stem variant
        k1 = stem_kernel_from_s2d(k1)
    out[f"{prefix}conv1.weight"] = conv_weight(k1)
    export_bn(out, f"{prefix}bn1", params["bn1"], stats["bn1"])
    for name in params:
        if "_block" not in name:
            continue
        stage, block = name.split("_block")
        tp = f"{prefix}{stage}.{block}"
        bp, bs = params[name], stats[name]
        convs = [k for k in bp if k.startswith("conv")]
        for conv in sorted(convs):
            ci = int(conv[4:])
            export_conv(out, f"{tp}.{conv}", bp[conv])
            export_bn(out, f"{tp}.bn{ci}", bp[f"bn{ci}"], bs[f"bn{ci}"])
        if "downsample_conv" in bp:
            export_conv(out, f"{tp}.downsample.0", bp["downsample_conv"])
            export_bn(out, f"{tp}.downsample.1", bp["downsample_bn"],
                      bs["downsample_bn"])


def export_r3d18(params: dict, stats: dict, out: dict,
                 prefix: str = "") -> None:
    """surya_tpu ResNet3D tree → torchvision r3d_18 key names."""
    export_conv3(out, f"{prefix}stem.0", params["stem_conv"])
    export_bn(out, f"{prefix}stem.1", params["stem_bn"],
              stats["stem_bn"])
    for name in params:
        if "_block" not in name:
            continue
        stage, block = name.split("_block")
        tp = f"{prefix}{stage}.{block}"
        bp, bs = params[name], stats[name]
        for k in (1, 2):
            export_conv3(out, f"{tp}.conv{k}.0", bp[f"conv{k}"])
            export_bn(out, f"{tp}.conv{k}.1", bp[f"bn{k}"], bs[f"bn{k}"])
        if "downsample_conv" in bp:
            export_conv3(out, f"{tp}.downsample.0",
                         bp["downsample_conv"])
            export_bn(out, f"{tp}.downsample.1", bp["downsample_bn"],
                      bs["downsample_bn"])


def export_vit_base(params: dict, out: dict, prefix: str = "") -> None:
    """surya_tpu ViT params → timm vit_base key names."""
    out[f"{prefix}patch_embed.proj.weight"] = conv_weight(
        params["patch_embed"]["kernel"])
    out[f"{prefix}patch_embed.proj.bias"] = _np(
        params["patch_embed"]["bias"])
    d = _np(params["cls_token"]).shape[-1]
    out[f"{prefix}cls_token"] = _np(params["cls_token"]).reshape(1, 1, d)
    out[f"{prefix}pos_embed"] = _np(params["pos_embed"])
    out[f"{prefix}norm.weight"] = _np(params["ln_final"]["scale"])
    out[f"{prefix}norm.bias"] = _np(params["ln_final"]["bias"])
    blocks = sorted(int(k[5:]) for k in params if k.startswith("block")
                    and k[5:].isdigit())
    for i in blocks:
        b = params[f"block{i}"]
        p = f"{prefix}blocks.{i}"
        out[f"{p}.norm1.weight"] = _np(b["ln1"]["scale"])
        out[f"{p}.norm1.bias"] = _np(b["ln1"]["bias"])
        out[f"{p}.norm2.weight"] = _np(b["ln2"]["scale"])
        out[f"{p}.norm2.bias"] = _np(b["ln2"]["bias"])
        a = b["attn"]
        out[f"{p}.attn.qkv.weight"] = np.concatenate(
            [_merge_heads_in(a[n]["kernel"]) for n in ("query", "key",
                                                       "value")], axis=0)
        out[f"{p}.attn.qkv.bias"] = np.concatenate(
            [_np(a[n]["bias"]).reshape(-1) for n in ("query", "key",
                                                     "value")], axis=0)
        ok = _np(a["out"]["kernel"])
        out[f"{p}.attn.proj.weight"] = ok.reshape(-1, d).transpose(1, 0)
        out[f"{p}.attn.proj.bias"] = _np(a["out"]["bias"])
        export_linear(out, f"{p}.mlp.fc1", b["mlp"]["fc1"])
        export_linear(out, f"{p}.mlp.fc2", b["mlp"]["fc2"])


# --------------------------------------------------------------------------
# spatial families


def _tv_fc_zeros(out: dict, prefix: str, trunk_params: dict,
                 classes: int = 1000) -> None:
    """Reference models that wrap a WHOLE torchvision resnet
    (``base_cnn = models.resnet18(...)``) carry its unused 1000-class
    ``fc`` in their state_dicts; synthesize zeros so the exported dict
    loads with torch's default ``strict=True``. The head is dead code
    in every reference forward path."""
    blocks = [k for k in trunk_params if k.startswith("layer4_block")]
    last = trunk_params[sorted(blocks)[-1]]
    conv = "conv3" if "conv3" in last else "conv2"
    in_features = _np(last[conv]["kernel"]).shape[-1]
    out[f"{prefix}fc.weight"] = np.zeros((classes, in_features),
                                         np.float32)
    out[f"{prefix}fc.bias"] = np.zeros((classes,), np.float32)


def export_quadtree(variables: dict, mode: str = "fusion") -> dict:
    """Inverse of ``import_quadtree`` (``models.py:214-305`` naming)."""
    p = variables["params"]
    s = variables.get("batch_stats", {})
    out: dict = {}
    if mode != "numerical_only":  # flax tree has no trunk in this mode
        export_resnet(p["trunk"], s["trunk"], out, "base_cnn.")
        _tv_fc_zeros(out, "base_cnn.", p["trunk"])
        export_conv(out, "quadrant_processor.0",
                    {"kernel": p["quadrant_conv_kernel"],
                     "bias": p["quadrant_conv_bias"]})
    if mode != "image_only":
        export_linear(out, "numerical_mlp.0", p["numerical_mlp"]["fc1"])
        export_linear(out, "numerical_mlp.3", p["numerical_mlp"]["fc2"])
    fc1 = dict(p["classifier"]["fc1"])
    if mode != "numerical_only":
        cq = _np(p["quadrant_conv_kernel"]).shape[-1]
        in_dim = _np(fc1["kernel"]).shape[0]
        num_dim = 0 if mode == "image_only" else _np(
            p["numerical_mlp"]["fc2"]["kernel"]).shape[1]
        span = (in_dim - 512 - num_dim) // 4
        hw = span // cq
        h = int(round(float(np.sqrt(hw))))
        assert h * h * cq == span, (span, cq)
        fc1["kernel"] = hwc_to_chw_rows(_np(fc1["kernel"]), cq, h, h,
                                        offset=512, blocks=4)
    export_linear(out, "classifier.0", fc1)
    export_linear(out, "classifier.3", p["classifier"]["fc2"])
    return out


_HIER_TRUNK_SEQ = {"conv1": "0", "bn1": "1", "layer1": "4",
                   "layer2": "5"}
_HIER_GLOBAL_SEQ = {"layer3": "0", "layer4": "1"}


def _export_hier_common(variables: dict) -> dict:
    p = variables["params"]
    s = variables.get("batch_stats", {})
    tv: dict = {}
    export_resnet(p["trunk"], s["trunk"], tv)
    out: dict = {}
    for k, v in tv.items():
        root = k.split(".")[0]
        if root in _HIER_TRUNK_SEQ:
            out["features_extractor."
                + _HIER_TRUNK_SEQ[root] + k[len(root):]] = v
        elif root in _HIER_GLOBAL_SEQ:
            out["global_processor."
                + _HIER_GLOBAL_SEQ[root] + k[len(root):]] = v
        else:  # pragma: no cover — trunk only has the keys above
            raise KeyError(k)
    export_conv(out, "quadrant_processor.0", p["level1_conv"])
    export_conv(out, "sub_quadrant_processor.0", p["level2_conv"])
    export_linear(out, "numerical_mlp.0", p["numerical_mlp"]["fc1"])
    export_linear(out, "classifier.0", p["classifier"]["fc1"])
    export_linear(out, "classifier.3", p["classifier"]["fc2"])
    return out


def export_hierarchical(variables: dict) -> dict:
    return _export_hier_common(variables)


def export_attention_hierarchical(variables: dict) -> dict:
    out = _export_hier_common(variables)
    p = variables["params"]
    export_linear(out, "attention_gate.0", p["attn_fc1"])
    export_linear(out, "attention_gate.2", p["attn_fc2"])
    return out


def export_standard_resnet(variables: dict) -> dict:
    p = variables["params"]
    s = variables.get("batch_stats", {})
    out: dict = {}
    export_resnet(p["trunk"]["resnet"], s["trunk"]["resnet"], out,
                  "base_cnn.")
    _tv_fc_zeros(out, "base_cnn.", p["trunk"]["resnet"])
    export_linear(out, "classifier.0", p["classifier"]["fc1"])
    export_linear(out, "classifier.3", p["classifier"]["fc2"])
    return out


def export_standard_multimodal(variables: dict,
                               backbone: str = "resnet18") -> dict:
    if backbone not in ("resnet18", "resnet34", "resnet50"):
        raise NotImplementedError(
            f"full-model export for backbone {backbone!r}; use the "
            "backbone-level exporters for vgg/mobilenet/densenet")
    p = variables["params"]
    s = variables.get("batch_stats", {})
    out: dict = {}
    export_resnet(p["trunk"]["resnet"], s["trunk"]["resnet"], out,
                  "backbone.")
    export_linear(out, "numerical_mlp.0", p["numerical_mlp"]["fc1"])
    export_linear(out, "numerical_mlp.3", p["numerical_mlp"]["fc2"])
    export_linear(out, "classifier.0", p["classifier"]["fc1"])
    export_linear(out, "classifier.3", p["classifier"]["fc2"])
    return out


# --------------------------------------------------------------------------
# temporal families


_CNN_BACKBONE_SEQ = {"conv1": "0", "bn1": "1", "layer1": "4",
                     "layer2": "5", "layer3": "6", "layer4": "7"}


def export_cnn_lstm(variables: dict) -> dict:
    p = variables["params"]
    s = variables.get("batch_stats", {})
    tv: dict = {}
    export_resnet(p["trunk"]["resnet"], s["trunk"]["resnet"], tv)
    out: dict = {}
    for k, v in tv.items():
        root = k.split(".")[0]
        out["cnn_backbone." + _CNN_BACKBONE_SEQ[root]
            + k[len(root):]] = v
    export_linear(out, "numerical_mlp.0", p["num_fc1"])
    export_linear(out, "numerical_mlp.2", p["num_fc2"])
    export_lstm(out, "lstm", p["lstm"])
    export_linear(out, "classifier.0", p["classifier"]["fc1"])
    export_linear(out, "classifier.3", p["classifier"]["fc2"])
    return out


def export_ji_3dcnn(variables: dict) -> dict:
    p = variables["params"]
    s = variables.get("batch_stats", {})
    out: dict = {}
    for i, name in ((0, "block1"), (2, "block2"), (4, "block3")):
        export_conv3(out, f"visual_stream.{i}.0", p[f"{name}_conv"])
        export_bn(out, f"visual_stream.{i}.1", p[f"{name}_bn"],
                  s[f"{name}_bn"])
    export_lstm(out, "numerical_lstm", p["numerical_lstm"])
    export_linear(out, "classifier.0", p["classifier"]["fc1"])
    export_linear(out, "classifier.3", p["classifier"]["fc2"])
    return out


def export_quadtree_3d(variables: dict, mode: str = "fusion") -> dict:
    p = variables["params"]
    s = variables.get("batch_stats", {})
    out: dict = {}
    for tname, name in (("conv3d_block1", "block1"),
                        ("conv3d_block2", "block2"),
                        ("conv3d_block3", "block3"),
                        ("conv3d_block4_new", "block4"),
                        ("conv3d_final_features", "final")):
        export_conv3(out, f"{tname}.0", p[f"{name}_conv"])
        export_bn(out, f"{tname}.1", p[f"{name}_bn"], s[f"{name}_bn"])
    if mode == "fusion":
        export_lstm(out, "numerical_lstm", p["numerical_lstm"])
        export_linear(out, "numerical_projection.0",
                      p["numerical_projection"])
    export_linear(out, "classifier.0", p["classifier"]["fc1"])
    export_linear(out, "classifier.3", p["classifier"]["fc2"])
    return out


def export_resnet3d_video(variables: dict) -> dict:
    p = variables["params"]
    s = variables.get("batch_stats", {})
    out: dict = {}
    export_r3d18(p["trunk"], s["trunk"], out, "r3d_model.")
    export_linear(out, "r3d_model.fc.0", p["classifier"]["fc1"])
    export_linear(out, "r3d_model.fc.3", p["classifier"]["fc2"])
    return out


_HYBRID_SEQ = {"stem": "0", "layer1": "1", "layer2": "2", "layer3": "3",
               "layer4": "4"}


def export_hybrid_quadtree_3d(variables: dict,
                              mode: str = "fusion") -> dict:
    p = variables["params"]
    s = variables.get("batch_stats", {})
    tv: dict = {}
    export_r3d18(p["trunk"], s["trunk"], tv)
    out: dict = {}
    for k, v in tv.items():
        root = k.split(".")[0]
        out["pretrained_image_extractor." + _HYBRID_SEQ[root]
            + k[len(root):]] = v
    if mode == "fusion":
        export_lstm(out, "numerical_lstm", p["numerical_lstm"])
        export_linear(out, "numerical_projection.0",
                      p["numerical_projection"])
    export_linear(out, "classifier.0", p["classifier"]["fc1"])
    export_linear(out, "classifier.3", p["classifier"]["fc2"])
    return out


def export_fact(variables: dict) -> dict:
    p = variables["params"]
    out: dict = {}
    export_vit_base(p["vit_backbone"], out, "vit_backbone.")
    export_linear(out, "numerical_projector.0", p["num_proj1"])
    export_linear(out, "numerical_projector.2", p["num_proj2"])
    out["token_type_embed.weight"] = _np(p["token_type_embed"])
    d = _np(p["cls_token"]).shape[-1]
    out["cls_token"] = _np(p["cls_token"]).reshape(1, 1, d)
    out["pos_embed"] = _np(p["pos_embed"])
    out["classification_head.0.weight"] = _np(p["head_ln"]["scale"])
    out["classification_head.0.bias"] = _np(p["head_ln"]["bias"])
    export_linear(out, "classification_head.1", p["head_fc"])
    layers = sorted(int(k[6:]) for k in p if k.startswith("fusion")
                    and k[6:].isdigit())
    for i in layers:
        export_encoder_layer(out, f"fusion_transformer.layers.{i}",
                             p[f"fusion{i}"])
    return out


EXPORTERS = {
    "quadtree": export_quadtree,
    "hierarchical_quadtree": export_hierarchical,
    "attention_hierarchical": export_attention_hierarchical,
    "standard_resnet": export_standard_resnet,
    "standard_multimodal": export_standard_multimodal,
    "cnn_lstm": export_cnn_lstm,
    "ji_3dcnn": export_ji_3dcnn,
    "quadtree_3d": export_quadtree_3d,
    "resnet3d_video": export_resnet3d_video,
    "hybrid_quadtree_3d": export_hybrid_quadtree_3d,
    "fact": export_fact,
}
