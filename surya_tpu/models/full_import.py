"""Full-model torch-checkpoint → Flax importers for all 11 families.

Extends the backbone-level converters in
``surya_tpu.models.backbones.torch_import`` to COMPLETE models: every
importer consumes a torch ``state_dict`` with the reference's own module
naming (so a real reference checkpoint loads directly) and emits the
``{"params": ..., "batch_stats": ...}`` variables of the matching
surya_tpu model. Numeric forward equivalence (same logits as torch
within fp32 tolerance) is pinned per family by
``tests/test_full_model_equivalence.py``.

Reference key roots per family:

- quadtree            ``Quadtree_from scratch/models.py:214-305``:
  base_cnn.*, quadrant_processor.0, numerical_mlp.{0,3}, classifier.{0,3}
- hierarchical        ``models.py:105-210``: features_extractor.{0,1,4,5},
  global_processor.{0,1}, quadrant_processor.0, sub_quadrant_processor.0,
  numerical_mlp.0, classifier.{0,3}
- attention           ``models.py:6-101``: hierarchical + attention_gate.{0,2}
- standard_resnet     ``3dcnn/models.py:49-93``: base_cnn.*, classifier.{0,3}
- standard_multimodal ``comparative analysis/model.py:8-71``: backbone.*,
  numerical_mlp.{0,3}, classifier.{0,3}
- cnn_lstm            ``cnn+lstm/models.py:14-89``: cnn_backbone.{0,1,4..7},
  numerical_mlp.{0,2}, lstm.*, classifier.{0,3}
- ji_3dcnn            ``cnn+lstm/models.py:93-142``: visual_stream.{0,2,4},
  numerical_lstm.*, classifier.{0,3}
- quadtree_3d         ``3dcnn/models.py:96-214``: conv3d_block{1..3},
  conv3d_block4_new, conv3d_final_features, numerical_lstm,
  numerical_projection.0, classifier.{0,3}
- resnet3d_video      ``3dcnn/models.py:220-259``: r3d_model.* (+ fc.{0,3})
- hybrid_quadtree_3d  ``3dcnn/models.py:265-375``:
  pretrained_image_extractor.{0..4}, numerical_lstm,
  numerical_projection.0, classifier.{0,3}
- fact                ``VIT/fact_model.py:7-147``: vit_backbone.*,
  numerical_projector.{0,2}, fusion_transformer.layers.{0..3},
  cls_token, pos_embed, token_type_embed, classification_head.{0,1}

Layout notes:
- torch NCHW feature flattens become NHWC here; only the quadtree
  classifier sees flattened spatial maps, so only its fc1 rows need the
  CHW→HWC permutation (everything else is GAP'd to channel vectors).
- torch ``nn.LSTM`` gate chunks [i, f, g, o] map onto flax
  ``OptimizedLSTMCell``'s ``{i,f,g,o}×{input,hidden}`` Dense kernels;
  the single flax gate bias is ``bias_ih + bias_hh``.
- torch ``nn.TransformerEncoderLayer`` (post-LN) maps onto
  ``models.temporal.fact.PostLNEncoderLayer``.
"""

from __future__ import annotations

import numpy as np

from surya_tpu.models.backbones.torch_import import (
    _bn,
    _np,
    conv3d_kernel,
    conv_kernel,
    import_r3d18,
    import_resnet,
    import_vit_base,
    linear_kernel,
)

# --------------------------------------------------------------------------
# state_dict helpers


def sub(sd: dict, prefix: str) -> dict:
    """Filter keys starting with ``prefix`` and strip it."""
    return {k[len(prefix):]: v for k, v in sd.items()
            if k.startswith(prefix)}


def rekey(sd: dict, mapping: dict) -> dict:
    """Remap key prefixes: the longest matching old prefix is replaced."""
    out = {}
    pref = sorted(mapping, key=len, reverse=True)
    for k, v in sd.items():
        for p in pref:
            if k.startswith(p):
                out[mapping[p] + k[len(p):]] = v
                break
    return out


def import_linear(sd: dict, prefix: str) -> dict:
    return {"kernel": linear_kernel(sd[f"{prefix}.weight"]),
            "bias": _np(sd[f"{prefix}.bias"])}


def import_conv(sd: dict, prefix: str) -> dict:
    out = {"kernel": conv_kernel(sd[f"{prefix}.weight"])}
    if f"{prefix}.bias" in sd:
        out["bias"] = _np(sd[f"{prefix}.bias"])
    return out


def import_conv3(sd: dict, prefix: str) -> dict:
    out = {"kernel": conv3d_kernel(sd[f"{prefix}.weight"])}
    if f"{prefix}.bias" in sd:
        out["bias"] = _np(sd[f"{prefix}.bias"])
    return out


def import_lstm(sd: dict, prefix: str, num_layers: int) -> dict:
    """torch ``nn.LSTM`` → flax ``StackedLSTM`` params.

    torch layer k: weight_ih_l{k} (4H, in), weight_hh_l{k} (4H, H),
    bias_ih_l{k}, bias_hh_l{k}; gate chunk order [i, f, g, o]
    (https://docs.pytorch.org/docs/stable/generated/torch.nn.LSTM.html).
    flax OptimizedLSTMCell: ``i{i,f,g,o}`` input kernels (in, H) without
    bias and ``h{i,f,g,o}`` hidden kernels (H, H) with bias.
    """
    gates = ("i", "f", "g", "o")
    out = {}
    for k in range(num_layers):
        w_ih = _np(sd[f"{prefix}.weight_ih_l{k}"])
        w_hh = _np(sd[f"{prefix}.weight_hh_l{k}"])
        b = _np(sd[f"{prefix}.bias_ih_l{k}"]) + _np(
            sd[f"{prefix}.bias_hh_l{k}"])
        wi = np.split(w_ih, 4, axis=0)
        wh = np.split(w_hh, 4, axis=0)
        bs = np.split(b, 4, axis=0)
        cell = {}
        for g, wig, whg, bg in zip(gates, wi, wh, bs):
            cell[f"i{g}"] = {"kernel": wig.transpose(1, 0)}
            cell[f"h{g}"] = {"kernel": whg.transpose(1, 0), "bias": bg}
        out[f"OptimizedLSTMCell_{k}"] = cell
    return out


def import_encoder_layer(sd: dict, prefix: str, num_heads: int) -> dict:
    """torch ``nn.TransformerEncoderLayer`` (post-LN, ReLU) →
    ``PostLNEncoderLayer`` params."""
    d = _np(sd[f"{prefix}.self_attn.out_proj.weight"]).shape[0]
    hd = d // num_heads
    qkv_w = _np(sd[f"{prefix}.self_attn.in_proj_weight"])   # (3D, D)
    qkv_b = _np(sd[f"{prefix}.self_attn.in_proj_bias"])
    wq, wk, wv = np.split(qkv_w, 3, axis=0)
    bq, bk, bv = np.split(qkv_b, 3, axis=0)
    proj_w = _np(sd[f"{prefix}.self_attn.out_proj.weight"])

    def head_kernel(w):
        return w.transpose(1, 0).reshape(d, num_heads, hd)

    def ln(p):
        return {"scale": _np(sd[f"{prefix}.{p}.weight"]),
                "bias": _np(sd[f"{prefix}.{p}.bias"])}

    return {
        "attn": {
            "query": {"kernel": head_kernel(wq),
                      "bias": bq.reshape(num_heads, hd)},
            "key": {"kernel": head_kernel(wk),
                    "bias": bk.reshape(num_heads, hd)},
            "value": {"kernel": head_kernel(wv),
                      "bias": bv.reshape(num_heads, hd)},
            "out": {"kernel": proj_w.transpose(1, 0).reshape(
                num_heads, hd, d),
                "bias": _np(sd[f"{prefix}.self_attn.out_proj.bias"])},
        },
        "ln1": ln("norm1"),
        "ln2": ln("norm2"),
        "ff1": import_linear(sd, f"{prefix}.linear1"),
        "ff2": import_linear(sd, f"{prefix}.linear2"),
    }


def chw_to_hwc_rows(kernel: np.ndarray, c: int, h: int, w: int,
                    offset: int, blocks: int) -> np.ndarray:
    """Permute fc kernel rows from CHW-flat to HWC-flat block-wise.

    ``kernel`` is (in_dim, out); rows [offset, offset + blocks·c·h·w)
    hold ``blocks`` flattened (C, H, W) maps from torch ``.flatten(1)``;
    our models flatten NHWC so each block's rows reorder CHW→HWC.
    """
    kernel = np.array(kernel)
    span = c * h * w
    # idx[j_hwc] = j_chw of the same (h, w, c) element
    idx = np.arange(span).reshape(c, h, w).transpose(1, 2, 0).ravel()
    for q in range(blocks):
        s = offset + q * span
        kernel[s:s + span] = kernel[s:s + span][idx]
    return kernel


def _resnet_from_seq(sd: dict, seq_prefix: str, idx: dict) -> dict:
    """Rebuild torchvision resnet key names from an ``nn.Sequential`` of
    resnet children, e.g. features_extractor.{0:conv1, 1:bn1, 4:layer1…}."""
    return rekey(sub(sd, f"{seq_prefix}."),
                 {f"{i}.": f"{name}." for i, name in idx.items()})


# --------------------------------------------------------------------------
# spatial families


def import_quadtree(sd: dict, mode: str = "fusion"):
    """QuadtreeCNN (``Quadtree_from scratch/models.py:214-305`` naming;
    the ablation variant ``experiment/models_cnn.py:6-116`` uses the
    same attribute names)."""
    trunk_p, trunk_s = import_resnet(sub(sd, "base_cnn."),
                                     (2, 2, 2, 2))
    params = {"trunk": trunk_p}
    stats = {"trunk": trunk_s}
    qk = import_conv(sd, "quadrant_processor.0")
    params["quadrant_conv_kernel"] = qk["kernel"]
    params["quadrant_conv_bias"] = qk["bias"]
    if mode != "image_only":
        params["numerical_mlp"] = {
            "fc1": import_linear(sd, "numerical_mlp.0"),
            "fc2": import_linear(sd, "numerical_mlp.3")}
    fc1 = import_linear(sd, "classifier.0")
    if mode != "numerical_only":
        # quadrant blocks are flattened maps: CHW → HWC row permutation
        cq = qk["kernel"].shape[-1]                       # 128
        in_dim = fc1["kernel"].shape[0]
        num_dim = 0 if mode == "image_only" else \
            params["numerical_mlp"]["fc2"]["kernel"].shape[1]
        span = (in_dim - 512 - num_dim) // 4
        hw = span // cq
        h = int(round(float(np.sqrt(hw))))
        assert h * h * cq == span, (span, cq)
        fc1["kernel"] = chw_to_hwc_rows(fc1["kernel"], cq, h, h,
                                        offset=512, blocks=4)
    params["classifier"] = {"fc1": fc1,
                            "fc2": import_linear(sd, "classifier.3")}
    return params, stats


_HIER_TRUNK_IDX = {0: "conv1", 1: "bn1", 4: "layer1", 5: "layer2"}


def _import_hier_common(sd: dict):
    tv = _resnet_from_seq(sd, "features_extractor", _HIER_TRUNK_IDX)
    tv.update(_resnet_from_seq(sd, "global_processor",
                               {0: "layer3", 1: "layer4"}))
    trunk_p, trunk_s = import_resnet(tv, (2, 2, 2, 2))
    params = {"trunk": trunk_p,
              "level1_conv": import_conv(sd, "quadrant_processor.0"),
              "level2_conv": import_conv(sd, "sub_quadrant_processor.0"),
              "numerical_mlp": {
                  "fc1": import_linear(sd, "numerical_mlp.0")},
              "classifier": {"fc1": import_linear(sd, "classifier.0"),
                             "fc2": import_linear(sd, "classifier.3")}}
    return params, {"trunk": trunk_s}


def import_hierarchical(sd: dict):
    """HierarchicalQuadtreeCNN (``models.py:105-210``). All hierarchy
    features are GAP'd channel vectors — no flatten permutation."""
    return _import_hier_common(sd)


def import_attention_hierarchical(sd: dict):
    """AttentionHierarchicalCNN (``models.py:6-101``)."""
    params, stats = _import_hier_common(sd)
    params["attn_fc1"] = import_linear(sd, "attention_gate.0")
    params["attn_fc2"] = import_linear(sd, "attention_gate.2")
    return params, stats


def import_standard_resnet(sd: dict):
    """StandardResNetCNN (``3dcnn/models.py:49-93``)."""
    trunk_p, trunk_s = import_resnet(sub(sd, "base_cnn."), (2, 2, 2, 2))
    params = {"trunk": {"resnet": trunk_p},
              "classifier": {"fc1": import_linear(sd, "classifier.0"),
                             "fc2": import_linear(sd, "classifier.3")}}
    return params, {"trunk": {"resnet": trunk_s}}


def import_standard_multimodal(sd: dict, backbone: str = "resnet18"):
    """StandardMultimodalCNN (``comparative analysis/model.py:8-71``),
    resnet backbones (the GAP'd (B, dim) feature path)."""
    if backbone not in ("resnet18", "resnet34", "resnet50"):
        raise NotImplementedError(
            f"full-model import for backbone {backbone!r}; use the "
            "backbone-level converters for vgg/mobilenet/densenet")
    stage_sizes = {"resnet18": (2, 2, 2, 2), "resnet34": (3, 4, 6, 3),
                   "resnet50": (3, 4, 6, 3)}[backbone]
    trunk_p, trunk_s = import_resnet(sub(sd, "backbone."), stage_sizes,
                                     bottleneck=backbone == "resnet50")
    params = {"trunk": {"resnet": trunk_p},
              "numerical_mlp": {
                  "fc1": import_linear(sd, "numerical_mlp.0"),
                  "fc2": import_linear(sd, "numerical_mlp.3")},
              "classifier": {"fc1": import_linear(sd, "classifier.0"),
                             "fc2": import_linear(sd, "classifier.3")}}
    return params, {"trunk": {"resnet": trunk_s}}


# --------------------------------------------------------------------------
# temporal families


_CNN_BACKBONE_IDX = {0: "conv1", 1: "bn1", 4: "layer1", 5: "layer2",
                     6: "layer3", 7: "layer4"}


def import_cnn_lstm(sd: dict):
    """CnnLstm (``cnn+lstm/models.py:14-89``); cnn_backbone is
    Sequential(*resnet.children()[:-1])."""
    tv = _resnet_from_seq(sd, "cnn_backbone", _CNN_BACKBONE_IDX)
    trunk_p, trunk_s = import_resnet(tv, (2, 2, 2, 2))
    params = {"trunk": {"resnet": trunk_p},
              "num_fc1": import_linear(sd, "numerical_mlp.0"),
              "num_fc2": import_linear(sd, "numerical_mlp.2"),
              "lstm": import_lstm(sd, "lstm", num_layers=2),
              "classifier": {"fc1": import_linear(sd, "classifier.0"),
                             "fc2": import_linear(sd, "classifier.3")}}
    return params, {"trunk": {"resnet": trunk_s}}


def _conv3d_block_vars(sd: dict, conv_prefix: str, bn_prefix: str,
                       name: str, params: dict, stats: dict) -> None:
    params[f"{name}_conv"] = import_conv3(sd, conv_prefix)
    params[f"{name}_bn"], stats[f"{name}_bn"] = _bn(sd, bn_prefix)


def import_ji_3dcnn(sd: dict):
    """Ji3DCNN (``cnn+lstm/models.py:93-142``); visual_stream indices
    {0,2,4} are conv_3d_block Sequentials (.0 conv, .1 bn)."""
    params: dict = {}
    stats: dict = {}
    for i, name in ((0, "block1"), (2, "block2"), (4, "block3")):
        _conv3d_block_vars(sd, f"visual_stream.{i}.0",
                           f"visual_stream.{i}.1", name, params, stats)
    params["numerical_lstm"] = import_lstm(sd, "numerical_lstm", 1)
    params["classifier"] = {"fc1": import_linear(sd, "classifier.0"),
                            "fc2": import_linear(sd, "classifier.3")}
    return params, stats


def import_quadtree_3d(sd: dict, mode: str = "fusion"):
    """Quadtree3DCNN (``3dcnn/models.py:96-214``)."""
    params: dict = {}
    stats: dict = {}
    for tname, name in (("conv3d_block1", "block1"),
                        ("conv3d_block2", "block2"),
                        ("conv3d_block3", "block3"),
                        ("conv3d_block4_new", "block4"),
                        ("conv3d_final_features", "final")):
        _conv3d_block_vars(sd, f"{tname}.0", f"{tname}.1", name,
                           params, stats)
    if mode == "fusion":
        params["numerical_lstm"] = import_lstm(sd, "numerical_lstm", 2)
        params["numerical_projection"] = import_linear(
            sd, "numerical_projection.0")
    params["classifier"] = {"fc1": import_linear(sd, "classifier.0"),
                            "fc2": import_linear(sd, "classifier.3")}
    return params, stats


def import_resnet3d_video(sd: dict):
    """ResNet3DVideo (``3dcnn/models.py:220-259``): torchvision r3d_18
    with fc replaced by Sequential(Linear, ReLU, Dropout, Linear)."""
    r3d = sub(sd, "r3d_model.")
    trunk_p, trunk_s = import_r3d18(r3d)
    params = {"trunk": trunk_p,
              "classifier": {"fc1": import_linear(r3d, "fc.0"),
                             "fc2": import_linear(r3d, "fc.3")}}
    return params, {"trunk": trunk_s}


def import_hybrid_quadtree_3d(sd: dict, mode: str = "fusion"):
    """HybridQuadtree3DCNN (``3dcnn/models.py:265-375``);
    pretrained_image_extractor = Sequential(stem, layer1..layer4)."""
    tv = rekey(sub(sd, "pretrained_image_extractor."),
               {"0.": "stem.", "1.": "layer1.", "2.": "layer2.",
                "3.": "layer3.", "4.": "layer4."})
    trunk_p, trunk_s = import_r3d18(tv)
    params = {"trunk": trunk_p}
    if mode == "fusion":
        params["numerical_lstm"] = import_lstm(sd, "numerical_lstm", 2)
        params["numerical_projection"] = import_linear(
            sd, "numerical_projection.0")
    params["classifier"] = {"fc1": import_linear(sd, "classifier.0"),
                            "fc2": import_linear(sd, "classifier.3")}
    return params, {"trunk": trunk_s}


def import_fact(sd: dict, num_layers: int = 4, num_heads: int = 8,
                vit_heads: int = 12):
    """FactModel (``VIT/fact_model.py:7-147``)."""
    d = _np(sd["cls_token"]).shape[-1]
    params = {
        "vit_backbone": import_vit_base(sub(sd, "vit_backbone."),
                                        heads=vit_heads),
        "num_proj1": import_linear(sd, "numerical_projector.0"),
        "num_proj2": import_linear(sd, "numerical_projector.2"),
        "token_type_embed": _np(sd["token_type_embed.weight"]),
        "cls_token": _np(sd["cls_token"]).reshape(1, 1, d),
        "pos_embed": _np(sd["pos_embed"]),
        "head_ln": {"scale": _np(sd["classification_head.0.weight"]),
                    "bias": _np(sd["classification_head.0.bias"])},
        "head_fc": import_linear(sd, "classification_head.1"),
    }
    for i in range(num_layers):
        params[f"fusion{i}"] = import_encoder_layer(
            sd, f"fusion_transformer.layers.{i}", num_heads)
    return params, {}


IMPORTERS = {
    "quadtree": import_quadtree,
    "hierarchical_quadtree": import_hierarchical,
    "attention_hierarchical": import_attention_hierarchical,
    "standard_resnet": import_standard_resnet,
    "standard_multimodal": import_standard_multimodal,
    "cnn_lstm": import_cnn_lstm,
    "ji_3dcnn": import_ji_3dcnn,
    "quadtree_3d": import_quadtree_3d,
    "resnet3d_video": import_resnet3d_video,
    "hybrid_quadtree_3d": import_hybrid_quadtree_3d,
    "fact": import_fact,
}
