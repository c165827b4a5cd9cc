"""Reverse export (``models/full_export``): flax → reference-named
torch state_dict, pinned as the exact inverse of ``full_import``.

For each family: build the reference-named torch mirror, import its
state_dict to flax variables, export back, and require the exported
dict to match the original bit-for-bit after canonicalization
(LSTM ``bias_ih + bias_hh`` summed — torch always adds them;
``num_batches_tracked`` dropped — flax has no counterpart). Key-set
equality is part of the check, so missing/extra keys fail too.
Combined with test_full_model_equivalence (import == torch logits),
this pins that an exported checkpoint reproduces the trained model's
predictions in the reference's own scripts.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from surya_tpu.models import full_export as fe  # noqa: E402
from surya_tpu.models import full_import as fi  # noqa: E402
from torch_mirrors import (  # noqa: E402
    MirrorAttentionHierarchical,
    MirrorCnnLstm,
    MirrorFact,
    MirrorHierarchical,
    MirrorHybridQuadtree3D,
    MirrorJi3DCNN,
    MirrorQuadtree,
    MirrorQuadtree3D,
    MirrorResNet3DVideo,
    MirrorStandardMultimodal,
    MirrorStandardResNet,
    randomize_bn_stats,
)


def _canon(sd: dict) -> dict:
    """numpy-fy, drop num_batches_tracked, merge LSTM bias pairs."""
    out = {}
    for k, v in sd.items():
        if k.endswith("num_batches_tracked"):
            continue
        v = np.array(v.detach().cpu().numpy() if hasattr(v, "detach")
                     else v)
        out[k] = v
    for k in [k for k in out if ".bias_ih_l" in k]:
        hh = k.replace(".bias_ih_l", ".bias_hh_l")
        out[k.replace(".bias_ih_l", ".bias_l")] = out.pop(k) + out.pop(hh)
    return out


def _roundtrip(tm, import_fn, export_fn, has_stats=True):
    sd0 = tm.state_dict()
    imported = import_fn(sd0)
    params, stats = imported
    variables = {"params": params}
    if has_stats:
        variables["batch_stats"] = stats
    sd1 = export_fn(variables)
    a, b = _canon(sd0), _canon(sd1)
    assert set(a) == set(b), (
        f"missing: {sorted(set(a) - set(b))[:5]} "
        f"extra: {sorted(set(b) - set(a))[:5]}")
    for k in a:
        if k in _DEAD_HEAD:  # synthesized zeros for the unused tv head
            assert a[k].shape == b[k].shape, k
            continue
        np.testing.assert_array_equal(a[k], b[k], err_msg=k)


# the unused torchvision 1000-class head carried by reference models
# that wrap a whole resnet18 (base_cnn.fc) — exported as zeros so
# strict=True loads work; values are dead code in every forward path
_DEAD_HEAD = {"base_cnn.fc.weight", "base_cnn.fc.bias"}


@pytest.mark.parametrize("mode", ["fusion", "image_only"])
def test_quadtree_roundtrip(mode):
    torch.manual_seed(0)
    tm = MirrorQuadtree(mode=mode, img=128)
    randomize_bn_stats(tm)
    # numerical_mlp exists in the torch module regardless of mode but
    # only reaches the flax tree in fusion mode; compare mode-visible
    # keys only for image_only
    sd0 = tm.state_dict()
    params, stats = fi.import_quadtree(sd0, mode=mode)
    sd1 = fe.export_quadtree({"params": params, "batch_stats": stats},
                             mode=mode)
    a, b = _canon(sd0), _canon(sd1)
    if mode == "image_only":
        a = {k: v for k, v in a.items()
             if not k.startswith("numerical_mlp.")}
    assert set(a) == set(b)
    for k in a:
        if k in _DEAD_HEAD:
            assert a[k].shape == b[k].shape, k
            continue
        np.testing.assert_array_equal(a[k], b[k], err_msg=k)


def test_hierarchical_roundtrip():
    torch.manual_seed(1)
    tm = MirrorHierarchical()
    randomize_bn_stats(tm, 1)
    _roundtrip(tm, fi.import_hierarchical, fe.export_hierarchical)


def test_attention_hierarchical_roundtrip():
    torch.manual_seed(2)
    tm = MirrorAttentionHierarchical()
    randomize_bn_stats(tm, 2)
    _roundtrip(tm, fi.import_attention_hierarchical,
               fe.export_attention_hierarchical)


def test_standard_resnet_roundtrip():
    torch.manual_seed(3)
    tm = MirrorStandardResNet()
    randomize_bn_stats(tm, 3)
    _roundtrip(tm, fi.import_standard_resnet, fe.export_standard_resnet)


def test_standard_multimodal_roundtrip():
    torch.manual_seed(4)
    tm = MirrorStandardMultimodal()
    randomize_bn_stats(tm, 4)
    _roundtrip(tm, fi.import_standard_multimodal,
               fe.export_standard_multimodal)


def test_cnn_lstm_roundtrip():
    torch.manual_seed(5)
    tm = MirrorCnnLstm()
    randomize_bn_stats(tm, 5)
    _roundtrip(tm, fi.import_cnn_lstm, fe.export_cnn_lstm)


def test_ji_3dcnn_roundtrip():
    torch.manual_seed(6)
    tm = MirrorJi3DCNN()
    randomize_bn_stats(tm, 6)
    _roundtrip(tm, fi.import_ji_3dcnn, fe.export_ji_3dcnn)


def test_quadtree_3d_roundtrip():
    torch.manual_seed(7)
    tm = MirrorQuadtree3D(mode="fusion")
    randomize_bn_stats(tm, 7)
    _roundtrip(tm, fi.import_quadtree_3d, fe.export_quadtree_3d)


def test_resnet3d_video_roundtrip():
    torch.manual_seed(8)
    tm = MirrorResNet3DVideo()
    randomize_bn_stats(tm, 8)
    _roundtrip(tm, fi.import_resnet3d_video, fe.export_resnet3d_video)


def test_hybrid_quadtree_3d_roundtrip():
    torch.manual_seed(9)
    tm = MirrorHybridQuadtree3D(mode="fusion")
    randomize_bn_stats(tm, 9)
    _roundtrip(tm, fi.import_hybrid_quadtree_3d,
               fe.export_hybrid_quadtree_3d)


def test_fact_roundtrip():
    torch.manual_seed(10)
    d, heads, layers = 64, 4, 2
    tm = MirrorFact(d=d, heads=heads, layers=layers, vit_depth=2,
                    patch=16, img=32, seq_len=2)
    sd0 = tm.state_dict()
    params, _ = fi.import_fact(sd0, num_layers=layers, num_heads=heads,
                               vit_heads=heads)
    sd1 = fe.export_fact({"params": params})
    a, b = _canon(sd0), _canon(sd1)
    assert set(a) == set(b), (
        f"missing: {sorted(set(a) - set(b))[:5]} "
        f"extra: {sorted(set(b) - set(a))[:5]}")
    for k in a:
        np.testing.assert_array_equal(a[k], b[k], err_msg=k)


def test_s2d_stem_kernel_inverse():
    rng = np.random.default_rng(0)
    k7 = rng.normal(size=(7, 7, 3, 64)).astype(np.float32)
    from surya_tpu.models.backbones.resnet import stem_kernel_to_s2d

    back = fe.stem_kernel_from_s2d(stem_kernel_to_s2d(k7))
    np.testing.assert_array_equal(back, k7)
