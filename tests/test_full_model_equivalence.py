"""Full-model forward equivalence: torch logits == flax logits, all 11
families.

Each test builds a reference-named torch mirror (tests/torch_mirrors.py),
randomizes BN running stats, converts the state_dict with
``surya_tpu.models.full_import``, and requires logit agreement in eval
mode at float32. This is the strongest accuracy-parity evidence available
without the dataset: identical weights → identical predictions, for the
COMPLETE model (backbone + quadrant/attention/LSTM/transformer heads).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

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

B = 2
NUM_DIM = 47


def _inputs(seed, img=None, seq=None, t=None):
    rng = np.random.default_rng(seed)
    out = []
    if img is not None:
        out.append(rng.normal(size=(B, img, img, 3),
                              scale=0.5).astype(np.float32))
    if seq is not None:
        out.append(rng.normal(size=(B, t, seq, seq, 3),
                              scale=0.5).astype(np.float32))
    out.append(rng.normal(size=((B, NUM_DIM) if img is not None
                                else (B, t, NUM_DIM))).astype(np.float32))
    return out


def _torch_logits(model, images, feats, video=False):
    model.eval()
    with torch.no_grad():
        if video:
            timg = torch.from_numpy(images.transpose(0, 1, 4, 2, 3))
        else:
            timg = torch.from_numpy(images.transpose(0, 3, 1, 2))
        return model(timg, torch.from_numpy(feats)).numpy()


def _flax_logits(model, variables, images, feats):
    out = model.apply(variables, jnp.asarray(images), jnp.asarray(feats),
                      train=False)
    return np.asarray(out)


def _check(want, got, tol=2e-4):
    np.testing.assert_allclose(got, want, rtol=tol, atol=tol)


# --------------------------------------------------------------------------
# spatial


@pytest.mark.parametrize("mode", ["fusion", "image_only",
                                  "numerical_only"])
def test_quadtree_full_equivalence(mode):
    from surya_tpu.models.spatial.quadtree import QuadtreeCNN

    torch.manual_seed(0)
    # 128×128 → layer3 8×8 → quadrant 4×4 → pooled 2×2: exercises the
    # CHW→HWC classifier-row permutation non-trivially.
    tm = MirrorQuadtree(mode=mode, img=128)
    randomize_bn_stats(tm)
    params, stats = fi.import_quadtree(tm.state_dict(), mode=mode)
    images, feats = _inputs(0, img=128)
    want = _torch_logits(tm, images, feats)

    model = QuadtreeCNN(mode=mode, dtype=jnp.float32, use_pallas=False)
    got = _flax_logits(model, {"params": params, "batch_stats": stats},
                       images, feats)
    _check(want, got)


def test_hierarchical_full_equivalence():
    from surya_tpu.models.spatial.hierarchical import (
        HierarchicalQuadtreeCNN,
    )

    torch.manual_seed(1)
    tm = MirrorHierarchical()
    randomize_bn_stats(tm, 1)
    params, stats = fi.import_hierarchical(tm.state_dict())
    images, feats = _inputs(1, img=64)
    want = _torch_logits(tm, images, feats)

    model = HierarchicalQuadtreeCNN(dtype=jnp.float32)
    got = _flax_logits(model, {"params": params, "batch_stats": stats},
                       images, feats)
    _check(want, got)


def test_attention_hierarchical_full_equivalence():
    from surya_tpu.models.spatial.hierarchical import (
        AttentionHierarchicalCNN,
    )

    torch.manual_seed(2)
    tm = MirrorAttentionHierarchical()
    randomize_bn_stats(tm, 2)
    params, stats = fi.import_attention_hierarchical(tm.state_dict())
    images, feats = _inputs(2, img=64)
    want = _torch_logits(tm, images, feats)

    model = AttentionHierarchicalCNN(dtype=jnp.float32)
    got = _flax_logits(model, {"params": params, "batch_stats": stats},
                       images, feats)
    _check(want, got)


def test_standard_resnet_full_equivalence():
    from surya_tpu.models.spatial.standard import StandardResNetCNN

    torch.manual_seed(3)
    tm = MirrorStandardResNet()
    randomize_bn_stats(tm, 3)
    params, stats = fi.import_standard_resnet(tm.state_dict())
    images, feats = _inputs(3, img=64)
    want = _torch_logits(tm, images, feats)

    model = StandardResNetCNN(dtype=jnp.float32)
    got = _flax_logits(model, {"params": params, "batch_stats": stats},
                       images, feats)
    _check(want, got)


def test_standard_multimodal_full_equivalence():
    from surya_tpu.models.spatial.standard import StandardMultimodalCNN

    torch.manual_seed(4)
    tm = MirrorStandardMultimodal()
    randomize_bn_stats(tm, 4)
    params, stats = fi.import_standard_multimodal(tm.state_dict())
    images, feats = _inputs(4, img=64)
    want = _torch_logits(tm, images, feats)

    model = StandardMultimodalCNN(dtype=jnp.float32)
    got = _flax_logits(model, {"params": params, "batch_stats": stats},
                       images, feats)
    _check(want, got)


# --------------------------------------------------------------------------
# temporal


def test_cnn_lstm_full_equivalence():
    from surya_tpu.models.temporal.cnn_lstm import CnnLstm

    torch.manual_seed(5)
    tm = MirrorCnnLstm()
    randomize_bn_stats(tm, 5)
    params, stats = fi.import_cnn_lstm(tm.state_dict())
    video, feats = _inputs(5, seq=64, t=2)
    want = _torch_logits(tm, video, feats, video=True)

    model = CnnLstm(dtype=jnp.float32)
    got = _flax_logits(model, {"params": params, "batch_stats": stats},
                       video, feats)
    _check(want, got)


def test_ji_3dcnn_full_equivalence():
    from surya_tpu.models.temporal.conv3d import Ji3DCNN

    torch.manual_seed(6)
    tm = MirrorJi3DCNN()
    randomize_bn_stats(tm, 6)
    params, stats = fi.import_ji_3dcnn(tm.state_dict())
    video, feats = _inputs(6, seq=16, t=4)
    want = _torch_logits(tm, video, feats, video=True)

    model = Ji3DCNN(dtype=jnp.float32)
    got = _flax_logits(model, {"params": params, "batch_stats": stats},
                       video, feats)
    _check(want, got)


@pytest.mark.parametrize("mode", ["fusion", "image_only"])
def test_quadtree_3d_full_equivalence(mode):
    from surya_tpu.models.temporal.conv3d import Quadtree3DCNN

    torch.manual_seed(7)
    tm = MirrorQuadtree3D(mode=mode)
    randomize_bn_stats(tm, 7)
    params, stats = fi.import_quadtree_3d(tm.state_dict(), mode=mode)
    video, feats = _inputs(7, seq=32, t=4)
    want = _torch_logits(tm, video, feats, video=True)

    model = Quadtree3DCNN(mode=mode, dtype=jnp.float32)
    got = _flax_logits(model, {"params": params, "batch_stats": stats},
                       video, feats)
    _check(want, got, tol=3e-4)


def test_resnet3d_video_full_equivalence():
    from surya_tpu.models.temporal.resnet3d_video import ResNet3DVideo

    torch.manual_seed(8)
    tm = MirrorResNet3DVideo()
    randomize_bn_stats(tm, 8)
    params, stats = fi.import_resnet3d_video(tm.state_dict())
    video, feats = _inputs(8, seq=16, t=4)
    want = _torch_logits(tm, video, feats, video=True)

    model = ResNet3DVideo(dtype=jnp.float32)
    got = _flax_logits(model, {"params": params, "batch_stats": stats},
                       video, feats)
    _check(want, got, tol=3e-4)


@pytest.mark.parametrize("mode", ["fusion", "image_only"])
def test_hybrid_quadtree_3d_full_equivalence(mode):
    from surya_tpu.models.temporal.resnet3d_video import (
        HybridQuadtree3DCNN,
    )

    torch.manual_seed(9)
    tm = MirrorHybridQuadtree3D(mode=mode)
    randomize_bn_stats(tm, 9)
    params, stats = fi.import_hybrid_quadtree_3d(tm.state_dict(),
                                                 mode=mode)
    video, feats = _inputs(9, seq=16, t=4)
    want = _torch_logits(tm, video, feats, video=True)

    model = HybridQuadtree3DCNN(mode=mode, dtype=jnp.float32)
    got = _flax_logits(model, {"params": params, "batch_stats": stats},
                       video, feats)
    _check(want, got, tol=3e-4)


def test_fact_full_equivalence():
    from surya_tpu.models.temporal.fact import FactModel

    torch.manual_seed(10)
    d, heads, layers, t = 64, 4, 2, 2
    tm = MirrorFact(d=d, heads=heads, layers=layers, vit_depth=2,
                    patch=16, img=32, seq_len=t)
    params, _ = fi.import_fact(tm.state_dict(), num_layers=layers,
                               num_heads=heads, vit_heads=heads)
    video, feats = _inputs(10, seq=32, t=t)
    want = _torch_logits(tm, video, feats, video=True)

    model = FactModel(seq_len=t, embed_dim=d, num_layers=layers,
                      num_heads=heads, vit_depth=2, vit_heads=heads,
                      dtype=jnp.float32)
    got = _flax_logits(model, {"params": params}, video, feats)
    _check(want, got, tol=3e-4)
