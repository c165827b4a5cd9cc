"""Grad-CAM: the split-tail forward must reproduce the model's logits,
and heatmaps must be valid (shape, [0,1] range, finite)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from surya_tpu.core.config import ModelConfig
from surya_tpu.interpret import grad_cam, overlay_heatmap
from surya_tpu.models import get_model


def _setup(name, mode="fusion"):
    cfg = ModelConfig(name=name, mode=mode, num_classes=6,
                      compute_dtype="float32", use_pallas=False)
    model = get_model(cfg)
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.normal(size=(2, 64, 64, 3)), jnp.float32)
    feats = jnp.asarray(rng.normal(size=(2, 47)), jnp.float32)
    variables = model.init({"params": jax.random.key(0)}, images, feats,
                           train=False)
    return cfg, model, variables, images, feats


@pytest.mark.parametrize("target", ["layer3", "layer4"])
def test_quadtree_gradcam_logit_parity(target):
    cfg, model, variables, images, feats = _setup("quadtree")
    cams, preds, logits = grad_cam(cfg, variables, images, feats,
                                   target_layer=target)
    want = model.apply(variables, images, feats, train=False)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(want),
                               rtol=2e-4, atol=2e-4)
    assert cams.shape[0] == 2 and cams.ndim == 3
    c = np.asarray(cams)
    assert np.all(np.isfinite(c)) and c.min() >= 0 and c.max() <= 1 + 1e-6


def test_standard_resnet_gradcam():
    cfg, model, variables, images, feats = _setup("standard_resnet",
                                                  mode="image_only")
    cams, preds, logits = grad_cam(cfg, variables, images, feats)
    want = model.apply(variables, images, feats, train=False)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(want),
                               rtol=2e-4, atol=2e-4)
    # layer4 of a 64px input is 2x2
    assert cams.shape == (2, 2, 2)


def test_gradcam_responds_to_target_class():
    cfg, _, variables, images, feats = _setup("quadtree")
    cam0, _, _ = grad_cam(cfg, variables, images, feats, target_class=0)
    cam1, _, _ = grad_cam(cfg, variables, images, feats, target_class=1)
    assert not np.allclose(np.asarray(cam0), np.asarray(cam1))


def test_overlay_shapes():
    img = np.zeros((64, 64, 3), np.uint8)
    cam = np.random.default_rng(0).uniform(0, 1, (8, 8)).astype(np.float32)
    out = overlay_heatmap(img, cam)
    assert out.shape == (64, 64, 3) and out.dtype == np.uint8


def test_save_batch_grad_cam(tmp_path):
    import os

    from surya_tpu.interpret.gradcam import save_batch_grad_cam

    cfg, model, variables, images, feats = _setup("quadtree")
    labels = np.asarray([0, 1], np.int32)
    n = save_batch_grad_cam(cfg, variables,
                            [(images, feats, labels)],
                            class_names=[f"c{i}" for i in range(6)],
                            out_dir=str(tmp_path))
    assert n == 2
    files = []
    for root, _, fs in os.walk(tmp_path):
        files += [os.path.join(root, f) for f in fs]
    assert len(files) == 2
    assert any("_pred_" in f and f.endswith("_cam.jpg") for f in files)


def test_batch_grad_cam_rejects_numerical_only():
    import pytest as _pytest

    from surya_tpu.core.config import ModelConfig
    from surya_tpu.interpret.gradcam import batch_grad_cam

    cfg = ModelConfig(name="quadtree", mode="numerical_only")
    with _pytest.raises(ValueError):
        next(iter(batch_grad_cam(cfg, {}, [])))


@pytest.mark.parametrize("name", ["hierarchical_quadtree",
                                  "attention_hierarchical"])
@pytest.mark.parametrize("target", ["layer2", "level1", "level2"])
def test_hierarchical_gradcam_logit_parity(name, target):
    cfg, model, variables, images, feats = _setup(name)
    cams, preds, logits = grad_cam(cfg, variables, images, feats,
                                   target_layer=target)
    want = model.apply(variables, images, feats, train=False)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(want),
                               rtol=2e-4, atol=2e-4)
    # 64px input → layer2 map 8×8; level CAMs stitch back to 8×8/4×4-of-
    # quadrants resolution: level1 quadrants are 4×4 → merged 8×8,
    # level2 sub-quadrants 2×2 → merged 8×8 as well.
    assert cams.shape == (2, 8, 8) if target != "level2" else \
        cams.shape == (2, 8, 8)
    c = np.asarray(cams)
    assert np.all(np.isfinite(c)) and c.min() >= 0 and c.max() <= 1 + 1e-6


def test_hierarchical_gradcam_image_only_mode():
    cfg, model, variables, images, feats = _setup(
        "hierarchical_quadtree", mode="image_only")
    cams, _, logits = grad_cam(cfg, variables, images, feats,
                               target_layer="layer2")
    want = model.apply(variables, images, feats, train=False)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(want),
                               rtol=2e-4, atol=2e-4)
