"""Shape/dtype tests for every model family (SURVEY §4b).

Uses jax.eval_shape where possible so the suite stays fast; one real
forward per family catches numeric issues.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from surya_tpu.core.config import ModelConfig
from surya_tpu.models import get_model, list_models

SPATIAL = ["quadtree", "hierarchical_quadtree", "attention_hierarchical",
           "standard_resnet", "standard_multimodal"]
TEMPORAL = ["cnn_lstm", "ji_3dcnn", "quadtree_3d", "resnet3d_video",
            "hybrid_quadtree_3d", "fact"]


def _init_and_forward(cfg, img_shape, feat_shape, train=False):
    model = get_model(cfg)
    imgs = jnp.zeros(img_shape, jnp.float32)
    feats = jnp.zeros(feat_shape, jnp.float32)
    variables = model.init({"params": jax.random.key(0)}, imgs, feats,
                           train=False)
    rngs = {"dropout": jax.random.key(1)} if train else {}
    if train:
        out, _ = model.apply(variables, imgs, feats, train=True,
                             rngs=rngs, mutable=["batch_stats"])
    else:
        out = model.apply(variables, imgs, feats, train=False)
    return out, variables


def test_registry_lists_all_families():
    have = set(list_models())
    assert set(SPATIAL + TEMPORAL) <= have


@pytest.mark.parametrize("name", SPATIAL)
def test_spatial_forward_shapes(name):
    cfg = ModelConfig(name=name, num_classes=8, compute_dtype="float32",
                      use_pallas=False)
    out, _ = _init_and_forward(cfg, (2, 64, 64, 3), (2, 47))
    assert out.shape == (2, 8)
    assert out.dtype == jnp.float32
    assert np.all(np.isfinite(np.asarray(out)))


@pytest.mark.parametrize("mode", ["fusion", "image_only", "numerical_only"])
def test_quadtree_modes(mode):
    cfg = ModelConfig(name="quadtree", mode=mode, num_classes=5,
                      compute_dtype="float32", use_pallas=False)
    out, _ = _init_and_forward(cfg, (2, 64, 64, 3), (2, 47))
    assert out.shape == (2, 5)


def test_quadtree_image_dim_parity():
    """Reference asserts image feature dim == 5120 at 224 input
    (Quadtree_from scratch/models.py:250-251): 512 global + 4×1152."""
    cfg = ModelConfig(name="quadtree", num_classes=8,
                      compute_dtype="float32", use_pallas=False)
    model = get_model(cfg)
    imgs = jax.ShapeDtypeStruct((1, 224, 224, 3), jnp.float32)
    feats = jax.ShapeDtypeStruct((1, 47), jnp.float32)
    variables = jax.eval_shape(
        lambda: model.init({"params": jax.random.key(0)},
                           jnp.zeros((1, 224, 224, 3)), jnp.zeros((1, 47)),
                           train=False))
    del imgs, feats
    p = variables["params"]["classifier"]["fc1"]["kernel"]
    assert p.shape[0] == 5120 + 256  # image dim + numeric MLP out
    assert p.shape[1] == (5120 + 256) // 2  # 2688 hidden


def test_hierarchical_dims_parity():
    """HierarchicalQuadtreeCNN: 2048 image dim + 128 numeric → 2176→1024
    (models.py:148-165); attention variant 1088+128=1216→1024."""
    for name, in_dim in [("hierarchical_quadtree", 2176),
                         ("attention_hierarchical", 1216)]:
        cfg = ModelConfig(name=name, num_classes=8,
                          compute_dtype="float32")
        model = get_model(cfg)
        variables = jax.eval_shape(
            lambda m=model: m.init({"params": jax.random.key(0)},
                                   jnp.zeros((1, 224, 224, 3)),
                                   jnp.zeros((1, 47)), train=False))
        k = variables["params"]["classifier"]["fc1"]["kernel"]
        assert k.shape == (in_dim, 1024), (name, k.shape)


@pytest.mark.parametrize("name", ["cnn_lstm", "ji_3dcnn", "quadtree_3d"])
def test_temporal_forward_shapes(name):
    cfg = ModelConfig(name=name, num_classes=8, compute_dtype="float32",
                      seq_len=4)
    out, _ = _init_and_forward(cfg, (2, 4, 64, 64, 3), (2, 4, 47))
    assert out.shape == (2, 8)
    assert np.all(np.isfinite(np.asarray(out)))


@pytest.mark.parametrize("name", ["resnet3d_video", "hybrid_quadtree_3d"])
def test_r3d_models_eval_shape(name):
    cfg = ModelConfig(name=name, num_classes=8, compute_dtype="float32",
                      seq_len=5)
    model = get_model(cfg)
    variables = jax.eval_shape(
        lambda: model.init({"params": jax.random.key(0)},
                           jnp.zeros((1, 5, 112, 112, 3)),
                           jnp.zeros((1, 5, 47)), train=False))
    out = jax.eval_shape(
        lambda v: model.apply(v, jnp.zeros((2, 5, 112, 112, 3)),
                              jnp.zeros((2, 5, 47)), train=False),
        variables)
    assert out.shape == (2, 8)


def test_fact_eval_shape_and_dims():
    cfg = ModelConfig(name="fact", num_classes=8, compute_dtype="float32",
                      seq_len=4)
    model = get_model(cfg)
    variables = jax.eval_shape(
        lambda: model.init({"params": jax.random.key(0)},
                           jnp.zeros((1, 4, 224, 224, 3)),
                           jnp.zeros((1, 4, 47)), train=False))
    # pos embed covers 2T+1 = 9 tokens (VIT/fact_model.py:86).
    assert variables["params"]["pos_embed"].shape == (1, 9, 768)
    out = jax.eval_shape(
        lambda v: model.apply(v, jnp.zeros((2, 4, 224, 224, 3)),
                              jnp.zeros((2, 4, 47)), train=False),
        variables)
    assert out.shape == (2, 8)


def test_dropout_active_in_train_mode():
    cfg = ModelConfig(name="quadtree", num_classes=8,
                      compute_dtype="float32", use_pallas=False)
    model = get_model(cfg)
    imgs = jnp.ones((2, 64, 64, 3))
    feats = jnp.ones((2, 47))
    variables = model.init({"params": jax.random.key(0)}, imgs, feats,
                           train=False)
    o1, _ = model.apply(variables, imgs, feats, train=True,
                        rngs={"dropout": jax.random.key(1)},
                        mutable=["batch_stats"])
    o2, _ = model.apply(variables, imgs, feats, train=True,
                        rngs={"dropout": jax.random.key(2)},
                        mutable=["batch_stats"])
    assert not np.allclose(np.asarray(o1), np.asarray(o2))


@pytest.mark.parametrize("name", ["ji_3dcnn", "quadtree_3d"])
def test_conv3d_as_2d_matches_conv3d(name):
    """Conv3dAs2D (T folded into batch, 3 shifted 2D convs) == nn.Conv
    (3,3,3) with the SAME params — the decomposition is a pure
    reformulation (models/temporal/conv3d.py)."""
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.normal(size=(2, 5, 32, 32, 3)), jnp.float32)
    feats = jnp.asarray(rng.normal(size=(2, 5, 47)), jnp.float32)

    base = get_model(ModelConfig(name=name, num_classes=4,
                                 compute_dtype="float32"))
    variables = base.init({"params": jax.random.key(0)}, imgs, feats,
                          train=False)
    want = base.apply(variables, imgs, feats, train=False)

    as2d = get_model(ModelConfig(name=name, num_classes=4,
                                 compute_dtype="float32",
                                 conv3d_as_2d=True))
    # identical param TREE: the decomposed module reuses nn.Conv's
    # kernel/bias names and shapes
    shapes = jax.tree.map(jnp.shape, variables["params"])
    shapes2 = jax.tree.map(
        jnp.shape,
        as2d.init({"params": jax.random.key(0)}, imgs, feats,
                  train=False)["params"])
    assert shapes == shapes2
    got = as2d.apply(variables, imgs, feats, train=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_s2d_stem_matches_standard_stem():
    """Space-to-depth stem == standard 7x7/s2 stem, end-to-end through
    the trunk (same weights, converted)."""
    from surya_tpu.models.backbones.resnet import (
        resnet18,
        stem_is_s2d,
        stem_kernel_to_s2d,
    )

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 64, 64, 3)), jnp.float32)
    std = resnet18(dtype=jnp.float32)
    v = std.init({"params": jax.random.key(0)}, x, train=False)
    want = std.apply(v, x, train=False)["out"]

    import copy

    v2 = jax.tree.map(lambda a: a, v)  # shallow copy of structure
    v2 = jax.device_get(v2)
    v2 = {"params": dict(v2["params"]),
          "batch_stats": v2["batch_stats"]}
    v2["params"]["conv1"] = {
        "kernel": jnp.asarray(stem_kernel_to_s2d(
            np.asarray(v["params"]["conv1"]["kernel"])))}
    s2d = resnet18(dtype=jnp.float32, stem_s2d=True)
    got = s2d.apply(v2, x, train=False)["out"]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)
    assert stem_is_s2d(v2["params"]) and not stem_is_s2d(v["params"])
    del copy
