"""Frozen-backbone backward elision (train/steps.py stop_frozen_gradients).

The reference freezes backbones in several training regimes
(cnn+lstm/models.py:26-27, experiment/models_cnn.py:16-17, FACT's
frozen ViT; partial unfreeze of r3d_18 layer4 in 3dcnn/models.py:
229-237). optax's set_to_zero discards frozen grads only after autodiff
computed them; stop_gradient at the frozen param leaves lets JAX prune
the whole backbone backward from the jaxpr. These tests pin that

1. the step's numerics are IDENTICAL to the old full-graph autodiff
   (frozen grads never influenced updates or the trainable-only clip),
   including the partial-unfreeze family where layer4 grads must
   survive the pruning exactly;
2. the backward really is pruned (conv count in the lowered program
   drops to roughly forward-only for a frozen spatial model).
"""

import jax
import numpy as np
import pytest

from surya_tpu.core.config import Config, DataConfig, ModelConfig, TrainConfig
from surya_tpu.core.prng import PRNG
from surya_tpu.data import make_synthetic_spatial
from surya_tpu.models import get_model
from surya_tpu.train import steps as steps_mod
from surya_tpu.train.steps import create_train_state, make_train_step


def _cfg(name, freeze=True, **model_kw):
    return Config(
        model=ModelConfig(name=name, num_classes=4,
                          compute_dtype="float32", use_pallas=False,
                          freeze_backbone=freeze, **model_kw),
        data=DataConfig(batch_size=8),
        train=TrainConfig(lr=3e-3, weight_decay=1e-4, grad_clip=1.0,
                          seed=0))


def _spatial_batch():
    imgs, feats, labels = make_synthetic_spatial(
        num_classes=4, per_class=2, image_size=32, seed=0)
    return imgs, feats, labels


def _temporal_batch(t=4):
    rng = np.random.default_rng(0)
    return (rng.normal(size=(2, t, 32, 32, 3)).astype(np.float32),
            rng.normal(size=(2, t, 47)).astype(np.float32),
            rng.integers(0, 4, 2).astype(np.int32))


def _one_step(cfg, batch, mesh, *, elide):
    """Run one train step; elide=False restores the old full-graph AD."""
    model = get_model(cfg.model)
    orig = steps_mod.stop_frozen_gradients
    if not elide:
        steps_mod.stop_frozen_gradients = lambda p, n, f: p
    try:
        with mesh:
            state, tx = create_train_state(
                model, cfg, PRNG(0).named(0, "init"), batch)
            step = make_train_step(model, tx, cfg)
            new_state, m = step(state, batch, PRNG(0).named(0, "d"))
            return (float(jax.device_get(m["loss"])),
                    jax.device_get(new_state.params))
    finally:
        steps_mod.stop_frozen_gradients = orig


@pytest.mark.parametrize("name,batch_fn,kw", [
    ("quadtree", _spatial_batch, {"mode": "fusion"}),
    ("cnn_lstm", _temporal_batch, {"seq_len": 4}),
    # partial unfreeze: layer4 stays trainable, its grads must be exact
    ("resnet3d_video", _temporal_batch, {"seq_len": 4}),
])
def test_elision_numerics_identical(mesh8, name, batch_fn, kw):
    cfg = _cfg(name, **kw)
    batch = batch_fn()
    loss_a, params_a = _one_step(cfg, batch, mesh8, elide=True)
    loss_b, params_b = _one_step(cfg, batch, mesh8, elide=False)
    assert loss_a == pytest.approx(loss_b, rel=1e-6)
    flat_a = jax.tree.leaves(params_a)
    flat_b = jax.tree.leaves(params_b)
    assert len(flat_a) == len(flat_b)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)


def test_partial_unfreeze_layer4_still_updates(mesh8):
    cfg = _cfg("resnet3d_video", seq_len=4)
    batch = _temporal_batch()
    model = get_model(cfg.model)
    with mesh8:
        state, tx = create_train_state(model, cfg,
                                       PRNG(0).named(0, "init"), batch)
        before = jax.device_get(state.params)  # before donation
        step = make_train_step(model, tx, cfg)
        new_state, _ = step(state, batch, PRNG(0).named(0, "d"))
    after = jax.device_get(new_state.params)
    from flax import traverse_util
    fb = traverse_util.flatten_dict(before)
    fa = traverse_util.flatten_dict(after)
    moved = [p for p in fb
             if not np.allclose(np.asarray(fb[p]), np.asarray(fa[p]))]
    frozen_moved = [p for p in moved if p[0] == "trunk"
                    and not any("layer4" in s for s in p)]
    layer4_moved = [p for p in moved if any("layer4" in s for s in p)]
    assert not frozen_moved, f"frozen trunk params moved: {frozen_moved[:3]}"
    assert layer4_moved, "layer4 got no updates under partial unfreeze"


def test_elision_composes_with_remat(mesh8):
    """jax.checkpoint wraps an apply that stop_gradients frozen leaves;
    remat recomputes the trunk forward in the backward (its activations
    feed the trainable heads' grads) but the pruned transpose stays
    pruned — updates must match the non-remat frozen step exactly."""
    batch = _spatial_batch()
    outs = []
    for remat in (False, True):
        cfg = _cfg("quadtree", mode="fusion")
        cfg = cfg.override({"train.remat": str(remat).lower()})
        outs.append(_one_step(cfg, batch, mesh8, elide=True))
    assert outs[0][0] == pytest.approx(outs[1][0], rel=1e-6)
    for a, b in zip(jax.tree.leaves(outs[0][1]),
                    jax.tree.leaves(outs[1][1])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)


def test_frozen_backward_is_pruned(mesh8):
    """Conv count in the lowered step: frozen ≈ forward-only."""
    batch = _spatial_batch()

    def conv_count(freeze):
        cfg = _cfg("quadtree", freeze=freeze, mode="fusion")
        model = get_model(cfg.model)
        with mesh8:
            state, tx = create_train_state(
                model, cfg, PRNG(0).named(0, "init"), batch)
            step = make_train_step(model, tx, cfg)
            text = step.lower(state, batch,
                              PRNG(0).named(0, "d")).as_text()
        return text.count("stablehlo.convolution")

    frozen, full = conv_count(True), conv_count(False)
    # full autodiff carries ~3x the forward's convs (input+weight
    # grads); the frozen step keeps only the forward + the trainable
    # quadrant-processor's weight grad
    assert frozen < 0.55 * full, (frozen, full)
