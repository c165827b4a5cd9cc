"""Gradient accumulation (train.grad_accum) semantics.

The accum path scans microbatches, averages grads, and applies ONE
optimizer update. With no cross-sample coupling (no BN in the applied
graph) and dropout off, mean-of-microbatch grads == full-batch grads,
so accum=K must reproduce accum=1 exactly (up to fp reassociation).
With BN present, stats update sequentially per microbatch
(torch-sequential semantics) — pinned here only as
finite-and-learning, not exactness.
"""

import jax
import numpy as np
import pytest

from surya_tpu.core.config import Config, DataConfig, ModelConfig, TrainConfig
from surya_tpu.core.metrics import MetricsLogger
from surya_tpu.core.prng import PRNG
from surya_tpu.data import ArrayDataSource, make_synthetic_spatial
from surya_tpu.models import get_model
from surya_tpu.train import train_and_evaluate
from surya_tpu.train.steps import create_train_state, make_train_step


def _source(batch_size=16, per_class=8, seed=0):
    splits = {s: make_synthetic_spatial(num_classes=4, per_class=per_class,
                                        image_size=32, seed=i)
              for i, s in enumerate(["train", "valid", "test"])}
    return ArrayDataSource(splits, batch_size=batch_size, pad_eval_to=8)


def _cfg(accum, **model_kw):
    return Config(
        model=ModelConfig(name="quadtree", num_classes=4,
                          compute_dtype="float32", use_pallas=False,
                          **model_kw),
        data=DataConfig(batch_size=16),
        train=TrainConfig(epochs=1, lr=3e-3, weight_decay=1e-5,
                          early_stop_patience=0, seed=0,
                          grad_accum=accum))


def _one_step(cfg, sample, mesh):
    model = get_model(cfg.model)
    with mesh:
        state, tx = create_train_state(model, cfg,
                                       PRNG(0).named(0, "init"), sample)
        step = make_train_step(model, tx, cfg)
        new_state, m = step(state, sample, PRNG(0).named(0, "d"))
        return (float(jax.device_get(m["loss"])),
                float(jax.device_get(m["accuracy"])),
                jax.device_get(new_state.params))


def test_accum_matches_single_step_no_bn(mesh8):
    # numerical_only applies only MLP+classifier: no BN, dropout off →
    # exact match modulo summation order.
    sample = next(iter(_source().train_batches(0)))
    outs = {a: _one_step(_cfg(a, mode="numerical_only", dropout=0.0),
                         sample, mesh8) for a in (1, 4)}
    assert outs[1][0] == pytest.approx(outs[4][0], rel=1e-5)
    assert outs[1][1] == outs[4][1]
    for a, b in zip(jax.tree.leaves(outs[1][2]),
                    jax.tree.leaves(outs[4][2])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_accum_full_model_step_finite(mesh8):
    # full fusion model (BN in trunk): sequential-stat semantics —
    # pin that the step runs, metrics are finite, stats moved.
    sample = next(iter(_source().train_batches(0)))
    cfg = _cfg(2)
    model = get_model(cfg.model)
    with mesh8:
        state, tx = create_train_state(model, cfg,
                                       PRNG(0).named(0, "init"), sample)
        before = jax.device_get(state.batch_stats)
        step = make_train_step(model, tx, cfg)
        new_state, m = step(state, sample, PRNG(0).named(0, "d"))
        assert np.isfinite(float(jax.device_get(m["loss"])))
        after = jax.device_get(new_state.batch_stats)
        assert any(not np.allclose(np.asarray(x), np.asarray(y))
                   for x, y in zip(jax.tree.leaves(before),
                                   jax.tree.leaves(after)))


def test_accum_indivisible_batch_raises(mesh8):
    sample = next(iter(_source().train_batches(0)))  # bs 16
    cfg = _cfg(3, mode="numerical_only")
    model = get_model(cfg.model)
    with mesh8:
        state, tx = create_train_state(model, cfg,
                                       PRNG(0).named(0, "init"), sample)
        step = make_train_step(model, tx, cfg)
        with pytest.raises(ValueError, match="divisible"):
            step(state, sample, PRNG(0).named(0, "d"))


def test_accum_trains_end_to_end(mesh8):
    cfg = _cfg(4, freeze_backbone=True)
    cfg = cfg.override({"train.epochs": "8"})
    summary = train_and_evaluate(cfg, _source(per_class=16), mesh=mesh8,
                                 logger=MetricsLogger(echo=False),
                                 checkpoints=False)
    assert summary["history"][-1]["train_accuracy"] > 0.9
