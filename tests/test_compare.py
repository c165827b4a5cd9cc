"""Multi-model comparison + eval-checkpoint + focal loss."""

import os

import numpy as np

import jax
import jax.numpy as jnp

from surya_tpu.core.checkpoint import save_params
from surya_tpu.core.config import Config, DataConfig, ModelConfig, TrainConfig
from surya_tpu.data import ArrayDataSource, make_synthetic_spatial
from surya_tpu.models import get_model
from surya_tpu.train.compare import compare_models, evaluate_checkpoint


def _cfg(name, backbone="resnet18"):
    return Config(model=ModelConfig(name=name, num_classes=3,
                                    backbone=backbone,
                                    compute_dtype="float32",
                                    use_pallas=False),
                  data=DataConfig(batch_size=8),
                  train=TrainConfig(seed=0))


def _data():
    splits = {s: make_synthetic_spatial(num_classes=3, per_class=8,
                                        image_size=32, seed=i)
              for i, s in enumerate(["train", "valid"])}
    return ArrayDataSource(splits, batch_size=8, pad_eval_to=8)


def test_compare_models(tmp_path, mesh8):
    data = _data()
    entries = []
    for name in ["quadtree", "standard_multimodal"]:
        cfg = _cfg(name)
        model = get_model(cfg.model)
        variables = model.init({"params": jax.random.key(0)},
                               jnp.zeros((1, 32, 32, 3)),
                               jnp.zeros((1, 47)), train=False)
        path = str(tmp_path / f"{name}_params")
        save_params(path, jax.device_get(variables))
        entries.append({"name": name, "cfg": cfg, "params_path": path})

    out_dir = str(tmp_path / "cmp")
    summary = compare_models(entries, data, split="valid",
                             out_dir=out_dir, mesh=mesh8)
    assert set(summary) == {"quadtree", "standard_multimodal"}
    for r in summary.values():
        assert 0.0 <= r["accuracy"] <= 1.0
        assert "f1" in r and "r2" in r
    assert os.path.exists(os.path.join(out_dir, "comparison.png"))
    assert os.path.exists(os.path.join(out_dir,
                                       "confusion_quadtree.png"))


def test_evaluate_checkpoint_manager_dir(tmp_path, mesh8):
    """evaluate from a CheckpointManager directory (latest step)."""
    from surya_tpu.core.checkpoint import (
        CheckpointManager,
        host_copy,
        load_checkpoint_variables,
    )
    from surya_tpu.core.prng import PRNG
    from surya_tpu.train.steps import create_train_state

    cfg = _cfg("quadtree")
    data = _data()
    model = get_model(cfg.model)
    sample = next(iter(data.train_batches(0)))
    with mesh8:
        state, _ = create_train_state(model, cfg, PRNG(0).named(0, "i"),
                                      sample)
    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    mgr.save(2, host_copy(state))
    mgr.wait()
    mgr.close()
    variables = load_checkpoint_variables(str(tmp_path / "ckpt"))
    out = evaluate_checkpoint(cfg, variables, data, split="valid",
                              mesh=mesh8)
    assert np.isfinite(out["loss"])


def test_focal_loss():
    from surya_tpu.models.losses import cross_entropy, focal_loss

    logits = jnp.asarray([[4.0, 0.0, 0.0], [0.0, 4.0, 0.0]])
    labels = jnp.asarray([0, 1])
    # gamma=0, no alpha → focal == cross-entropy
    np.testing.assert_allclose(float(focal_loss(logits, labels, gamma=0.0)),
                               float(cross_entropy(logits, labels)),
                               rtol=1e-6)
    # gamma>0 down-weights easy examples
    assert float(focal_loss(logits, labels, gamma=2.0)) < \
        float(cross_entropy(logits, labels))
    # per-class alpha vector (the reference's alpha_t bug, fixed)
    fl = focal_loss(logits, labels, gamma=2.0, alpha=[0.25, 0.75, 0.5])
    assert np.isfinite(float(fl))
