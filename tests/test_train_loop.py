"""End-to-end training tests on the 8-device CPU mesh (SURVEY §4d/§4e)."""

import numpy as np
import pytest

from surya_tpu.core.config import Config, DataConfig, ModelConfig, TrainConfig
from surya_tpu.core.metrics import MetricsLogger
from surya_tpu.data import ArrayDataSource, make_synthetic_spatial
from surya_tpu.train import train_and_evaluate


def _tiny_source(batch_size=16, image_size=32, per_class=8,
                 num_classes=4, seed=0):
    imgs, feats, labels = make_synthetic_spatial(
        num_classes=num_classes, per_class=per_class,
        image_size=image_size, seed=seed)
    val = make_synthetic_spatial(num_classes=num_classes, per_class=4,
                                 image_size=image_size, seed=seed + 1)
    test = make_synthetic_spatial(num_classes=num_classes, per_class=4,
                                  image_size=image_size, seed=seed + 2)
    return ArrayDataSource(
        {"train": (imgs, feats, labels), "valid": val, "test": test},
        batch_size=batch_size, pad_eval_to=8)


def _cfg(name="quadtree", epochs=4, **model_kw):
    return Config(
        model=ModelConfig(name=name, num_classes=4,
                          compute_dtype="float32", use_pallas=False,
                          **model_kw),
        data=DataConfig(batch_size=16),
        train=TrainConfig(epochs=epochs, lr=3e-3, weight_decay=1e-5,
                          early_stop_patience=0, seed=0,
                          deterministic=True),
    )


def test_quadtree_learns_synthetic(mesh8, tmp_path):
    # freeze_backbone keeps trunk BN in inference mode so train/eval
    # statistics agree in this short run (unconverged running stats would
    # otherwise make eval diverge from train — a BN artifact, not a bug).
    cfg = _cfg(epochs=10, freeze_backbone=True)
    cfg = cfg.override({"train.checkpoint_dir": str(tmp_path / "ckpt")})
    data = _tiny_source(per_class=16)
    summary = train_and_evaluate(
        cfg, data, mesh=mesh8, logger=MetricsLogger(echo=False),
        checkpoints=False)
    # numerical branch alone separates the synthetic classes easily
    assert summary["history"][-1]["train_accuracy"] > 0.9
    assert summary["test"]["accuracy"] > 0.8


def test_numerical_only_mode_learns(mesh8):
    cfg = _cfg(mode="numerical_only", epochs=6)
    data = _tiny_source()
    summary = train_and_evaluate(cfg, data, mesh=mesh8,
                                 logger=MetricsLogger(echo=False),
                                 checkpoints=False)
    assert summary["history"][-1]["train_accuracy"] > 0.9


def test_early_stopping_and_plateau(mesh8):
    cfg = _cfg(epochs=10)
    cfg = cfg.override({"train.early_stop_patience": "2",
                        "train.plateau_patience": "1",
                        "train.lr": "1e-6"})  # tiny LR → no improvement
    data = _tiny_source()
    summary = train_and_evaluate(cfg, data, mesh=mesh8,
                                 logger=MetricsLogger(echo=False),
                                 checkpoints=False)
    # must have stopped before 10 epochs
    assert len(summary["history"]) < 10


def test_frozen_backbone_params_unchanged(mesh8):
    cfg = _cfg(epochs=1, freeze_backbone=True)
    data = _tiny_source()
    summary = train_and_evaluate(cfg, data, mesh=mesh8,
                                 logger=MetricsLogger(echo=False),
                                 checkpoints=False)
    state = summary["state"]
    # re-init fresh params with the same seed: trunk must equal trained
    # trunk (frozen), classifier must differ (trained).
    import jax

    from surya_tpu.models import get_model
    from surya_tpu.core.prng import PRNG
    model = get_model(cfg.model)
    sample = next(iter(data.train_batches(0)))
    variables = model.init({"params": PRNG(cfg.train.seed).named(0, "init")},
                           sample[0], sample[1], train=False)
    init_trunk = variables["params"]["trunk"]
    trained_trunk = state.params["trunk"]
    for a, b in zip(jax.tree.leaves(init_trunk),
                    jax.tree.leaves(trained_trunk)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    init_cls = jax.tree.leaves(variables["params"]["classifier"])
    trained_cls = jax.tree.leaves(state.params["classifier"])
    assert any(not np.allclose(np.asarray(a), np.asarray(b))
               for a, b in zip(init_cls, trained_cls))


def test_nan_guard_skips_bad_batch(mesh8):
    """A poisoned batch (NaN features) must not contaminate params."""
    import jax.numpy as jnp

    from surya_tpu.core.prng import PRNG
    from surya_tpu.models import get_model
    from surya_tpu.train.steps import (create_train_state, make_train_step)

    cfg = _cfg(name="quadtree", epochs=1)
    cfg = cfg.override({"model.mode": "numerical_only"})
    data = _tiny_source()
    model = get_model(cfg.model)
    sample = next(iter(data.train_batches(0)))
    with mesh8:
        state, tx = create_train_state(model, cfg,
                                       PRNG(0).named(0, "init"), sample)
        step = make_train_step(model, tx, cfg)
        bad = (sample[0], np.full_like(sample[1], np.nan), sample[2])
        # snapshot before the step: the step donates its input state
        before = np.asarray(state.params["classifier"]["fc1"]["kernel"]).copy()
        new_state, metrics = step(state, bad, PRNG(0).named(0, "dropout"))
        assert not bool(jnp.isfinite(metrics["loss"]))
        after = np.asarray(new_state.params["classifier"]["fc1"]["kernel"])
        np.testing.assert_array_equal(before, after)


@pytest.mark.parametrize("metric,mode", [("val_loss", "min"),
                                         ("val_accuracy", "max")])
def test_early_stopping_modes(metric, mode):
    from surya_tpu.train.loop import EarlyStopping
    es = EarlyStopping(metric, patience=2)
    assert es.mode == mode


def test_cnn_lstm_learns_synthetic_temporal(mesh8):
    from surya_tpu.data import make_synthetic_temporal

    splits = {s: make_synthetic_temporal(num_classes=3, per_class=8,
                                         seq_len=3, image_size=32,
                                         seed=i)
              for i, s in enumerate(["train", "valid"])}
    from surya_tpu.data import ArrayDataSource
    data = ArrayDataSource(splits, batch_size=16, pad_eval_to=8)
    cfg = Config(
        model=ModelConfig(name="cnn_lstm", num_classes=3, seq_len=3,
                          compute_dtype="float32",
                          freeze_backbone=True),
        data=DataConfig(batch_size=16),
        train=TrainConfig(epochs=6, lr=3e-3, seed=0,
                          early_stop_patience=0))
    summary = train_and_evaluate(cfg, data, mesh=mesh8,
                                 logger=MetricsLogger(echo=False),
                                 checkpoints=False)
    assert summary["history"][-1]["train_accuracy"] > 0.8


_SPATIAL_SMOKE = ["hierarchical_quadtree", "attention_hierarchical",
                  "standard_resnet", "standard_multimodal"]
_TEMPORAL_SMOKE = ["ji_3dcnn", "quadtree_3d", "resnet3d_video",
                   "hybrid_quadtree_3d", "fact"]


@pytest.mark.parametrize("name", _SPATIAL_SMOKE + _TEMPORAL_SMOKE)
def test_every_family_trains(name, mesh8):
    """SURVEY §4e: a tiny-synthetic train run per model family — every
    registry entry goes through the real loop (sharded step, eval,
    metrics) and the loss decreases. Families with dedicated
    learn-to-accuracy tests (quadtree, numerical_only, cnn_lstm) are
    covered above; this closes the remaining eight plus fact."""
    if name in _TEMPORAL_SMOKE:
        from surya_tpu.data import make_synthetic_temporal

        # quadtree_3d's two (2,2,2) temporal pools need T >= 4
        seq = 4 if name == "quadtree_3d" else 3
        splits = {s: make_synthetic_temporal(num_classes=3, per_class=8,
                                             seq_len=seq, image_size=32,
                                             seed=i)
                  for i, s in enumerate(["train", "valid"])}
        model = ModelConfig(name=name, num_classes=3, seq_len=seq,
                            compute_dtype="float32",
                            freeze_backbone=True)
    else:
        splits = {s: make_synthetic_spatial(num_classes=3, per_class=8,
                                            image_size=32, seed=i)
                  for i, s in enumerate(["train", "valid"])}
        model = ModelConfig(name=name, num_classes=3,
                            compute_dtype="float32", use_pallas=False,
                            freeze_backbone=True)
    data = ArrayDataSource(splits, batch_size=16, pad_eval_to=8)
    # fact (transformer from scratch) diverges above its preset 1e-4
    lr = 1e-4 if name == "fact" else 1e-3
    cfg = Config(model=model, data=DataConfig(batch_size=16),
                 train=TrainConfig(epochs=4, lr=lr, seed=0,
                                   early_stop_patience=0))
    summary = train_and_evaluate(cfg, data, mesh=mesh8,
                                 logger=MetricsLogger(echo=False),
                                 checkpoints=False)
    losses = [e["train_loss"] for e in summary["history"]]
    assert np.isfinite(losses).all(), losses
    assert losses[-1] < losses[0], losses


def test_conv3d_seq_len_validation():
    """Too-short clips must raise, not silently NaN: a (2,2,2) pool on
    T=1 yields a zero-size temporal dim whose mean is NaN (torch raises
    'Output size is too small' at the same point)."""
    import jax
    import jax.numpy as jnp

    from surya_tpu.models import get_model

    for name, bad_t, needed in (("quadtree_3d", 3, "4"),
                                ("ji_3dcnn", 1, "2")):
        cfg = ModelConfig(name=name, num_classes=3, seq_len=bad_t,
                          compute_dtype="float32")
        m = get_model(cfg)
        with pytest.raises(ValueError, match=f"seq_len >= {needed}"):
            m.init({"params": jax.random.key(0)},
                   jnp.zeros((1, bad_t, 32, 32, 3)),
                   jnp.zeros((1, bad_t, 47)), train=False)


def test_remat_matches_no_remat(mesh8):
    """jax.checkpoint remat must not change the computed update."""
    import jax
    import jax.numpy as jnp

    from surya_tpu.core.prng import PRNG
    from surya_tpu.models import get_model
    from surya_tpu.train.steps import create_train_state, make_train_step

    data = _tiny_source(batch_size=8)
    sample = next(iter(data.train_batches(0)))

    outs = {}
    for remat in (False, True):
        cfg = _cfg(epochs=1)
        cfg = cfg.override({"train.remat": str(remat).lower(),
                            "data.batch_size": "8"})
        model = get_model(cfg.model)
        with mesh8:
            state, tx = create_train_state(
                model, cfg, PRNG(0).named(0, "init"), sample)
            step = make_train_step(model, tx, cfg)
            new_state, m = step(state, sample, PRNG(0).named(0, "d"))
            outs[remat] = (float(jax.device_get(m["loss"])),
                           np.asarray(jax.device_get(
                               new_state.params["classifier"]["fc1"]
                               ["kernel"])))
    assert outs[False][0] == pytest.approx(outs[True][0], rel=1e-5)
    np.testing.assert_allclose(outs[False][1], outs[True][1],
                               rtol=1e-5, atol=1e-6)


def test_data_echo_multiplies_steps(mesh8):
    cfg = _cfg(epochs=1, freeze_backbone=True)
    cfg = cfg.override({"data.data_echo": "3"})
    data = _tiny_source(per_class=8)  # 32 imgs, bs 16 → 2 host batches
    summary = train_and_evaluate(cfg, data, mesh=mesh8,
                                 logger=MetricsLogger(echo=False),
                                 checkpoints=False)
    # 2 host batches × 3 echoes × 16 images = 96 seen
    assert summary["history"][0]["images_per_sec"] > 0
    # loss is finite and training consumed 6 steps worth of batches
    assert np.isfinite(summary["history"][0]["train_loss"])
