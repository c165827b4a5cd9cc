import pytest

from surya_tpu.core.config import Config, get_preset, list_presets, parse_cli_overrides


def test_presets_cover_reference_experiments():
    names = list_presets()
    for required in ["quadtree-fusion", "experiment-fusion", "cnn-lstm",
                     "quadtree-3d", "fact", "comparative-vgg16"]:
        assert required in names


def test_quadtree_preset_hyperparams():
    # Quadtree_train.py:18-27: BS 16, lr 1e-4, wd 1e-4, patience 5, seed 42.
    cfg = get_preset("quadtree-fusion")
    assert cfg.data.batch_size == 16
    assert cfg.train.lr == 1e-4
    assert cfg.train.weight_decay == 1e-4
    assert cfg.train.early_stop_patience == 5
    assert cfg.train.seed == 42


def test_3dcnn_preset_hyperparams():
    # 3dcnn/train:29-43: BS 8, 5e-5, wd 5e-4, clip 1.0, T=5, stop 10/1e-3.
    cfg = get_preset("quadtree-3d")
    assert cfg.data.batch_size == 8
    assert cfg.train.lr == 5e-5
    assert cfg.train.grad_clip == 1.0
    assert cfg.model.seq_len == 5
    assert cfg.train.early_stop_patience == 10
    assert cfg.train.early_stop_min_delta == 1e-3


def test_override_paths_and_coercion():
    cfg = Config()
    cfg2 = cfg.override({"train.lr": "0.01", "model.num_classes": "5",
                         "data.augment": "false"})
    assert cfg2.train.lr == 0.01
    assert cfg2.model.num_classes == 5
    assert cfg2.data.augment is False
    assert cfg.train.lr == 1e-4  # original untouched


def test_override_unknown_field_raises():
    with pytest.raises(KeyError):
        Config().override({"train.nope": "1"})


def test_parse_cli():
    out = parse_cli_overrides(["--train.lr=3e-4", "--model.name=fact"])
    assert out == {"train.lr": "3e-4", "model.name": "fact"}
