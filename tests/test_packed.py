"""Packed pre-decoded dataset cache (surya_tpu/data/packed.py).

The pack must be byte-identical to what DiskDataSource would decode
live (same decode path), resumable (skip-if-exists per split,
mirroring the reference's restartable preprocessing,
``Zero123/batch_aug.py:110-114``), and PackedDataSource must be a
drop-in: same batches, same eval padding, same device transform."""

import json

import numpy as np
import pytest


def _dcfg(root, **kw):
    from surya_tpu.core.config import DataConfig

    return DataConfig(data_root=root, batch_size=4, image_size=32, **kw)


def test_pack_and_batch_equivalence(disk_dataset, tmp_path):
    from surya_tpu.core.config import DataConfig
    from surya_tpu.data.dataset import DiskDataSource
    from surya_tpu.data.packed import PackedDataSource, pack_dataset

    pdir = str(tmp_path / "pack")
    meta = pack_dataset(disk_dataset, pdir, staging=48, use_native=False)
    assert meta["splits"]["train"]["count"] == 12  # 6 per class x2

    disk = DiskDataSource(_dcfg(disk_dataset), staging_size=48,
                          use_native=False)
    packed = PackedDataSource(_dcfg(disk_dataset), packed_dir=pdir)
    assert packed.class_names == disk.class_names
    assert packed.staging == 48

    # identical batches for the identical index order
    for split in ("train", "valid", "test"):
        n = len(disk.index[split][2])
        idx = np.arange(n)
        di, df, dl = disk._load_batch(split, idx)
        pi, pf, pl = packed._load_batch(split, idx)
        np.testing.assert_array_equal(di, pi)
        np.testing.assert_array_equal(df, pf)
        np.testing.assert_array_equal(dl, pl)

    # same shuffled epoch stream (same seed -> same permutation)
    db = next(iter(disk.train_batches(3)))
    pb = next(iter(packed.train_batches(3)))
    for a, b in zip(db, pb):
        np.testing.assert_array_equal(a, b)

    # stats carried into the pack -> imputation present
    assert packed.stats is not None


def test_pack_resume_skips_done_splits(disk_dataset, tmp_path, capsys):
    from surya_tpu.data.packed import pack_dataset

    pdir = str(tmp_path / "pack")
    pack_dataset(disk_dataset, pdir, staging=32, use_native=False)
    first = (tmp_path / "pack" / "train_images.npy").stat().st_mtime_ns
    pack_dataset(disk_dataset, pdir, staging=32, use_native=False)
    out = capsys.readouterr().out
    assert "skipping" in out
    assert (tmp_path / "pack"
            / "train_images.npy").stat().st_mtime_ns == first

    # staging mismatch must refuse, not silently serve the wrong size
    with pytest.raises(ValueError):
        pack_dataset(disk_dataset, pdir, staging=64, use_native=False)


def test_packed_source_eval_padding_and_transform(disk_dataset, tmp_path):
    import jax

    from surya_tpu.data.packed import PackedDataSource

    pdir = str(tmp_path / "pack")
    packed = PackedDataSource(_dcfg(disk_dataset), packed_dir=pdir,
                              staging_size=32, use_native=False,
                              pad_eval_to=8)
    batches = list(packed.eval_batches("valid"))  # 8 samples, bs 4
    assert all(len(b[2]) % 8 == 0 for b in batches)
    imgs, feats, labels = packed.device_transform(
        "train", jax.random.PRNGKey(0), batches[0])
    assert imgs.shape[1:] == (32, 32, 3)
    assert not bool(np.isnan(np.asarray(feats)).any())


def test_packed_rejects_foreign_source_root(disk_dataset, tmp_path):
    """A pack records its source dataset; serving it for a different
    configured data_root must fail loudly, not train on stale bytes."""
    from surya_tpu.data.packed import PackedDataSource, pack_dataset

    pdir = str(tmp_path / "pack")
    pack_dataset(disk_dataset, pdir, staging=32, use_native=False)
    other = tmp_path / "other_root"
    other.mkdir()
    with pytest.raises(ValueError, match="was built from"):
        PackedDataSource(_dcfg(str(other)), packed_dir=pdir)


def test_packed_missing_build_flag(disk_dataset, tmp_path):
    from surya_tpu.data.packed import PackedDataSource

    with pytest.raises(FileNotFoundError):
        PackedDataSource(_dcfg(disk_dataset),
                         packed_dir=str(tmp_path / "nope"), build=False)
    # build=True (default) constructs the pack on first use
    src = PackedDataSource(_dcfg(disk_dataset),
                           packed_dir=str(tmp_path / "auto"),
                           staging_size=32, use_native=False)
    assert (tmp_path / "auto" / "packed_meta.json").exists()
    assert src.num_classes == 2


def test_packed_train_end_to_end(disk_dataset, tmp_path, mesh8):
    """Full train_and_evaluate on the packed source (drop-in proof)."""
    from surya_tpu.core.config import Config, ModelConfig, TrainConfig
    from surya_tpu.core.metrics import MetricsLogger
    from surya_tpu.data.packed import PackedDataSource
    from surya_tpu.train import train_and_evaluate

    dcfg = _dcfg(disk_dataset, packed_dir=str(tmp_path / "pack"))
    dcfg.batch_size = 8  # divisible across the 8-device mesh
    data = PackedDataSource(dcfg, staging_size=48, use_native=False)
    cfg = Config(model=ModelConfig(name="quadtree", num_classes=2,
                                   compute_dtype="float32",
                                   use_pallas=False, freeze_backbone=True),
                 data=dcfg,
                 train=TrainConfig(epochs=1, lr=1e-3, seed=0))
    summary = train_and_evaluate(cfg, data, mesh=mesh8,
                                 logger=MetricsLogger(echo=False),
                                 checkpoints=False)
    assert "test" in summary
    assert np.isfinite(summary["history"][0]["val_loss"])


def test_cli_pack_subcommand(disk_dataset, tmp_path, monkeypatch):
    from surya_tpu.__main__ import cmd_pack

    out = str(tmp_path / "cli_pack")
    rc = cmd_pack(["--root", disk_dataset, "--out", out,
                   "--staging", "32"])
    assert rc == 0
    meta = json.loads((tmp_path / "cli_pack"
                       / "packed_meta.json").read_text())
    assert meta["staging"] == 32 and "train" in meta["splits"]
