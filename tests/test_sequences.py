"""Sequence builder + loader tests (windowing, labels, resume, padding)."""

import json
import os

import numpy as np
import pytest

from surya_tpu.core.config import DataConfig
from surya_tpu.data.sequences import (
    FILENAME_PATTERN,
    SequenceDataSource,
    _pad_or_truncate,
    build_sequence_dataset,
)


def test_filename_pattern_matches_reference_format():
    m = FILENAME_PATTERN.match("video_clip_001_frame_00101.jpg_view_01.png")
    assert m and m.groups() == ("video_clip_001", "00101", "01")
    m2 = FILENAME_PATTERN.match("video_clip_012_frame_00000_view_03.png")
    assert m2 and m2.groups() == ("video_clip_012", "00000", "03")
    assert FILENAME_PATTERN.match("something_else.png") is None


def test_pad_or_truncate():
    a = np.arange(6).reshape(3, 2)
    assert _pad_or_truncate(a, 3) is a
    np.testing.assert_array_equal(_pad_or_truncate(a, 5)[3:],
                                  [[4, 5], [4, 5]])
    np.testing.assert_array_equal(_pad_or_truncate(a, 2), a[:2])


@pytest.fixture
def aug_tree(tmp_path):
    """Augmented frames + flat .npy tree for two clips × two views."""
    from PIL import Image

    aug = tmp_path / "aug"
    flat = tmp_path / "flat"
    rng = np.random.default_rng(0)
    label = "cobra pose"
    for split in ["train", "valid"]:
        lab_dir = aug / split / label
        lab_dir.mkdir(parents=True)
        flat_dir = flat / split / label
        flat_dir.mkdir(parents=True)
        for clip in ["video_clip_001", "video_clip_002"]:
            for frame in range(6):
                # flat npy named <clip>_frame_XXXXX_frame_XXXXX.npy
                np.save(flat_dir / f"{clip}_frame_{frame:05d}_frame_"
                                   f"{frame:05d}.npy",
                        rng.normal(size=47).astype(np.float32))
                for view in ["01", "02"]:
                    img = Image.fromarray(
                        rng.integers(0, 255, (32, 32, 3), np.uint8))
                    img.save(lab_dir / f"{clip}_frame_{frame:05d}.jpg"
                                       f"_view_{view}.png")
    return str(aug), str(flat), str(tmp_path / "seq")


def test_build_and_load(aug_tree):
    aug, flat, out = aug_tree
    counts = build_sequence_dataset(aug, flat, out, seq_len=4, stride=2,
                                    image_size=32,
                                    splits=("train", "valid"))
    # 6 frames, window 4, stride 2 → starts {0, 2} → 2 windows per
    # (clip, view); 2 clips × 2 views = 8 per split.
    assert counts == {"train": 8, "valid": 8}
    with open(os.path.join(out, "class_to_idx.json")) as f:
        assert json.load(f) == {"cobra pose": 0}

    # resume: rebuilding saves nothing new but reports same counts
    counts2 = build_sequence_dataset(aug, flat, out, seq_len=4, stride=2,
                                     image_size=32,
                                     splits=("train", "valid"))
    assert counts2 == counts

    cfg = DataConfig(seq_root=out, seq_len=4, batch_size=4, image_size=32)
    src = SequenceDataSource(cfg)
    assert src.num_classes == 1
    imgs, feats, labels = next(iter(src.train_batches(0)))
    assert imgs.shape == (4, 4, 32, 32, 3) and imgs.dtype == np.uint8
    assert feats.shape == (4, 4, 47)
    assert np.all(labels == 0)

    # device transform normalizes
    import jax
    out_b = src.device_transform("train", jax.random.key(0),
                                 (imgs, feats, labels))
    assert out_b[0].shape == (4, 4, 32, 32, 3)
    assert abs(float(np.asarray(out_b[0]).mean())) < 5.0


def test_pack_sequences_equivalence_and_guards(aug_tree, tmp_path):
    from surya_tpu.data.packed import (
        PackedDataSource,
        PackedSequenceSource,
        pack_sequences,
    )

    aug, flat, out = aug_tree
    build_sequence_dataset(aug, flat, out, seq_len=4, stride=2,
                           image_size=32, splits=("train", "valid"))
    pdir = str(tmp_path / "seqpack")
    meta = pack_sequences(out, pdir, seq_len=4, verbose=False)
    assert meta["kind"] == "sequences"
    assert meta["splits"]["train"]["count"] == 8

    cfg = DataConfig(seq_root=out, seq_len=4, batch_size=4, image_size=32,
                     packed_dir=pdir)
    live = SequenceDataSource(cfg)
    packed = PackedSequenceSource(cfg)
    assert packed.class_names == live.class_names

    # identical epoch streams (same permutation seed); strict zip so a
    # batch-count mismatch fails instead of truncating the comparison
    for lb, pb in zip(live.train_batches(2), packed.train_batches(2),
                      strict=True):
        for a, b in zip(lb, pb, strict=True):
            np.testing.assert_array_equal(a, b)
    for lb, pb in zip(live.eval_batches("valid"),
                      packed.eval_batches("valid"), strict=True):
        for a, b in zip(lb, pb, strict=True):
            np.testing.assert_array_equal(a, b)

    # resume skip
    import io
    from contextlib import redirect_stdout
    buf = io.StringIO()
    with redirect_stdout(buf):
        pack_sequences(out, pdir, seq_len=4)
    assert "skipping" in buf.getvalue()

    # guards: wrong-kind source, seq_len mismatch
    with pytest.raises(ValueError):
        PackedDataSource(DataConfig(data_root=out, packed_dir=pdir))
    with pytest.raises(ValueError):
        PackedSequenceSource(DataConfig(seq_root=out, seq_len=6,
                                        packed_dir=pdir))

    # eval padding carries the -1 sentinel, identically to the live
    # source (every batch padded to a pad_eval_to multiple)
    padded = PackedSequenceSource(cfg, pad_eval_to=16)
    live_padded = SequenceDataSource(cfg, pad_eval_to=16)
    batches = list(padded.eval_batches("valid"))
    assert all(len(b[2]) % 16 == 0 for b in batches)
    for lb, pb in zip(live_padded.eval_batches("valid"), batches,
                      strict=True):
        for a, b in zip(lb, pb, strict=True):
            np.testing.assert_array_equal(a, b)
    pad_labels = np.concatenate([b[2] for b in batches])
    assert (pad_labels == -1).sum() == 24  # 2 batches of 4, each -> 16


def test_packed_sequence_end_to_end_train(aug_tree, tmp_path, mesh8):
    from surya_tpu.core.config import Config, ModelConfig, TrainConfig
    from surya_tpu.core.metrics import MetricsLogger
    from surya_tpu.data.packed import PackedSequenceSource
    from surya_tpu.train import train_and_evaluate

    aug, flat, out = aug_tree
    build_sequence_dataset(aug, flat, out, seq_len=4, stride=2,
                           image_size=32, splits=("train", "valid"))
    dcfg = DataConfig(seq_root=out, seq_len=4, batch_size=8,
                      image_size=32,
                      packed_dir=str(tmp_path / "seqpack"))
    src = PackedSequenceSource(dcfg)  # build=True packs on first use
    cfg = Config(
        model=ModelConfig(name="ji_3dcnn", num_classes=1, seq_len=4,
                          compute_dtype="float32"),
        data=dcfg,
        train=TrainConfig(epochs=1, lr=1e-3, seed=0))
    summary = train_and_evaluate(cfg, src, mesh=mesh8,
                                 logger=MetricsLogger(echo=False),
                                 checkpoints=False)
    assert np.isfinite(summary["history"][0]["train_loss"])


def test_sequence_end_to_end_train(aug_tree, mesh8):
    from surya_tpu.core.config import Config, ModelConfig, TrainConfig
    from surya_tpu.core.metrics import MetricsLogger
    from surya_tpu.train import train_and_evaluate

    aug, flat, out = aug_tree
    build_sequence_dataset(aug, flat, out, seq_len=4, stride=2,
                           image_size=32, splits=("train", "valid"))
    cfg = Config(
        model=ModelConfig(name="ji_3dcnn", num_classes=1, seq_len=4,
                          compute_dtype="float32"),
        data=DataConfig(seq_root=out, seq_len=4, batch_size=8,
                        image_size=32),
        train=TrainConfig(epochs=1, lr=1e-3, seed=0))
    src = SequenceDataSource(cfg.data)
    summary = train_and_evaluate(cfg, src, mesh=mesh8,
                                 logger=MetricsLogger(echo=False),
                                 checkpoints=False)
    assert np.isfinite(summary["history"][0]["train_loss"])
