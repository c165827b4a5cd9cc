"""End-to-end L2→L3→L6 integration: multiview generation → sequence
windows → one temporal train step (round-5 VERDICT item 8).

Pins the view-file contract the augmentation-value A/B exercised by
script: ``augmentgen.multiview.process_augmentation`` writes
``<base>_view_NN.png`` files (``Zero123/batch_aug.py:110-148``) that
``data/sequences.py`` must group per (clip, view) via the reference's
filename regex (``cnn+lstm/prepare_sequential_dataset.py:141``), and
the resulting ``.npz`` windows must feed the real train loop. If the
naming contract on either side drifts, this test fails.

The injected ``generate_fn`` is an in-plane camera-transform oracle
(affine transforms of the real input image, tiled into a grid) — the
same "novel views of the same content" capability the Zero123 stage
supplies, with no pretrained weights.
"""

import json
import os

import numpy as np
import pytest

from surya_tpu.augmentgen.multiview import process_augmentation
from surya_tpu.data.sequences import (
    FILENAME_PATTERN,
    SequenceDataSource,
    build_sequence_dataset,
)

LABELS = ("cobra pose", "plank pose")
CLIPS = ("video_clip_001", "video_clip_002")
FRAMES = 6
SIZE = 32


def _camera_oracle(image):
    """1×2 grid of in-plane novel views (rotation + scale) of the
    input — a weight-free stand-in for the diffusion generator."""
    from PIL import Image

    w, h = image.size
    views = [
        image.rotate(15, resample=Image.BILINEAR),
        image.resize((int(w * 1.3), int(h * 1.3))).crop(
            (w // 6, h // 6, w // 6 + w, h // 6 + h)),
    ]
    grid = Image.new("RGB", (2 * w, h))
    for i, v in enumerate(views):
        grid.paste(v.resize((w, h)), (i * w, 0))
    return grid


@pytest.fixture
def clean_tree(tmp_path):
    """Clean frames + flat 47-dim npy features, reference layout."""
    from PIL import Image

    clean = tmp_path / "clean"
    flat = tmp_path / "flat"
    rng = np.random.default_rng(0)
    for split in ("train", "valid", "test"):
        for li, label in enumerate(LABELS):
            (clean / split / label).mkdir(parents=True)
            (flat / split / label).mkdir(parents=True)
            for clip in CLIPS:
                for t in range(FRAMES):
                    arr = rng.integers(0, 255, (SIZE, SIZE, 3),
                                       np.uint8)
                    arr[:, :, li] //= 2  # weak class tint
                    Image.fromarray(arr).save(
                        clean / split / label /
                        f"{clip}_frame_{t:05d}.jpg.png")
                    np.save(flat / split / label /
                            f"{clip}_frame_{t:05d}_frame_{t:05d}.npy",
                            rng.normal(size=47).astype(np.float32))
    return clean, flat


def test_multiview_to_sequences_to_train_step(clean_tree, tmp_path,
                                              mesh8):
    from surya_tpu.core.config import (
        Config,
        DataConfig,
        ModelConfig,
        TrainConfig,
    )
    from surya_tpu.core.metrics import MetricsLogger
    from surya_tpu.train import train_and_evaluate

    clean, flat = clean_tree
    aug = tmp_path / "aug"

    # L2: generate novel views for the TRAIN split only (the A/B
    # protocol: eval stays view-00) via the real augmentation walker.
    report = process_augmentation(str(clean), str(aug),
                                  generate_fn=_camera_oracle,
                                  rows=1, cols=2, splits=("train",))
    assert report["train"]["generated"] == \
        len(LABELS) * len(CLIPS) * FRAMES

    # Originals enter the augmented tree as view 00 (the convention
    # the A/B and the reference's dataloader share: the clean frame is
    # a view like any other).
    import shutil
    for split in ("train", "valid", "test"):
        for label in LABELS:
            src = clean / split / label
            dst = aug / split / label
            dst.mkdir(parents=True, exist_ok=True)
            for f in os.listdir(src):
                base = os.path.splitext(f)[0]
                shutil.copy(src / f, dst / f"{base}_view_00.png")

    # every generated filename honors the reference regex
    for f in os.listdir(aug / "train" / LABELS[0]):
        assert FILENAME_PATTERN.match(f), f

    # L3: windowed sequence dataset (SEQ_LEN=4, STRIDE=2 —
    # prepare_sequential_dataset.py:22-23).
    seq_root = tmp_path / "seq"
    counts = build_sequence_dataset(str(aug), str(flat), str(seq_root),
                                    seq_len=4, stride=2,
                                    image_size=SIZE)
    # per (clip, view): frames 0..5 → windows at 0 and 2
    per_clip_windows = 2
    assert counts["train"] == (len(LABELS) * len(CLIPS) * 3
                               * per_clip_windows)  # views 00,01,02
    assert counts["valid"] == (len(LABELS) * len(CLIPS)
                               * per_clip_windows)  # view 00 only
    with open(seq_root / "class_to_idx.json") as f:
        assert sorted(json.load(f)) == sorted(LABELS)

    # L6: one real temporal train run over the windows.
    dcfg = DataConfig(seq_root=str(seq_root), batch_size=8,
                      image_size=SIZE, seq_len=4)
    cfg = Config(model=ModelConfig(name="cnn_lstm", num_classes=2,
                                   seq_len=4, compute_dtype="float32",
                                   freeze_backbone=True),
                 data=dcfg,
                 train=TrainConfig(epochs=1, lr=1e-3, seed=0))
    data = SequenceDataSource(dcfg, pad_eval_to=mesh8.shape["data"])
    summary = train_and_evaluate(cfg, data, mesh=mesh8,
                                 logger=MetricsLogger(echo=False),
                                 checkpoints=False)
    assert "test" in summary
    assert np.isfinite(summary["history"][0]["val_loss"])
