"""Reference-artifact ingestion (data/prep/ingest.py): round-trip
against torch-written fixtures in the reference's own formats.

Fixture parity: the `.pt` windows are written exactly as
``cnn+lstm/prepare_sequential_dataset.py:98-104`` does (ImageNet-
normalized float CHW image stacks, float numerical stacks with NaNs,
int label, clip/view strings, ``class_to_idx.json`` at the root); the
per-clip CSVs as ``sqn process/processing_image_sequence.py:443-447``
(extra ``annotated_image_path`` column, arbitrary column order).
"""

import csv
import json
import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from surya_tpu.core.config import DataConfig  # noqa: E402
from surya_tpu.data.augment import IMAGENET_MEAN, IMAGENET_STD  # noqa: E402
from surya_tpu.data.prep.ingest import (  # noqa: E402
    convert_clip_features_csvs,
    convert_pt_windows,
)
from surya_tpu.data.sequences import SequenceDataSource  # noqa: E402
from surya_tpu.features.pose_extended import (  # noqa: E402
    FEATURE_NAMES_EXTENDED,
)

T, H = 3, 32
CLASSES = {"pose_a": 0, "pose_b": 1}


def _normalize(img_u8_hwc: np.ndarray) -> torch.Tensor:
    """torchvision ToTensor+Normalize equivalent (ref :29-34)."""
    x = img_u8_hwc.astype(np.float32) / 255.0
    x = (x - np.asarray(IMAGENET_MEAN, np.float32)) / np.asarray(
        IMAGENET_STD, np.float32)
    return torch.from_numpy(np.transpose(x, (2, 0, 1)))


@pytest.fixture()
def pt_tree(tmp_path):
    """A reference-layout .pt window tree; returns (root, originals)."""
    root = tmp_path / "pt_windows"
    rng = np.random.default_rng(0)
    originals = {}
    with open(root_mk(root) / "class_to_idx.json", "w") as f:
        json.dump(CLASSES, f)
    for split in ("train", "valid"):
        for label, lid in CLASSES.items():
            d = root / split / label
            d.mkdir(parents=True, exist_ok=True)
            for i in range(2):
                imgs_u8 = rng.integers(0, 256, (T, H, H, 3), np.uint8)
                feats = rng.normal(size=(T, 47)).astype(np.float32)
                feats[0, 5] = np.nan  # the reference keeps NaNs on disk
                name = f"video_clip_00{lid}_view_01_seq_{i:05d}"
                torch.save(
                    {"image_sequence": torch.stack(
                        [_normalize(f_) for f_ in imgs_u8]),
                     "numerical_sequence": torch.from_numpy(feats),
                     "label": lid, "video_clip": f"video_clip_00{lid}",
                     "view_id": "01"},
                    d / f"{name}.pt")
                originals[(split, label, name)] = (imgs_u8, feats)
    return root, originals


def root_mk(p):
    p.mkdir(parents=True, exist_ok=True)
    return p


def test_pt_windows_roundtrip(pt_tree, tmp_path):
    root, originals = pt_tree
    out = tmp_path / "npz_windows"
    counts = convert_pt_windows(str(root), str(out))
    assert counts == {"train": 4, "valid": 4}
    assert json.load(open(out / "class_to_idx.json")) == CLASSES

    for (split, label, name), (imgs_u8, feats) in originals.items():
        with np.load(out / split / label / f"{name}.npz") as z:
            # uint8 round trip exact up to the Normalize quantization
            np.testing.assert_allclose(
                z["image_sequence"].astype(np.int32),
                imgs_u8.astype(np.int32), atol=1)
            # features bit-exact, NaNs preserved
            np.testing.assert_array_equal(z["numerical_sequence"], feats)
            assert int(z["label"]) == CLASSES[label]
            assert str(z["video_clip"]) == f"video_clip_00{CLASSES[label]}"
            assert str(z["view_id"]) == "01"

    # conversion is resumable: second run skips but still counts
    assert convert_pt_windows(str(root), str(out)) == counts


def test_converted_windows_feed_sequence_source(pt_tree, tmp_path):
    """The converted tree loads through SequenceDataSource with the
    reference dataloader's semantics (nan_to_num, pad to seq_len)."""
    root, originals = pt_tree
    out = tmp_path / "npz_windows"
    convert_pt_windows(str(root), str(out))
    cfg = DataConfig(seq_root=str(out), seq_len=T, batch_size=4,
                     image_size=H, standardize_features=False)
    src = SequenceDataSource(cfg, splits=("train", "valid"))
    assert src.num_classes == 2
    imgs, feats, labels = next(src.eval_batches("valid"))
    assert imgs.shape == (4, T, H, H, 3) and imgs.dtype == np.uint8
    assert feats.shape == (4, T, 47)
    assert not np.isnan(feats).any()  # nan_to_num (ref dataloader :64-65)
    assert set(labels.tolist()) <= {0, 1}


def _write_reference_csv(path, clip, n_rows, rng, drop_col, extra_col):
    """Reference-style per-clip CSV: meta + annotated_image_path, a
    shuffled column order, one canonical column missing, one bogus."""
    cols = list(FEATURE_NAMES_EXTENDED)
    cols.remove(drop_col)
    header = (["clip_id", "frame_index", "original_image_filename",
               "annotated_image_path"] + cols + [extra_col])
    rows = []
    values = {}
    for i in range(n_rows):
        r = {"clip_id": clip, "frame_index": i,
             "original_image_filename": f"frame_{i:05d}.jpg",
             "annotated_image_path": f"x/{i}.jpg", extra_col: 1.0}
        for c in cols:
            r[c] = float(rng.normal())
        values[i] = dict(r)
        rows.append(r)
    with open(path, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=header)
        w.writeheader()
        w.writerows(rows)
    return values


def test_clip_csv_normalization(tmp_path):
    rng = np.random.default_rng(1)
    processed = tmp_path / "processed"
    (processed / "train").mkdir(parents=True)
    drop_col, extra_col = "LM5_norm_z", "SOME_LEGACY_COL"
    values = _write_reference_csv(
        processed / "train" / "video_clip_001_features.csv",
        "video_clip_001", 4, rng, drop_col, extra_col)

    out = tmp_path / "canonical"
    report = convert_clip_features_csvs(str(processed), str(out))
    assert report["train"] == {"video_clip_001": 4}
    assert report["_dropped_columns"] == [extra_col]

    with open(out / "train" / "video_clip_001_features.csv",
              newline="") as f:
        got = list(csv.DictReader(f))
    assert list(got[0]) == (["clip_id", "frame_index",
                             "original_image_filename"]
                            + list(FEATURE_NAMES_EXTENDED))
    for i, r in enumerate(got):
        assert r["clip_id"] == "video_clip_001"
        assert np.isnan(float(r[drop_col]))  # missing column → NaN
        for c in ("LM0_norm_x", "LEFT_ELBOW_ANGLE", "TORSO_VAR_XY_RATIO"):
            assert float(r[c]) == pytest.approx(values[i][c], rel=1e-5)


def test_ingest_cli(pt_tree, tmp_path, capsys):
    from surya_tpu.data.prep.ingest import main

    root, _ = pt_tree
    out = tmp_path / "cli_out"
    assert main(["pt-windows", str(root), str(out)]) == 0
    payload = json.loads(capsys.readouterr().out.strip())
    assert payload["converted"] == {"train": 4, "valid": 4}
    assert os.path.isdir(out / "train" / "pose_a")
