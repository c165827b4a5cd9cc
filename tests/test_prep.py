"""Offline prep layer: renaming → still-image prep → sequence CSVs."""

import csv
import json
import os

import numpy as np
import pytest

from surya_tpu.data.prep.frame_renaming import (
    extract_video_id,
    load_frame_map,
    natural_sort_key,
    rename_frames,
)


def test_natural_sort():
    names = ["frame10.jpg", "frame2.jpg", "frame1.jpg"]
    assert sorted(names, key=natural_sort_key) == [
        "frame1.jpg", "frame2.jpg", "frame10.jpg"]


def test_extract_video_id():
    assert extract_video_id("yoga_vid_mp4-00123_jpg.rf.abc.jpg") == \
        "yoga_vid"
    assert extract_video_id("myvideo.mp4") == "myvideo"
    assert extract_video_id("clipx.rf.hash.jpg") == "clipx"


@pytest.fixture
def raw_tree(tmp_path):
    from PIL import Image

    rng = np.random.default_rng(0)
    raw = tmp_path / "raw"
    originals = {}
    for split in ["train", "valid"]:
        for clip in ["video_clip_001", "video_clip_002"]:
            d = raw / split / clip
            d.mkdir(parents=True)
            names = [f"srcvid_mp4-{i:05d}_jpg.rf.h{i}.jpg"
                     for i in [10, 2, 1]]  # unsorted on purpose
            originals[(split, clip)] = sorted(names,
                                              key=natural_sort_key)
            for nm in names:
                Image.fromarray(rng.integers(0, 255, (24, 24, 3),
                                             np.uint8)).save(d / nm)
    return str(raw), originals


def test_rename_frames(raw_tree, tmp_path):
    raw, originals = raw_tree
    out = str(tmp_path / "renamed")
    report = rename_frames(raw, out)
    assert report["train"]["video_clip_001"] == 3
    files = sorted(os.listdir(os.path.join(out, "train",
                                           "video_clip_001")))
    assert "frame_00001.jpg" in files and "frame_00003.jpg" in files
    fmap = load_frame_map(os.path.join(out, "train", "video_clip_001"),
                          "video_clip_001")
    # natural order: ...-00001 → frame_00001
    assert fmap["frame_00001.jpg"] == originals[("train",
                                                 "video_clip_001")][0]


def _fake_extractor(image_path):
    """Deterministic landmarks from the path hash; always detected."""
    h = abs(hash(image_path)) % 1000 / 1000.0
    lm = np.full((33, 4), h, np.float32)
    lm[:, 3] = 0.9
    lm[11, 0] += 0.3  # non-degenerate shoulders/hips
    lm[23, 1] += 0.4
    return lm, True


def test_still_image_prep_end_to_end(raw_tree, tmp_path):
    from surya_tpu.data.dataset import DiskDataSource, scan_image_dataset
    from surya_tpu.data.prep.still_image_dataset import (
        prepare_still_image_dataset,
    )
    from surya_tpu.core.config import DataConfig

    raw, originals = raw_tree
    renamed = str(tmp_path / "renamed")
    rename_frames(raw, renamed)

    # label CSV over ORIGINAL filenames
    label_csv = tmp_path / "labels.csv"
    rows = []
    for (split, clip), names in originals.items():
        for i, nm in enumerate(names):
            rows.append({"filename": nm,
                         "label": "cobra" if i % 2 == 0 else "plank"})
    rows.append({"filename": "unlabeled.jpg", "label": "nan"})
    with open(label_csv, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["filename", "label"])
        w.writeheader()
        w.writerows(rows)

    out = str(tmp_path / "flat")
    counts = prepare_still_image_dataset(
        renamed, out, [str(label_csv)], extractor=_fake_extractor)
    assert counts["train"] == 6 and counts["valid"] == 6

    with open(os.path.join(out, "class_feature_means.json")) as f:
        means = json.load(f)
    assert set(means) == {"cobra", "plank"}
    assert len(means["cobra"]) == 47

    # the flat output is directly consumable by DiskDataSource
    paths, fpaths, labels, classes = scan_image_dataset(out, "train")
    assert classes == ["cobra", "plank"] and len(paths) == 6
    src = DiskDataSource(DataConfig(data_root=out, batch_size=4,
                                    image_size=32),
                         splits=("train", "valid"), staging_size=24)
    imgs, feats, lab = next(iter(src.train_batches(0)))
    assert feats.shape == (4, 47)
    assert np.isfinite(feats).any()


def test_sequence_csv_builder(tmp_path):
    from PIL import Image

    from surya_tpu.data.prep.sequence_csv import (
        create_dataset_sequences,
        organize_by_video,
    )

    rng = np.random.default_rng(0)
    processed = tmp_path / "processed" / "train"
    renamed = tmp_path / "renamed" / "train" / "clip_a"
    processed.mkdir(parents=True)
    renamed.mkdir(parents=True)

    img_dir = processed / "clip_a_annotated_images"
    img_dir.mkdir()
    feat_rows, map_rows = [], []
    for i in range(12):
        new = f"frame_{i + 1:05d}.jpg"
        orig = f"vidA_mp4-{i:05d}_jpg.rf.h{i}.jpg"
        map_rows.append({"new_filename": new, "original_filename": orig,
                         "clip_name": "clip_a", "split": "train"})
        feat_rows.append({"clip_id": "clip_a", "frame_index": i,
                          "original_image_filename": new,
                          "f0": rng.normal(), "f1": rng.normal()})
        Image.fromarray(rng.integers(0, 255, (16, 16, 3),
                                     np.uint8)).save(
            img_dir / f"frame_{i + 1:05d}_annotated.jpg")
    with open(processed / "clip_a_features.csv", "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(feat_rows[0]))
        w.writeheader()
        w.writerows(feat_rows)
    with open(renamed / "clip_a_frame_map.csv", "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(map_rows[0]))
        w.writeheader()
        w.writerows(map_rows)

    labels_csv = tmp_path / "labels.csv"
    with open(labels_csv, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["filename", "label"])
        w.writeheader()
        for r in map_rows:
            w.writerow({"filename": r["original_filename"],
                        "label": "cobra"})

    out = str(tmp_path / "seqds")
    counts = create_dataset_sequences(
        str(tmp_path / "processed"), str(tmp_path / "renamed"),
        [str(labels_csv)], out, seq_len=10)
    # 12 frames, window 10 stride 1 → 3 sequences
    assert counts["train"] == 3
    seq0 = os.path.join(out, "train", "cobra", "sequence_00000")
    feats = np.load(os.path.join(seq0, "features.npy"))
    assert feats.shape == (10, 2)
    assert len(os.listdir(os.path.join(seq0, "images"))) == 10
    with open(os.path.join(out, "dataset_metadata.json")) as f:
        meta = json.load(f)
    assert len(meta) == 3 and meta[0]["source_video_id"] == "vidA"

    # video-level splitting keeps a video's clips together
    assign = organize_by_video({"c1": "vidA", "c2": "vidA",
                                "c3": "vidB", "c4": "vidC"})
    assert assign["c1"] == assign["c2"]


def test_reorganize_to_flat(tmp_path):
    from PIL import Image

    from surya_tpu.data.prep.reorganize import reorganize_to_flat

    rng = np.random.default_rng(0)
    seq_root = tmp_path / "seqds"
    d = seq_root / "train" / "cobra" / "sequence_00000" / "images"
    d.mkdir(parents=True)
    for i in range(3):
        Image.fromarray(rng.integers(0, 255, (8, 8, 3),
                                     np.uint8)).save(d / f"f{i}.jpg")
    out = str(tmp_path / "flat")
    counts = reorganize_to_flat(str(seq_root), out)
    assert counts["train"] == 3
    files = os.listdir(os.path.join(out, "train", "cobra"))
    assert "sequence_00000_f0.jpg" in files


def test_sequence_features_csv(tmp_path):
    from PIL import Image

    from surya_tpu.data.prep.frame_renaming import rename_frames
    from surya_tpu.data.prep.sequence_features import process_image_sequences
    from surya_tpu.features.pose_extended import FEATURE_NAMES_EXTENDED

    rng = np.random.default_rng(0)
    raw = tmp_path / "raw" / "train" / "clip_a"
    raw.mkdir(parents=True)
    for i in range(4):
        Image.fromarray(rng.integers(0, 255, (32, 48, 3),
                                     np.uint8)).save(
            raw / f"vid-{i:05d}_jpg.rf.h.jpg")
    renamed = str(tmp_path / "renamed")
    rename_frames(str(tmp_path / "raw"), renamed)

    def fake_extractor(p):
        lm = rng.uniform(0.2, 0.8, (33, 4)).astype(np.float32)
        lm[:, 3] = 0.9
        return lm, True

    out = str(tmp_path / "processed")
    rep = process_image_sequences(renamed, out,
                                  extractor=fake_extractor,
                                  annotate=True)
    assert rep["train"]["clip_a"] == 4
    csv_path = os.path.join(out, "train", "clip_a_features.csv")
    with open(csv_path) as f:
        rows = list(csv.DictReader(f))
    assert len(rows) == 4
    assert set(FEATURE_NAMES_EXTENDED) <= set(rows[0])
    assert rows[2]["frame_index"] == "2"
    # dynamics are NaN for the first two frames, present from frame 2
    assert rows[0]["LM0_vx_px"] == "nan"
    assert rows[2]["LM0_vx_px"] != "nan"
    ann = os.path.join(out, "train", "clip_a_annotated_images")
    assert len(os.listdir(ann)) == 4


def test_still_image_prep_extended(raw_tree, tmp_path):
    from surya_tpu.data.prep.still_image_dataset import (
        prepare_still_image_dataset,
    )

    raw, originals = raw_tree
    renamed = str(tmp_path / "renamed")
    rename_frames(raw, renamed)
    label_csv = tmp_path / "labels.csv"
    with open(label_csv, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["filename", "label"])
        w.writeheader()
        for (split, clip), names in originals.items():
            for nm in names:
                w.writerow({"filename": nm, "label": "cobra"})

    out = str(tmp_path / "flat_ext")
    counts = prepare_still_image_dataset(
        renamed, out, [str(label_csv)], extractor=_fake_extractor,
        feature_set="extended")
    assert counts["train"] == 6
    npys = [f for f in os.listdir(os.path.join(out, "train", "cobra"))
            if f.endswith(".npy")]
    arr = np.load(os.path.join(out, "train", "cobra", npys[0]))
    assert arr.shape == (443,)
    with open(os.path.join(out, "class_feature_means.json")) as f:
        means = json.load(f)
    assert len(means["cobra"]) == 443


def test_sequence_standardization(tmp_path):
    import jax

    from surya_tpu.core.config import DataConfig
    from surya_tpu.data.imputation import ClassFeatureStats
    from surya_tpu.data.sequences import SequenceDataSource

    # minimal .npz windows + class map
    import json as _json
    root = tmp_path / "seq"
    (root / "train" / "cobra").mkdir(parents=True)
    (root / "class_to_idx.json").write_text(_json.dumps({"cobra": 0}))
    rng = np.random.default_rng(0)
    np.savez_compressed(
        root / "train" / "cobra" / "w0.npz",
        image_sequence=rng.integers(0, 255, (4, 8, 8, 3), np.uint8),
        numerical_sequence=np.full((4, 47), 5.0, np.float32),
        label=0, video_clip="c", view_id="01")

    means = np.full((1, 47), 3.0, np.float32)
    stds = np.full((1, 47), 2.0, np.float32)
    stats = ClassFeatureStats(means, stds, ["cobra"])
    cfg = DataConfig(seq_root=str(root), seq_len=4, batch_size=1,
                     image_size=8, standardize_features=True)
    src = SequenceDataSource(cfg, splits=("train",), stats=stats)
    batch = next(iter(src.train_batches(0)))
    out = src.device_transform("train", jax.random.key(0), batch)
    # (5 - 3) / (2 + 1e-6) ≈ 1.0 per timestep
    np.testing.assert_allclose(np.asarray(out[1]), 1.0, rtol=1e-4)
