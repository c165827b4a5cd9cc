"""Auxiliary components: featmaps viz, plotting, augmentgen, video infer."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from surya_tpu.core.config import ModelConfig
from surya_tpu.models import get_model


def test_hierarchy_maps_and_plot(tmp_path):
    from surya_tpu.interpret.featmaps import hierarchy_maps, plot_hierarchy

    cfg = ModelConfig(name="hierarchical_quadtree", num_classes=4,
                      compute_dtype="float32")
    model = get_model(cfg)
    imgs = jnp.asarray(np.random.default_rng(0).normal(
        size=(2, 160, 160, 3)), jnp.float32)
    feats = jnp.zeros((2, 47))
    variables = model.init({"params": jax.random.key(0)}, imgs, feats,
                           train=False)
    maps = hierarchy_maps(cfg, variables, imgs)
    assert maps["base"].shape == (2, 20, 20)     # 160/8
    assert maps["level1"].shape == (2, 4, 10, 10)
    assert maps["level2"].shape == (2, 16, 5, 5)
    out = plot_hierarchy(maps, 0, str(tmp_path / "h.png"))
    assert os.path.exists(out)


def test_plotting(tmp_path):
    from surya_tpu.utils.plotting import (
        plot_confusion_matrix,
        plot_history,
        plot_model_comparison,
    )

    hist = [{"epoch": i, "train_loss": 1 / (i + 1), "val_loss": 1.2 / (i + 1),
             "train_accuracy": i / 10, "val_accuracy": i / 12}
            for i in range(5)]
    p1 = plot_history(hist, str(tmp_path / "hist.png"), best_epoch=3)
    cm = np.array([[5, 1], [2, 7]])
    p2 = plot_confusion_matrix(cm, ["a", "b"], str(tmp_path / "cm.png"))
    p3 = plot_model_comparison(
        {"quadtree": {"accuracy": 0.97, "f1": 0.97},
         "resnet18": {"accuracy": 0.96, "f1": 0.96}},
        str(tmp_path / "cmp.png"))
    for p in (p1, p2, p3):
        assert os.path.getsize(p) > 0


def test_grid_slicer():
    from PIL import Image

    from surya_tpu.augmentgen.multiview import slice_grid_in_memory

    grid = np.zeros((30, 20, 3), np.uint8)
    for r in range(3):
        for c in range(2):
            grid[r * 10:(r + 1) * 10, c * 10:(c + 1) * 10] = (r * 2 + c) * 40
    views = slice_grid_in_memory(Image.fromarray(grid))
    assert len(views) == 6
    for i, v in enumerate(views):
        assert v.size == (10, 10)
        assert np.asarray(v)[0, 0, 0] == i * 40  # row-major order


def test_multiview_resume(tmp_path):
    from PIL import Image

    from surya_tpu.augmentgen.multiview import process_augmentation

    clean = tmp_path / "clean" / "train" / "cobra"
    clean.mkdir(parents=True)
    Image.fromarray(np.zeros((8, 8, 3), np.uint8)).save(
        clean / "img1.png")
    calls = []

    def fake_gen(img):
        calls.append(1)
        return Image.fromarray(np.zeros((30, 20, 3), np.uint8))

    out = str(tmp_path / "aug")
    r1 = process_augmentation(str(tmp_path / "clean"), out,
                              generate_fn=fake_gen)
    assert r1["train"]["generated"] == 1 and len(calls) == 1
    assert sorted(os.listdir(os.path.join(out, "train", "cobra"))) == [
        f"img1_view_{i:02d}.png" for i in range(1, 7)]
    # second run: resume skips, no new generate calls
    r2 = process_augmentation(str(tmp_path / "clean"), out,
                              generate_fn=fake_gen)
    assert r2["train"]["skipped"] == 1 and len(calls) == 1


def test_background_removal_batch(tmp_path):
    from PIL import Image

    from surya_tpu.augmentgen.background import process_pipeline
    from surya_tpu.data.prep.frame_renaming import rename_frames

    rng = np.random.default_rng(0)
    raw = tmp_path / "raw" / "train" / "clip_a"
    raw.mkdir(parents=True)
    for nm in ["vidA-00001_jpg.rf.x.jpg", "vidA-00002_jpg.rf.y.jpg"]:
        Image.fromarray(rng.integers(0, 255, (8, 8, 3),
                                     np.uint8)).save(raw / nm)
    renamed = str(tmp_path / "renamed")
    rename_frames(str(tmp_path / "raw"), renamed)

    import csv

    labels_csv = tmp_path / "labels.csv"
    with open(labels_csv, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["filename", "label"])
        w.writeheader()
        w.writerow({"filename": "vidA-00001_jpg.rf.x.jpg",
                    "label": "cobra"})
        w.writerow({"filename": "vidA-00002_jpg.rf.y.jpg",
                    "label": "cobra"})

    def fake_remove(src, dst):
        Image.open(src).save(dst)

    out = str(tmp_path / "clean")
    r = process_pipeline(renamed, [str(labels_csv)], out,
                         remove_fn=fake_remove)
    assert r["train"]["done"] == 2
    r2 = process_pipeline(renamed, [str(labels_csv)], out,
                          remove_fn=fake_remove)
    assert r2["train"]["skipped"] == 2


def test_video_inference(tmp_path):
    cv2 = pytest.importorskip("cv2")

    from surya_tpu.infer.video import run_video_inference

    # tiny synthetic video
    path = str(tmp_path / "v.mp4")
    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 5,
                        (64, 64))
    rng = np.random.default_rng(0)
    for _ in range(7):
        w.write(rng.integers(0, 255, (64, 64, 3), np.uint8))
    w.release()

    cfg = ModelConfig(name="quadtree", mode="fusion", num_classes=3,
                      compute_dtype="float32", use_pallas=False)
    model = get_model(cfg)
    variables = model.init({"params": jax.random.key(0)},
                           jnp.zeros((1, 64, 64, 3)), jnp.zeros((1, 47)),
                           train=False)

    def fake_extractor(p):
        lm = np.random.default_rng(1).uniform(0, 1, (33, 4)).astype(
            np.float32)
        return lm, True

    out = str(tmp_path / "annot.mp4")
    recs = run_video_inference(cfg, variables, path,
                               ["a", "b", "c"], output_path=out,
                               extractor=fake_extractor, batch_size=4,
                               image_size=64)
    assert len(recs) == 7
    assert all(r["label"] in "abc" for r in recs)
    assert os.path.getsize(out) > 0
