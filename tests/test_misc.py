"""Small coverage tests: logger files, config serialization, misc edges."""

import json
import os

import numpy as np

import jax.numpy as jnp

from surya_tpu.core.config import Config, get_preset
from surya_tpu.core.metrics import MetricsLogger


def test_metrics_logger_writes_jsonl(tmp_path):
    path = str(tmp_path / "m" / "metrics.jsonl")
    log = MetricsLogger(path, echo=False)
    log.log({"epoch": 0, "loss": jnp.float32(1.5),
             "vec": np.asarray([1, 2])})
    log.log({"event": "test", "acc": 0.5})
    log.close()
    lines = [json.loads(ln) for ln in open(path)]
    assert len(lines) == 2
    assert lines[0]["loss"] == 1.5 and lines[0]["vec"] == [1, 2]
    assert "ts" in lines[1]


def test_config_json_roundtrip():
    cfg = get_preset("quadtree-fusion")
    d = json.loads(cfg.to_json())
    assert d["model"]["name"] == "quadtree"
    assert d["train"]["lr"] == 1e-4
    # replace() keeps other sections
    cfg2 = cfg.replace(name="x")
    assert cfg2.model.name == "quadtree" and cfg2.name == "x"
    assert isinstance(cfg, Config)


def test_background_target_clips_filter(tmp_path):
    import csv

    from PIL import Image

    from surya_tpu.augmentgen.background import process_pipeline
    from surya_tpu.data.prep.frame_renaming import rename_frames

    rng = np.random.default_rng(0)
    for clip in ["clip_a", "clip_b"]:
        d = tmp_path / "raw" / "train" / clip
        d.mkdir(parents=True)
        Image.fromarray(rng.integers(0, 255, (8, 8, 3),
                                     np.uint8)).save(d / "f-00001.jpg")
    renamed = str(tmp_path / "renamed")
    rename_frames(str(tmp_path / "raw"), renamed)
    labels_csv = tmp_path / "l.csv"
    with open(labels_csv, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["filename", "label"])
        w.writeheader()
        w.writerow({"filename": "f-00001.jpg", "label": "cobra"})

    calls = []

    def fake(src, dst):
        calls.append(src)
        Image.open(src).save(dst)

    r = process_pipeline(renamed, [str(labels_csv)],
                         str(tmp_path / "out"),
                         target_clips=["clip_a"], remove_fn=fake)
    # only clip_a processed (TARGET_CLIPS semantics, ref :19)
    assert r["train"]["done"] == 1
    assert all("clip_a" in c for c in calls)


def test_video_inference_batch_larger_than_frames(tmp_path):
    import pytest

    cv2 = pytest.importorskip("cv2")

    import jax

    from surya_tpu.core.config import ModelConfig
    from surya_tpu.infer.video import run_video_inference
    from surya_tpu.models import get_model

    path = str(tmp_path / "v.mp4")
    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 5,
                        (32, 32))
    rng = np.random.default_rng(0)
    for _ in range(3):
        w.write(rng.integers(0, 255, (32, 32, 3), np.uint8))
    w.release()

    cfg = ModelConfig(name="quadtree", mode="numerical_only",
                      num_classes=2, compute_dtype="float32",
                      use_pallas=False)
    model = get_model(cfg)
    variables = model.init({"params": jax.random.key(0)},
                           jnp.zeros((1, 32, 32, 3)), jnp.zeros((1, 47)),
                           train=False)

    def fake_extractor(p):
        return np.full((33, 4), 0.5, np.float32), True

    recs = run_video_inference(cfg, variables, path, ["a", "b"],
                               extractor=fake_extractor, batch_size=16,
                               image_size=32)
    assert len(recs) == 3  # batch > frame count handled


def test_compilation_cache_toggle(tmp_path, monkeypatch):
    """core/cache.py: enables the persistent XLA cache at the given
    dir; SURYA_NO_COMPILE_CACHE opts out."""
    import jax

    from surya_tpu.core.cache import enable_compilation_cache

    prev = jax.config.jax_compilation_cache_dir
    try:
        d = str(tmp_path / "xla")
        assert enable_compilation_cache(d) == d
        assert jax.config.jax_compilation_cache_dir == d
        assert os.path.isdir(d)

        monkeypatch.setenv("SURYA_NO_COMPILE_CACHE", "1")
        assert enable_compilation_cache(str(tmp_path / "nope")) is None
        assert not os.path.exists(str(tmp_path / "nope"))
    finally:
        jax.config.update("jax_compilation_cache_dir", prev)
