"""CLI (python -m surya_tpu) in-process tests."""

import json
import os
import sys

import numpy as np

from surya_tpu.__main__ import (
    cmd_cam,
    cmd_compare,
    cmd_eval,
    cmd_list_presets,
    cmd_train,
)


def test_list_presets(capsys):
    assert cmd_list_presets() == 0
    out = capsys.readouterr().out
    assert "quadtree-fusion" in out and "fact" in out


def test_train_and_eval_cli(tmp_path, capsys):
    out_dir = str(tmp_path / "run")
    rc = cmd_train([
        "--preset", "quadtree-fusion", "--synthetic", "--out", out_dir,
        "--plot", "--tensorboard",
        "--train.epochs=2", "--model.num_classes=3",
        "--model.freeze_backbone=true", "--data.image_size=32",
        "--data.synthetic_size=24", "--data.batch_size=8",
        "--train.lr=3e-3",
    ])
    assert rc == 0
    captured = capsys.readouterr().out.strip().splitlines()
    result = json.loads(captured[-1])
    assert "test" in result and 0 <= result["test"]["accuracy"] <= 1
    for artifact in ["config.json", "metrics.jsonl", "history.png",
                     "confusion.png"]:
        assert os.path.exists(os.path.join(out_dir, artifact)), artifact
    assert os.path.isdir(os.path.join(out_dir, "ckpt"))
    # --tensorboard mirrored scalars into OUT/tb (SURVEY §5.5)
    tb_files = os.listdir(os.path.join(out_dir, "tb"))
    assert any("events" in f for f in tb_files), tb_files

    # eval the produced checkpoint through the CLI
    rc = cmd_eval([
        os.path.join(out_dir, "ckpt"),
        "--preset", "quadtree-fusion", "--synthetic", "--split", "valid",
        "--model.num_classes=3", "--data.image_size=32",
        "--data.synthetic_size=24", "--data.batch_size=8",
    ])
    assert rc == 0
    result = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert np.isfinite(result["loss"])

    # batch Grad-CAM overlays from the same checkpoint via the CLI
    cam_dir = str(tmp_path / "cams")
    rc = cmd_cam([
        os.path.join(out_dir, "ckpt"),
        "--preset", "quadtree-fusion", "--synthetic", "--out", cam_dir,
        "--limit", "1",
        "--model.num_classes=3", "--data.image_size=32",
        "--data.synthetic_size=24", "--data.batch_size=8",
    ])
    assert rc == 0
    jpgs = [f for root, _, fs in os.walk(cam_dir)
            for f in fs if f.endswith("_cam.jpg")]
    assert jpgs, "no CAM overlays written"
    assert all("_pred_" in f for f in jpgs)

    # compare tier through the CLI (analysis.py:33-167 as a command):
    # same checkpoint under two entry names, synthetic source
    cmp_dir = str(tmp_path / "cmp")
    rc = cmd_compare([
        f"qt_a={os.path.join(out_dir, 'ckpt')}:quadtree-fusion",
        f"qt_b={os.path.join(out_dir, 'ckpt')}:quadtree-fusion",
        "--split", "valid", "--out", cmp_dir,
        "--data.synthetic=true", "--model.num_classes=3",
        "--data.image_size=32", "--data.synthetic_size=24",
        "--data.batch_size=8",
    ])
    assert rc == 0
    summary = json.loads(
        capsys.readouterr().out.strip().splitlines()[-1])
    assert set(summary) == {"qt_a", "qt_b"}
    assert summary["qt_a"]["accuracy"] == summary["qt_b"]["accuracy"]
    assert "r2" in summary["qt_a"]
    assert os.path.exists(os.path.join(cmp_dir, "comparison.json"))
    assert os.path.exists(os.path.join(cmp_dir, "comparison.png"))
    assert os.path.exists(os.path.join(cmp_dir, "confusion_qt_a.png"))


def test_pose_train_cli(tmp_path, capsys):
    """pose-train end to end at reduced geometry: trains on the
    on-device generator, writes JSONL + summary + a self-describing
    checkpoint that load_pose_extractor reads with no config."""
    from surya_tpu.__main__ import cmd_pose_train

    out_dir = str(tmp_path / "pose")
    rc = cmd_pose_train(["--steps", "4", "--batch", "4",
                         "--image-size", "48", "--width", "8",
                         "--out", out_dir])
    assert rc == 0
    summary = json.loads(
        open(os.path.join(out_dir, "summary.json")).read())
    assert summary["width"] == 8 and summary["image_size"] == 48
    assert os.path.exists(os.path.join(out_dir, "train.jsonl"))

    from surya_tpu.models.pose import load_pose_extractor

    ext = load_pose_extractor(summary["checkpoint"],
                              detection_threshold=-1.0)
    lm, det = ext.process_array(
        np.zeros((32, 32, 3), np.uint8))
    assert lm.shape == (33, 4) and det


def test_main_unknown_command(capsys):
    from surya_tpu.__main__ import main

    old = sys.argv
    try:
        sys.argv = ["surya_tpu", "frobnicate"]
        assert main() == 1
    finally:
        sys.argv = old
