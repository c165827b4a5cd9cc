"""CLI (python -m surya_tpu) in-process tests."""

import json
import os
import sys

import numpy as np

from surya_tpu.__main__ import cmd_cam, cmd_eval, cmd_list_presets, cmd_train


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


def test_main_unknown_command(capsys):
    from surya_tpu.__main__ import main

    old = sys.argv
    try:
        sys.argv = ["surya_tpu", "frobnicate"]
        assert main() == 1
    finally:
        sys.argv = old
