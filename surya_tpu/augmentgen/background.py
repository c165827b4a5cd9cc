"""Offline background removal stage.

Parity with ``Background_remove/batch_remove_background.py:22-128``:
for the target clips, look up each frame's label through the master
label CSVs + per-clip frame maps, run background removal, and save a
transparent PNG to ``<out>/<split>/<label>/`` — skipping outputs that
already exist (restartable, ``:106-107``).

rembg (onnxruntime) is a gated host-side dependency; ``remove_fn`` is
injectable so the batch logic tests without it.
"""

from __future__ import annotations

import os
from typing import Callable

from surya_tpu.data.prep.frame_renaming import load_frame_map
from surya_tpu.data.prep.still_image_dataset import load_labels


def rembg_remove_fn() -> Callable:
    try:
        from rembg import remove
    except ImportError as e:  # pragma: no cover
        raise ImportError(
            "rembg is required for background removal; install it or "
            "inject remove_fn") from e

    from PIL import Image

    def fn(src_path: str, dst_path: str):
        with Image.open(src_path) as im:
            out = remove(im)
            out.save(dst_path)

    return fn


def process_pipeline(renamed_root: str, label_csvs: list[str],
                     out_root: str, target_clips: list[str] | None = None,
                     remove_fn: Callable | None = None,
                     splits=("train", "valid", "test")) -> dict:
    """Returns {split: {"done": n, "skipped": n}}. Resumable."""
    remove_fn = remove_fn or rembg_remove_fn()
    labels = load_labels(label_csvs)
    report: dict = {}
    for split in splits:
        split_dir = os.path.join(renamed_root, split)
        if not os.path.isdir(split_dir):
            continue
        done = skipped = 0
        for clip in sorted(os.listdir(split_dir)):
            if target_clips and clip not in target_clips:
                continue
            clip_dir = os.path.join(split_dir, clip)
            if not os.path.isdir(clip_dir):
                continue
            try:
                fmap = load_frame_map(clip_dir, clip)
            except FileNotFoundError:
                continue
            for new_name, original in sorted(fmap.items()):
                label = labels.get(original)
                if label is None:
                    continue
                dest_dir = os.path.join(out_root, split, label)
                os.makedirs(dest_dir, exist_ok=True)
                stem = os.path.splitext(new_name)[0]
                dst = os.path.join(dest_dir, f"{clip}_{stem}.png")
                if os.path.exists(dst):   # resume (ref :106-107)
                    skipped += 1
                    continue
                remove_fn(os.path.join(clip_dir, new_name), dst)
                done += 1
        report[split] = {"done": done, "skipped": skipped}
    return report
