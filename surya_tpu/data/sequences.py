"""Sliding-window sequence dataset: builder + loading source.

Builder parity with ``cnn+lstm/prepare_sequential_dataset.py`` (==
``VIT/prepare_sequential_dataset.py``): groups augmented frames by
(clip, view) via the same filename regex (``:141``), slides a window of
SEQ_LEN with STRIDE (``:22-23,46-47``), labels each window by its LAST
frame (``:52-54``), joins numerical ``.npy`` vectors from the flat
dataset by (clip, frame-idx) (``:159-172``) with zero-fill for missing
files (``:86-88``), resumes by skipping existing outputs (``:72-74``),
and emits ``class_to_idx.json`` (``:131``).

TPU-native differences: windows are stored as compressed ``.npz`` with
uint8 image stacks (T,H,W,3) + float32 features (T,47) — images are
normalized on DEVICE at load time instead of baking normalized float
tensors into ``.pt`` files (4× smaller, and the normalize fuses into
the step's XLA program).

``SequenceDataSource`` is the loader (parity with ``cnn+lstm/
dataloader.py:15-116``): pad/truncate to SEQ_LEN by repeating the last
frame (``:50-62``), nan_to_num (``:64-65``).
"""

from __future__ import annotations

import json
import os
import re
from collections import defaultdict
from typing import Iterator

import numpy as np

from surya_tpu.core.config import DataConfig

# Matches: video_clip_001_frame_00101.jpg_view_01.png  (ref :141)
FILENAME_PATTERN = re.compile(
    r"(video_clip_\d+)_frame_(\d+)(?:\.[a-zA-Z]+)?_view_(\d+)\.png")


def build_sequence_dataset(aug_root: str, flat_root: str, out_root: str,
                           seq_len: int = 4, stride: int = 2,
                           image_size: int = 224,
                           splits=("train", "valid", "test")) -> dict:
    """Build the windowed dataset; returns counts per split."""
    from PIL import Image

    os.makedirs(out_root, exist_ok=True)

    # Global class map from train-split label dirs (ref :124-132).
    classes = sorted(d for d in os.listdir(os.path.join(aug_root, "train"))
                     if os.path.isdir(os.path.join(aug_root, "train", d)))
    class_to_idx = {c.strip(): i for i, c in enumerate(classes)}
    with open(os.path.join(out_root, "class_to_idx.json"), "w") as f:
        json.dump(class_to_idx, f, indent=4)

    counts = {}
    for split in splits:
        split_path = os.path.join(aug_root, split)
        if not os.path.isdir(split_path):
            continue
        n_saved = 0
        for label in sorted(os.listdir(split_path)):
            label_path = os.path.join(split_path, label)
            if not os.path.isdir(label_path):
                continue
            # npy lookup from the flat dataset: (clip, frame_idx) → path.
            npy_lookup = {}
            flat_label_dir = os.path.join(flat_root, split, label)
            if os.path.isdir(flat_label_dir):
                for fn in os.listdir(flat_label_dir):
                    if fn.endswith(".npy"):
                        parts = fn.split("_frame_")
                        if len(parts) >= 3:
                            npy_lookup[(parts[0],
                                        parts[-1][:-4])] = os.path.join(
                                            flat_label_dir, fn)

            grouped = defaultdict(list)
            for img_file in os.listdir(label_path):
                m = FILENAME_PATTERN.match(img_file)
                if not m:
                    continue
                clip, fidx, view = m.group(1), m.group(2), m.group(3)
                grouped[(clip, view)].append(
                    {"frame_idx": int(fidx), "fidx_str": fidx,
                     "img_path": os.path.join(label_path, img_file),
                     "label": label})

            for (clip, view), frames in grouped.items():
                frames.sort(key=lambda d: d["frame_idx"])
                for i in range(0, len(frames) - seq_len + 1, stride):
                    window = frames[i:i + seq_len]
                    label_str = window[-1]["label"].strip()
                    if label_str not in class_to_idx:
                        continue
                    cdir = os.path.join(out_root, split, label_str)
                    os.makedirs(cdir, exist_ok=True)
                    out = os.path.join(
                        cdir, f"{clip}_view_{view}_seq_{i:05d}.npz")
                    if os.path.exists(out):  # resumable (ref :72-74)
                        n_saved += 1
                        continue
                    imgs = np.empty((seq_len, image_size, image_size, 3),
                                    np.uint8)
                    feats = np.empty((seq_len, 47), np.float32)
                    for t, fd in enumerate(window):
                        with Image.open(fd["img_path"]) as im:
                            imgs[t] = np.asarray(
                                im.convert("RGB").resize(
                                    (image_size, image_size),
                                    Image.BILINEAR), np.uint8)
                        npy = npy_lookup.get((clip, fd["fidx_str"]))
                        feats[t] = (np.load(npy).astype(np.float32)
                                    if npy and os.path.exists(npy)
                                    else np.zeros(47, np.float32))
                    np.savez_compressed(
                        out, image_sequence=imgs, numerical_sequence=feats,
                        label=class_to_idx[label_str], video_clip=clip,
                        view_id=view)
                    n_saved += 1
        counts[split] = n_saved
    return counts


def _pad_or_truncate(arr: np.ndarray, seq_len: int) -> np.ndarray:
    """Repeat-last-frame pad / truncate (ref dataloader :50-62)."""
    t = arr.shape[0]
    if t == seq_len:
        return arr
    if t > seq_len:
        return arr[:seq_len]
    pad = np.repeat(arr[-1:], seq_len - t, axis=0)
    return np.concatenate([arr, pad], axis=0)


class SequenceDataSource:
    """Batches of (image_seq uint8 (B,T,H,W,3), feature_seq (B,T,47),
    label) from the ``.npz`` window layout."""

    def __init__(self, cfg: DataConfig, seed: int = 0,
                 splits=("train", "valid", "test"), stats=None,
                 pad_eval_to: int = 1):
        self.cfg = cfg
        self.seed = seed
        self.pad_eval_to = pad_eval_to  # multi-chip eval tail padding
        # per-class stats for the 3dcnn-style per-timestep
        # standardization (3dcnn/dataloaders.py:186-211)
        self.stats = stats
        root = cfg.seq_root
        if stats is None and cfg.standardize_features:
            import os as _os

            from surya_tpu.data.imputation import ClassFeatureStats

            means = _os.path.join(root, "class_feature_means.json")
            stds = _os.path.join(root, "class_feature_stds.json")
            if _os.path.exists(means):
                self.stats = ClassFeatureStats.from_json(
                    means, stds if _os.path.exists(stds) else None)
        with open(os.path.join(root, "class_to_idx.json")) as f:
            self.class_to_idx = json.load(f)
        self.class_names = sorted(self.class_to_idx,
                                  key=self.class_to_idx.get)
        self.num_classes = len(self.class_names)
        if self.stats is not None:
            # stats rows must follow class_to_idx's label order, not
            # the JSON's sorted keys (see ClassFeatureStats.aligned_to)
            self.stats = self.stats.aligned_to(self.class_names)
        self.index = {}
        for s in splits:
            sdir = os.path.join(root, s)
            if not os.path.isdir(sdir):
                continue
            files = []
            for label in sorted(os.listdir(sdir)):
                ldir = os.path.join(sdir, label)
                if not os.path.isdir(ldir):
                    continue
                files += [os.path.join(ldir, f)
                          for f in sorted(os.listdir(ldir))
                          if f.endswith(".npz")]
            self.index[s] = files

    def _load(self, path: str):
        t = self.cfg.seq_len
        try:
            with np.load(path) as z:
                imgs = _pad_or_truncate(z["image_sequence"], t)
                feats = np.nan_to_num(
                    _pad_or_truncate(z["numerical_sequence"], t))
                return imgs, feats.astype(np.float32), int(z["label"])
        except Exception as e:  # corrupt-file fallback (ref :69-71)
            print(f"[data] failed to load {path}: {e}; using dummy")
            h = self.cfg.image_size
            return (np.zeros((t, h, h, 3), np.uint8),
                    np.zeros((t, 47), np.float32), 0)

    def _batches(self, split: str, order) -> Iterator[tuple]:
        files = self.index[split]
        bs = self.cfg.batch_size
        for i in range(0, len(order), bs):
            idx = order[i:i + bs]
            samples = [self._load(files[j]) for j in idx]
            yield (np.stack([s[0] for s in samples]),
                   np.stack([s[1] for s in samples]),
                   np.asarray([s[2] for s in samples], np.int32))

    def train_batches(self, epoch_seed: int = 0) -> Iterator[tuple]:
        from surya_tpu.data.batching import epoch_order

        n = len(self.index["train"])
        order = epoch_order(n, self.cfg.batch_size, self.seed, epoch_seed)
        return self._batches("train", order)

    def eval_batches(self, split: str) -> Iterator[tuple]:
        from surya_tpu.data.batching import pad_eval_iter

        if split not in self.index:
            raise KeyError(split)   # eager: callers probe availability
        it = self._batches(split, np.arange(len(self.index[split])))
        return pad_eval_iter(it, self.pad_eval_to)

    def device_transform(self, split: str, key, batch):
        return sequence_device_transform(self.cfg, self.stats, split,
                                         key, batch)


def sequence_device_transform(cfg, stats, split, key, batch):
    """uint8 frames → normalized float (no augmentation — the
    reference's sequence loader uses pre-baked transforms only);
    optional per-timestep feature standardization (3dcnn loader
    semantics: NaN → class mean, then (x−μ_c)/σ_c with σ<1e-6 → 0).
    Module-level so the packed source shares it without instantiating
    a disk-scanning SequenceDataSource."""
    import jax.numpy as jnp

    from surya_tpu.data.augment import normalize

    imgs, feats, labels = batch
    imgs = normalize(jnp.asarray(imgs, jnp.float32) / 255.0)
    feats = jnp.asarray(feats)
    if stats is not None and cfg.standardize_features:
        # labels broadcast over the time axis: (B,) → (B, T)
        lab = jnp.asarray(labels)[:, None]
        lab = jnp.broadcast_to(lab, feats.shape[:2])
        feats = stats.standardize(feats, lab)
    else:
        feats = jnp.nan_to_num(feats)
    return imgs, feats, labels
