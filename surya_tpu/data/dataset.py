"""Disk-backed multimodal image dataset (the reference's L4 frame loader).

Scans ``<root>/<split>/<class>/*.jpg`` with sibling ``.npy`` 47-vectors —
the layout ``1_prepare_still_image_dataset.py`` emits and
``experiment/dataloader_cnn.py:48-72`` consumes — and serves global
batches:

- host side: threaded JPEG decode + resize to a fixed staging size,
  shuffle, batch, prefetch (replaces the torch DataLoader worker pool,
  ``dataloader_cnn.py:135-139``);
- device side: ``device_transform`` applies the reference augmentation
  set (data/augment.py) or eval resize+normalize, plus per-class NaN
  imputation / standardization (data/imputation.py) — all fused into
  the step's XLA program.
"""

from __future__ import annotations

import os
import queue
import threading
from typing import Iterator

import numpy as np

from surya_tpu.core.config import DataConfig
from surya_tpu.data.imputation import ClassFeatureStats

IMG_EXTS = (".jpg", ".jpeg", ".png")


def scan_image_dataset(root: str, split: str):
    """Returns (image_paths, feature_paths, labels, class_names).

    Classes are the sorted subdirectories (``dataloader_cnn.py:51-55``);
    images without a sibling ``.npy`` are skipped with a warning
    (``:69-70``)."""
    split_dir = os.path.join(root, split)
    if not os.path.isdir(split_dir):
        raise FileNotFoundError(split_dir)
    class_names = sorted(d for d in os.listdir(split_dir)
                         if os.path.isdir(os.path.join(split_dir, d)))
    image_paths, feature_paths, labels = [], [], []
    skipped = 0
    for ci, cname in enumerate(class_names):
        cdir = os.path.join(split_dir, cname)
        for fname in sorted(os.listdir(cdir)):
            if not fname.lower().endswith(IMG_EXTS):
                continue
            ipath = os.path.join(cdir, fname)
            npy = os.path.splitext(ipath)[0] + ".npy"
            if not os.path.exists(npy):
                skipped += 1
                continue
            image_paths.append(ipath)
            feature_paths.append(npy)
            labels.append(ci)
    if skipped:
        print(f"[data] {split}: skipped {skipped} images without .npy")
    return (image_paths, feature_paths,
            np.asarray(labels, np.int32), class_names)


def _decode(path: str, staging: int) -> np.ndarray:
    from PIL import Image

    with Image.open(path) as im:
        im = im.convert("RGB").resize((staging, staging),
                                      Image.BILINEAR)
        return np.asarray(im, np.uint8)


class DiskDataSource:
    """train_batches/eval_batches over the on-disk layout.

    Batches are (images uint8 (B,S,S,3), features f32 (B,47),
    labels i32); ``device_transform`` finishes the pipeline on device.
    """

    def __init__(self, cfg: DataConfig, splits=("train", "valid", "test"),
                 stats: ClassFeatureStats | None = None,
                 staging_size: int = 256, num_threads: int = 8,
                 seed: int = 0, use_native: bool = True,
                 pad_eval_to: int = 1):
        self.cfg = cfg
        self.staging = staging_size
        self.num_threads = num_threads
        self.seed = seed
        # C++ libjpeg batch decoder (surya_tpu.native) when buildable;
        # PIL fallback otherwise. Filter note: native/cv2-style bilinear
        # point-samples; PIL BILINEAR anti-aliases on downscale — a
        # benign train-time filter difference.
        self.use_native = use_native
        # multi-chip eval: pad tail batches to a multiple of the
        # data-axis size; pad rows carry sentinel label -1 and are
        # masked out of loss/accuracy/confusion by make_eval_step, so
        # metrics are exact for any split size.
        self.pad_eval_to = pad_eval_to
        self.index = {}
        for s in splits:
            try:
                self.index[s] = scan_image_dataset(cfg.data_root, s)
            except FileNotFoundError:
                pass
        if "train" not in self.index:
            raise FileNotFoundError(
                f"no train split under {cfg.data_root}")
        self.class_names = self.index["train"][3]
        self.num_classes = len(self.class_names)
        # every split's class scan must agree with train's: labels are
        # indices into the split's OWN sorted dirs, so a missing/extra
        # class dir silently shifts every later label
        for s, (_, _, _, names) in self.index.items():
            if list(names) != list(self.class_names):
                raise ValueError(
                    f"split {s!r} class dirs {list(names)} != train's "
                    f"{list(self.class_names)}; eval labels would be "
                    "misaligned (create empty dirs for absent classes)")

        if stats is None:
            means = os.path.join(cfg.data_root, "class_feature_means.json")
            stds = os.path.join(cfg.data_root, "class_feature_stds.json")
            if os.path.exists(means):
                stats = ClassFeatureStats.from_json(
                    means, stds if os.path.exists(stds) else None)
        if stats is not None:
            stats = stats.aligned_to(self.class_names)
        self.stats = stats

    # -- host batching ----------------------------------------------------

    def _load_batch(self, split: str, idx: np.ndarray):
        paths, fpaths, labels, _ = self.index[split]
        batch_paths = [paths[i] for i in idx]
        imgs = None
        if self.use_native and all(
                p.lower().endswith((".jpg", ".jpeg"))
                for p in batch_paths):
            from surya_tpu import native

            if native.available():
                imgs, n_ok = native.decode_batch(batch_paths,
                                                 self.staging)
                if n_ok != len(batch_paths):
                    # don't silently train on zero-filled frames: the
                    # PIL path below raises with the bad file's name
                    imgs = None
        if imgs is None:
            imgs = np.empty((len(idx), self.staging, self.staging, 3),
                            np.uint8)
            for j, p in enumerate(batch_paths):
                imgs[j] = _decode(p, self.staging)
        feats = np.empty((len(idx), 47), np.float32)
        for j, i in enumerate(idx):
            feats[j] = np.load(fpaths[i]).astype(np.float32)
        return imgs, feats, labels[idx]

    def _batches(self, split: str, order: np.ndarray,
                 bs: int) -> Iterator[tuple]:
        """Threaded double-buffered batch producer.

        Abandoning the iterator early (preempt break, consumer error)
        unblocks the producer via the stop event — otherwise the
        thread would sit on a full queue forever, pinning up to
        ``prefetch`` decoded batches."""
        chunks = [order[i:i + bs] for i in range(0, len(order), bs)]
        q: queue.Queue = queue.Queue(maxsize=self.cfg.prefetch)
        stop = threading.Event()

        def put(item) -> bool:
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.2)
                    return True
                except queue.Full:
                    continue
            return False

        def worker():
            try:
                for ch in chunks:
                    if not put(self._load_batch(split, ch)):
                        return
                put(None)
            except BaseException as e:  # surface, don't deadlock
                put(e)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    break
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            stop.set()

    def train_batches(self, epoch_seed: int = 0) -> Iterator[tuple]:
        from surya_tpu.data.batching import epoch_order

        n = len(self.index["train"][2])
        bs = self.cfg.batch_size
        order = epoch_order(n, bs, self.seed, epoch_seed)
        yield from self._batches("train", order, bs)

    def eval_batches(self, split: str) -> Iterator[tuple]:
        from surya_tpu.data.batching import pad_eval_iter

        if split not in self.index:
            raise KeyError(split)   # eager: callers probe availability
        n = len(self.index[split][2])
        it = self._batches(split, np.arange(n), self.cfg.batch_size)
        return pad_eval_iter(it, self.pad_eval_to)

    # -- device-side finish -------------------------------------------------

    def device_transform(self, split: str, key, batch):
        import jax.numpy as jnp

        from surya_tpu.data.augment import augment_batch, eval_preprocess

        images, feats, labels = batch
        images = jnp.asarray(images, jnp.float32) / 255.0
        # key=None → eval preprocessing even on the train split: the
        # read-only consumers (eval/cam CLIs) pass no PRNG key
        if split == "train" and self.cfg.augment and key is not None:
            images = augment_batch(
                key, images, out_size=self.cfg.image_size,
                scale_min=self.cfg.rrc_scale_min,
                hflip_prob=self.cfg.hflip_prob,
                jitter=(self.cfg.jitter_brightness, self.cfg.jitter_contrast,
                        self.cfg.jitter_saturation, self.cfg.jitter_hue),
                rotation_deg=self.cfg.rotation_deg,
                blur_sigma=(self.cfg.blur_sigma_min,
                            self.cfg.blur_sigma_max))
        else:
            images = eval_preprocess(images, out_size=self.cfg.image_size)

        if self.stats is not None:
            feats = (self.stats.standardize(feats, labels)
                     if self.cfg.standardize_features
                     else self.stats.impute(feats, labels))
        else:
            feats = jnp.nan_to_num(jnp.asarray(feats))
        return images, feats, labels
