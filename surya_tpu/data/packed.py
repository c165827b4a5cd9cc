"""Packed pre-decoded dataset cache: decode once, serve at memcpy speed.

The on-disk layout the reference trains from (``split/class/{img.jpg,
img.npy}``, ``experiment/dataloader_cnn.py:48-72``) pays a JPEG decode
per image per epoch — on a weak host that is the end-to-end bottleneck
(BENCH_NOTES "Data echoing": 1-core host decodes ~190 img/s against an
~8k img/s chip). This module trades one offline pass for
decode-free epochs, the arrayrecord/grain-style idiom for TPU input
pipelines:

- ``pack_dataset`` decodes every image ONCE at the staging size
  (through the same native-C++/PIL path ``DiskDataSource`` uses, so
  packed bytes are identical to what the live loader would produce)
  into ``<split>_images.npy`` uint8 memmaps + feature/label arrays,
  with skip-if-exists resume per split (the reference's restartable
  preprocessing semantics, e.g. ``Zero123/batch_aug.py:110-114``).
- ``PackedDataSource`` is a drop-in ``DiskDataSource`` replacement
  whose per-batch work is a fancy-indexed memmap read — no decode, no
  resize — feeding the device-side augment/imputation pipeline
  unchanged (augmentation stays PRNG-fresh per step; only the decoded
  staging bytes are cached).

Enable via ``data.packed_dir=<dir>`` (CLI builds the cache on first
use) or the ``python -m surya_tpu pack`` subcommand.
"""

from __future__ import annotations

import json
import os
import shutil

import numpy as np

from surya_tpu.core.config import DataConfig
from surya_tpu.data.dataset import DiskDataSource
from surya_tpu.data.imputation import ClassFeatureStats

META_NAME = "packed_meta.json"
FORMAT_VERSION = 1
STATS_FILES = ("class_feature_means.json", "class_feature_stds.json")


def _check_source_root(meta: dict, cfg_root: str, pdir: str) -> None:
    """A pack records the dataset it was decoded from; serving it for a
    *different* configured root would silently train on the wrong
    bytes. (Same-root re-generation is undetectable without hashing
    every image — rebuild with overwrite=True after editing data.)"""
    recorded = meta.get("source_root")
    if cfg_root and recorded and os.path.abspath(cfg_root) != recorded:
        raise ValueError(
            f"packed cache {pdir} was built from {recorded} but the "
            f"config points at {os.path.abspath(cfg_root)}; repack "
            "(overwrite=True / a fresh out dir) or fix the data root")


def _split_paths(out_dir: str, split: str) -> dict:
    return {
        "images": os.path.join(out_dir, f"{split}_images.npy"),
        "features": os.path.join(out_dir, f"{split}_features.npy"),
        "labels": os.path.join(out_dir, f"{split}_labels.npy"),
    }


def pack_dataset(data_root: str, out_dir: str, staging: int = 256,
                 splits=("train", "valid", "test"), use_native: bool = True,
                 chunk: int = 256, overwrite: bool = False,
                 verbose: bool = True) -> dict:
    """Decode the flat-image dataset once into memmap arrays.

    Returns the metadata dict (also written to ``out_dir/packed_meta.json``).
    Already-packed splits whose sizes match are skipped (resume);
    ``overwrite=True`` forces a rebuild.
    """
    cfg = DataConfig(data_root=data_root, batch_size=chunk)
    src = DiskDataSource(cfg, splits=splits, staging_size=staging,
                         use_native=use_native)
    os.makedirs(out_dir, exist_ok=True)

    meta_path = os.path.join(out_dir, META_NAME)
    meta = {"format_version": FORMAT_VERSION, "kind": "flat",
            "staging": staging, "source_root": os.path.abspath(data_root),
            "class_names": list(src.class_names), "splits": {}}
    if os.path.exists(meta_path) and not overwrite:
        with open(meta_path) as f:
            old = json.load(f)
        if (old.get("kind", "flat") != "flat"
                or old.get("staging") != staging
                or old.get("class_names") != meta["class_names"]):
            raise ValueError(
                f"{out_dir} holds a {old.get('kind', 'flat')} pack with "
                f"staging={old.get('staging')} "
                f"classes={old.get('class_names')}; requested "
                f"staging={staging}. Pass overwrite=True or "
                f"use a fresh out_dir.")
        meta["splits"] = old.get("splits", {})

    for split, (paths, _fpaths, labels, _names) in src.index.items():
        n = len(labels)
        files = _split_paths(out_dir, split)
        done = meta["splits"].get(split)
        if (done and done.get("count") == n and not overwrite
                and all(os.path.exists(p) for p in files.values())):
            if verbose:
                print(f"[pack] {split}: {n} images already packed, skipping")
            continue
        if verbose:
            print(f"[pack] {split}: decoding {n} images at {staging}px")
        images = np.lib.format.open_memmap(
            files["images"], mode="w+", dtype=np.uint8,
            shape=(n, staging, staging, 3))
        feats = np.empty((n, 47), np.float32)
        for start in range(0, n, chunk):
            idx = np.arange(start, min(start + chunk, n))
            imgs, f, _ = src._load_batch(split, idx)
            images[start:start + len(idx)] = imgs
            feats[start:start + len(idx)] = f
        images.flush()
        del images
        np.save(files["features"], feats)
        np.save(files["labels"], np.asarray(labels, np.int32))
        meta["splits"][split] = {"count": n}
        with open(meta_path, "w") as f:
            json.dump(meta, f, indent=1)  # per-split: resumable mid-pack

    # carry the per-class feature stats next to the pack so the packed
    # source is self-contained (device-side imputation unchanged)
    for name in STATS_FILES:
        s = os.path.join(data_root, name)
        if os.path.exists(s):
            shutil.copy2(s, os.path.join(out_dir, name))
    with open(meta_path, "w") as f:
        json.dump(meta, f, indent=1)
    return meta


class PackedDataSource(DiskDataSource):
    """DiskDataSource drop-in serving batches from the packed memmaps.

    Inherits the threaded prefetch, epoch shuffling, eval-tail padding
    and the device-side transform; only ``_load_batch`` differs (a
    memmap gather instead of decode+np.load)."""

    def __init__(self, cfg: DataConfig, packed_dir: str | None = None,
                 stats: ClassFeatureStats | None = None, seed: int = 0,
                 staging_size: int = 256, use_native: bool = True,
                 pad_eval_to: int = 1, build: bool = True):
        pdir = packed_dir or cfg.packed_dir
        if not pdir:
            raise ValueError("PackedDataSource needs packed_dir "
                             "(or data.packed_dir in the config)")
        meta_path = os.path.join(pdir, META_NAME)
        if not os.path.exists(meta_path):
            if not build:
                raise FileNotFoundError(meta_path)
            pack_dataset(cfg.data_root, pdir, staging=staging_size,
                         use_native=use_native)
        with open(meta_path) as f:
            meta = json.load(f)
        if meta.get("kind", "flat") != "flat":
            raise ValueError(f"{pdir} is a {meta['kind']} pack; "
                             "use PackedSequenceSource")
        _check_source_root(meta, cfg.data_root, pdir)

        self.cfg = cfg
        self.staging = int(meta["staging"])
        self.num_threads = 1
        self.seed = seed
        self.use_native = False
        self.pad_eval_to = pad_eval_to
        self.packed_dir = pdir
        self.class_names = list(meta["class_names"])
        self.num_classes = len(self.class_names)

        self._images, self._feats = {}, {}
        self.index = {}
        for split in meta["splits"]:
            files = _split_paths(pdir, split)
            self._images[split] = np.load(files["images"], mmap_mode="r")
            self._feats[split] = np.load(files["features"])
            labels = np.load(files["labels"])
            # index tuple shape matches DiskDataSource: train_batches /
            # eval_batches only consume labels (slot 2) + names (slot 3)
            self.index[split] = ((), (), labels, self.class_names)
        if "train" not in self.index:
            raise FileNotFoundError(f"no packed train split under {pdir}")

        if stats is None:
            means = os.path.join(pdir, STATS_FILES[0])
            stds = os.path.join(pdir, STATS_FILES[1])
            if os.path.exists(means):
                stats = ClassFeatureStats.from_json(
                    means, stds if os.path.exists(stds) else None)
        if stats is not None:
            stats = stats.aligned_to(self.class_names)
        self.stats = stats

    def _load_batch(self, split: str, idx: np.ndarray):
        imgs = self._images[split][idx]  # memmap gather -> fresh ndarray
        return imgs, self._feats[split][idx], self.index[split][2][idx]


# --- sequence (temporal) pack -------------------------------------------------

def pack_sequences(seq_root: str, out_dir: str, seq_len: int = 4,
                   splits=("train", "valid", "test"),
                   overwrite: bool = False, verbose: bool = True) -> dict:
    """Pack the windowed ``.npz`` sequence dataset (data/sequences.py)
    into memmap arrays: per-window zlib decompression becomes a single
    fancy-indexed read of a (N, T, H, W, 3) uint8 memmap.

    Windows are pad/truncated to ``seq_len`` at pack time with the same
    repeat-last-frame semantics the live loader applies
    (``cnn+lstm/dataloader.py:50-62``), so packed batches are
    byte-identical to ``SequenceDataSource`` output."""
    from surya_tpu.data.sequences import SequenceDataSource

    cfg = DataConfig(seq_root=seq_root, seq_len=seq_len)
    src = SequenceDataSource(cfg, splits=splits)
    os.makedirs(out_dir, exist_ok=True)

    meta_path = os.path.join(out_dir, META_NAME)
    meta = {"format_version": FORMAT_VERSION, "kind": "sequences",
            "seq_len": seq_len, "source_root": os.path.abspath(seq_root),
            "class_names": list(src.class_names), "splits": {}}
    if os.path.exists(meta_path) and not overwrite:
        with open(meta_path) as f:
            old = json.load(f)
        if (old.get("kind") != "sequences"
                or old.get("seq_len") != seq_len
                or old.get("class_names") != meta["class_names"]):
            raise ValueError(
                f"{out_dir} holds a {old.get('kind', 'flat')} pack "
                f"(seq_len={old.get('seq_len')}); requested sequences "
                f"seq_len={seq_len}. Pass overwrite=True or a fresh "
                f"out_dir.")
        meta["splits"] = old.get("splits", {})

    for split, files in src.index.items():
        n = len(files)
        out_files = _split_paths(out_dir, split)
        done = meta["splits"].get(split)
        if (done and done.get("count") == n and not overwrite
                and all(os.path.exists(p) for p in out_files.values())):
            if verbose:
                print(f"[pack] {split}: {n} windows already packed, "
                      "skipping")
            continue
        if verbose:
            print(f"[pack] {split}: packing {n} windows (T={seq_len})")
        images = None
        feats = np.empty((n, seq_len, 47), np.float32)
        labels = np.empty((n,), np.int32)
        for i, path in enumerate(files):
            imgs, f, y = src._load(path)
            if images is None:
                images = np.lib.format.open_memmap(
                    out_files["images"], mode="w+", dtype=np.uint8,
                    shape=(n,) + imgs.shape)
            images[i] = imgs
            feats[i] = f
            labels[i] = y
        if images is not None:
            images.flush()
            del images
        else:  # empty split: still emit well-formed arrays
            np.save(out_files["images"],
                    np.zeros((0, seq_len, 1, 1, 3), np.uint8))
        np.save(out_files["features"], feats)
        np.save(out_files["labels"], labels)
        meta["splits"][split] = {"count": n}
        with open(meta_path, "w") as f:
            json.dump(meta, f, indent=1)  # per-split: resumable mid-pack

    for name in ("class_to_idx.json",) + STATS_FILES:
        s = os.path.join(seq_root, name)
        if os.path.exists(s):
            shutil.copy2(s, os.path.join(out_dir, name))
    with open(meta_path, "w") as f:
        json.dump(meta, f, indent=1)
    return meta


class PackedSequenceSource:
    """SequenceDataSource drop-in over the packed sequence memmaps.

    Mirrors its batch interface (train_batches/eval_batches/
    device_transform, pad_eval_to sentinel padding); batching and the
    device-side transform come from the same shared helpers the live
    source uses (data/batching.py, sequence_device_transform), so the
    semantics cannot diverge."""

    def __init__(self, cfg: DataConfig, packed_dir: str | None = None,
                 stats=None, seed: int = 0, pad_eval_to: int = 1,
                 build: bool = True):
        from surya_tpu.data.imputation import ClassFeatureStats

        pdir = packed_dir or cfg.packed_dir
        if not pdir:
            raise ValueError("PackedSequenceSource needs packed_dir "
                             "(or data.packed_dir in the config)")
        meta_path = os.path.join(pdir, META_NAME)
        if not os.path.exists(meta_path):
            if not build:
                raise FileNotFoundError(meta_path)
            pack_sequences(cfg.seq_root, pdir, seq_len=cfg.seq_len)
        with open(meta_path) as f:
            meta = json.load(f)
        if meta.get("kind") != "sequences":
            raise ValueError(f"{pdir} is a {meta.get('kind', 'flat')} "
                             "pack; use PackedDataSource")
        if meta["seq_len"] != cfg.seq_len:
            raise ValueError(
                f"pack was built with seq_len={meta['seq_len']}, config "
                f"wants {cfg.seq_len}; repack or fix data.seq_len")
        _check_source_root(meta, cfg.seq_root, pdir)

        self.cfg = cfg
        self.seed = seed
        self.pad_eval_to = pad_eval_to
        self.packed_dir = pdir
        self.class_names = list(meta["class_names"])
        self.num_classes = len(self.class_names)

        if stats is None and cfg.standardize_features:
            means = os.path.join(pdir, STATS_FILES[0])
            stds = os.path.join(pdir, STATS_FILES[1])
            if os.path.exists(means):
                stats = ClassFeatureStats.from_json(
                    means, stds if os.path.exists(stds) else None)
        if stats is not None:
            stats = stats.aligned_to(self.class_names)
        self.stats = stats

        self._images, self._feats, self._labels = {}, {}, {}
        for split in meta["splits"]:
            files = _split_paths(pdir, split)
            self._images[split] = np.load(files["images"], mmap_mode="r")
            self._feats[split] = np.load(files["features"])
            self._labels[split] = np.load(files["labels"])
        if "train" not in self._images:
            raise FileNotFoundError(f"no packed train split under {pdir}")

    def _batches(self, split: str, order):
        bs = self.cfg.batch_size
        for i in range(0, len(order), bs):
            idx = order[i:i + bs]
            yield (self._images[split][idx], self._feats[split][idx],
                   self._labels[split][idx])

    def train_batches(self, epoch_seed: int = 0):
        from surya_tpu.data.batching import epoch_order

        n = len(self._labels["train"])
        order = epoch_order(n, self.cfg.batch_size, self.seed, epoch_seed)
        return self._batches("train", order)

    def eval_batches(self, split: str):
        from surya_tpu.data.batching import pad_eval_iter

        if split not in self._labels:
            raise KeyError(split)
        it = self._batches(split, np.arange(len(self._labels[split])))
        return pad_eval_iter(it, self.pad_eval_to)

    def device_transform(self, split: str, key, batch):
        from surya_tpu.data.sequences import sequence_device_transform

        return sequence_device_transform(self.cfg, self.stats, split,
                                         key, batch)
