"""Write the reference-replay datasets (surya_tpu/data/replay.py) to
disk in the layouts the real pipelines consume:

- spatial → the reference's flat-image layout
  ``<root>/<split>/<class>/img.jpg`` + sibling ``.npy``
  (``experiment/dataloader_cnn.py:51-70``) + per-class feature-stat
  JSONs (``1_prepare_still_image_dataset.py:342-349``);
- temporal → the windowed ``.npz`` sequence layout SequenceDataSource
  loads (``surya_tpu/data/sequences.py``; reference ``.pt`` windows,
  ``cnn+lstm/prepare_sequential_dataset.py:98-104``) + class_to_idx.

Run: python scripts/make_replay_disk.py [--root /root/datasets/replay224]
       [--kind spatial|temporal|both] [--per-class 96] [--seq-per-class 64]
       [--image-size 224] [--seq-len 5] [--amp-hi 0.45] [--amp-pow 1.5]
       [--feat-sep 1.55]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np
from PIL import Image

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from surya_tpu.data.replay import (  # noqa: E402
    make_replay_spatial,
    make_replay_temporal,
)

SPLIT_SEEDS = {"train": 0, "valid": 1, "test": 2}


def write_spatial(root, per_class, image_size, **kw):
    from surya_tpu.features import FEATURE_NAMES_47

    train_feats, train_labels = None, None
    for split, seed_off in SPLIT_SEEDS.items():
        pc = per_class if split == "train" else max(per_class // 3, 8)
        imgs, feats, labels = make_replay_spatial(
            per_class=pc, image_size=image_size, seed=1000 + seed_off,
            **kw)
        for i, (img, f, y) in enumerate(zip(imgs, feats, labels)):
            cdir = os.path.join(root, split, f"pose_{y}")
            os.makedirs(cdir, exist_ok=True)
            Image.fromarray(img).save(
                os.path.join(cdir, f"{i:05d}.jpg"), quality=92)
            np.save(os.path.join(cdir, f"{i:05d}.npy"), f)
        if split == "train":
            train_feats, train_labels = feats, labels
        print(f"  spatial {split}: {len(labels)} images", flush=True)

    means, stds = {}, {}
    for c in np.unique(train_labels):
        sel = train_feats[train_labels == c]
        means[f"pose_{c}"] = dict(zip(FEATURE_NAMES_47,
                                      sel.mean(axis=0).tolist()))
        stds[f"pose_{c}"] = dict(zip(FEATURE_NAMES_47,
                                     (sel.std(axis=0) + 1e-8).tolist()))
    with open(os.path.join(root, "class_feature_means.json"), "w") as f:
        json.dump(means, f)
    with open(os.path.join(root, "class_feature_stds.json"), "w") as f:
        json.dump(stds, f)


def write_temporal(root, per_class, image_size, seq_len, **kw):
    class_to_idx = {f"pose_{i}": i for i in range(8)}
    os.makedirs(root, exist_ok=True)
    with open(os.path.join(root, "class_to_idx.json"), "w") as f:
        json.dump(class_to_idx, f, indent=4)
    for split, seed_off in SPLIT_SEEDS.items():
        pc = per_class if split == "train" else max(per_class // 3, 8)
        seqs, feats, labels = make_replay_temporal(
            per_class=pc, image_size=image_size, seq_len=seq_len,
            seed=2000 + seed_off, **kw)
        for i, (s, f, y) in enumerate(zip(seqs, feats, labels)):
            cdir = os.path.join(root, split, f"pose_{y}")
            os.makedirs(cdir, exist_ok=True)
            np.savez(os.path.join(cdir, f"window_{i:05d}.npz"),
                     image_sequence=s, numerical_sequence=f,
                     label=np.int64(y))
        print(f"  temporal {split}: {len(labels)} windows", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/root/datasets/replay224")
    ap.add_argument("--kind", choices=("spatial", "temporal", "both"),
                    default="both")
    ap.add_argument("--per-class", type=int, default=96)
    ap.add_argument("--seq-per-class", type=int, default=64)
    ap.add_argument("--image-size", type=int, default=224)
    ap.add_argument("--seq-len", type=int, default=5)
    ap.add_argument("--amp-hi", type=float, default=0.45)
    ap.add_argument("--amp-pow", type=float, default=1.5)
    ap.add_argument("--feat-sep", type=float, default=1.55)
    args = ap.parse_args()
    kw = dict(amp_hi=args.amp_hi, amp_pow=args.amp_pow,
              feat_sep=args.feat_sep)
    if args.kind in ("spatial", "both"):
        write_spatial(os.path.join(args.root, "spatial"),
                      args.per_class, args.image_size, **kw)
    if args.kind in ("temporal", "both"):
        write_temporal(os.path.join(args.root, "temporal"),
                       args.seq_per_class, args.image_size,
                       args.seq_len, **kw)
    with open(os.path.join(args.root, "gen_config.json"), "w") as f:
        json.dump(vars(args), f, indent=2)
    print(json.dumps(vars(args)))


if __name__ == "__main__":
    main()
