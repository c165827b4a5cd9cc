"""Write the synthetic multimodal dataset to disk in the reference's
flat-image layout (``<root>/<split>/<class>/img.jpg`` + sibling ``.npy``
47-feature files — ``experiment/dataloader_cnn.py:51-70``), so
DiskDataSource exercises the REAL pipeline: libjpeg decode, feature
load, per-class stats, augmentation, echo.

Run: python scripts/make_synth_disk.py [ROOT] [PER_CLASS] [IMG_SIZE]
Defaults: /root/datasets/synth8, train 64 / valid 16 / test 16 per
class, 8 classes, 96px.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np
from PIL import Image

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from surya_tpu.data.synthetic import make_synthetic_spatial  # noqa: E402


def write_split(root, split, per_class, image_size, seed, noise=0.1):
    images, feats, labels = make_synthetic_spatial(
        per_class=per_class, image_size=image_size, seed=seed,
        noise=noise)
    for i, (img, f, y) in enumerate(zip(images, feats, labels)):
        cdir = os.path.join(root, split, f"pose_{y}")
        os.makedirs(cdir, exist_ok=True)
        u8 = np.clip((img + 1.5) / 3.0 * 255, 0, 255).astype(np.uint8)
        Image.fromarray(u8).save(os.path.join(cdir, f"{i:05d}.jpg"),
                                 quality=92)
        np.save(os.path.join(cdir, f"{i:05d}.npy"), f)
    return feats, labels


def main():
    root = sys.argv[1] if len(sys.argv) > 1 else "/root/datasets/synth8"
    per_class = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    image_size = int(sys.argv[3]) if len(sys.argv) > 3 else 96
    noise = float(sys.argv[4]) if len(sys.argv) > 4 else 0.1
    feats, labels = write_split(root, "train", per_class, image_size, 0,
                                noise)
    write_split(root, "valid", max(per_class // 4, 4), image_size, 1,
                noise)
    write_split(root, "test", max(per_class // 4, 4), image_size, 2,
                noise)

    # per-class feature stats in the reference's JSON shape
    # {class: {feature_name: value}} (still_image_dataset.py parity)
    from surya_tpu.features import FEATURE_NAMES_47

    means = {}
    stds = {}
    for c in np.unique(labels):
        sel = feats[labels == c]
        means[f"pose_{c}"] = dict(zip(FEATURE_NAMES_47,
                                      sel.mean(axis=0).tolist()))
        stds[f"pose_{c}"] = dict(zip(FEATURE_NAMES_47,
                                     (sel.std(axis=0) + 1e-8).tolist()))
    with open(os.path.join(root, "class_feature_means.json"), "w") as f:
        json.dump(means, f)
    with open(os.path.join(root, "class_feature_stds.json"), "w") as f:
        json.dump(stds, f)
    n_train = per_class * 8
    print(f"wrote {root}: train {n_train}, valid/test "
          f"{max(per_class // 4, 4) * 8} each @ {image_size}px")


if __name__ == "__main__":
    main()
