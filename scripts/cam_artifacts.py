"""Batch Grad-CAM artifacts for every spatial family (VERDICT item 9).

Trains each spatial family briefly on the synthetic set (TPU), then
writes save_batch_grad_cam overlays under runs/cams/<family>_<target>/
— the reference only CAMs its resnet models
(``resnet/grad_cam_analysis.py``); the hierarchical/attention coverage
(targets layer2 / level1 / level2) is the round-2 extension.

Run: python scripts/cam_artifacts.py
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from surya_tpu.core.config import (  # noqa: E402
    Config,
    DataConfig,
    ModelConfig,
    TrainConfig,
)
from surya_tpu.data import ArrayDataSource, make_synthetic_spatial  # noqa: E402
from surya_tpu.interpret.gradcam import save_batch_grad_cam  # noqa: E402
from surya_tpu.train import train_and_evaluate  # noqa: E402

FAMILIES = {
    "quadtree": ["layer3", "layer4"],
    "hierarchical_quadtree": ["layer2", "level1", "level2"],
    "attention_hierarchical": ["layer2", "level1", "level2"],
    "standard_resnet": ["layer4"],
}
CLASSES = 4


def main():
    splits = {s: make_synthetic_spatial(num_classes=CLASSES, per_class=8,
                                        image_size=64, seed=i)
              for i, s in enumerate(["train", "valid", "test"])}
    class_names = [f"pose_{i}" for i in range(CLASSES)]
    summary = {}
    for family, targets in FAMILIES.items():
        cfg = Config(
            model=ModelConfig(name=family, num_classes=CLASSES,
                              freeze_backbone=True, use_pallas=False),
            data=DataConfig(batch_size=16, image_size=64),
            train=TrainConfig(epochs=3, lr=3e-3,
                              early_stop_patience=0))
        data = ArrayDataSource(splits, 16)
        result = train_and_evaluate(cfg, data, checkpoints=False)
        state = result["state"]
        variables = {"params": state.params,
                     "batch_stats": state.batch_stats}
        test_imgs, test_feats, test_labels = splits["test"]
        batches = [(test_imgs[:16], test_feats[:16], test_labels[:16])]
        written = {}
        for target in targets:
            out_dir = f"runs/cams/{family}_{target}"
            n = save_batch_grad_cam(cfg.model, variables, batches,
                                    class_names, out_dir,
                                    target_layer=target)
            written[target] = n
            print(f"{family} {target}: {n} overlays -> {out_dir}")
        summary[family] = {"test_acc": result["test"]["accuracy"],
                           "overlays": written}
    os.makedirs("runs/cams", exist_ok=True)
    with open("runs/cams/summary.json", "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
