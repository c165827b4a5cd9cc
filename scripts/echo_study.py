"""Controlled data-echo convergence study (round-2 VERDICT item 8).

Trains the flagship QuadtreeCNN on the SAME disk dataset with the SAME
seed under echo=1 and echo=8 (``data.data_echo`` drives N optimizer
steps per decoded host batch, fresh on-device augmentations each step),
and records the two validation curves + end-to-end throughput. The
round-1 claim "identical convergence under echo=8" came from one run;
this is the controlled A/B.

Run: python scripts/echo_study.py [EPOCHS]  → runs/echo_study/
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
from surya_tpu.core.metrics import MetricsLogger  # noqa: E402
from surya_tpu.data.dataset import DiskDataSource  # noqa: E402
from surya_tpu.train import train_and_evaluate  # noqa: E402

ROOT = os.environ.get("SYNTH_ROOT", "/root/datasets/synth8")
OUT = "runs/echo_study"


def run(echo: int, epochs: int) -> dict:
    cfg = Config(
        model=ModelConfig(name="quadtree", num_classes=8,
                          freeze_backbone=True, use_pallas=False),
        data=DataConfig(data_root=ROOT, batch_size=64, image_size=96,
                        data_echo=echo),
        train=TrainConfig(epochs=epochs, lr=5e-4, weight_decay=1e-4,
                          seed=42, early_stop_patience=0),
    )
    data = DiskDataSource(cfg.data)
    s = train_and_evaluate(cfg, data, logger=MetricsLogger(echo=False),
                           checkpoints=False)
    curve = [{"epoch": h["epoch"], "val_acc": h["val_accuracy"],
              "val_loss": h["val_loss"],
              "images_per_sec": h["images_per_sec"]}
             for h in s["history"]]
    return {"echo": echo, "curve": curve,
            "test_acc": s["test"]["accuracy"],
            "mean_images_per_sec": sum(
                c["images_per_sec"] for c in curve) / len(curve)}


def main():
    epochs = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    os.makedirs(OUT, exist_ok=True)
    results = [run(1, epochs), run(8, epochs)]
    with open(os.path.join(OUT, "echo_study.json"), "w") as f:
        json.dump(results, f, indent=2)
    for r in results:
        accs = [c["val_acc"] for c in r["curve"]]
        print(f"echo={r['echo']}: val_acc per epoch {accs} "
              f"test={r['test_acc']:.4f} "
              f"throughput={r['mean_images_per_sec']:.0f} img/s")


if __name__ == "__main__":
    main()
