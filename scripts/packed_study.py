"""Disk vs packed-cache end-to-end A/B on real TPU.

Same model/config/seed trained from (a) the on-disk jpg+npy layout
(live libjpeg decode per epoch) and (b) the packed memmap cache
(data/packed.py — decode paid once, offline). The pack stores exactly
the bytes the disk loader would decode (same native path), so curves
should match to augmentation-PRNG determinism; the delta is pure host
input throughput.

Run: python scripts/packed_study.py [EPOCHS]  → runs/packed_study/
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from surya_tpu.core.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()  # tunnel compiles are 20-40 s; cache them

from surya_tpu.core.config import (  # noqa: E402
    Config,
    DataConfig,
    ModelConfig,
    TrainConfig,
)
from surya_tpu.core.metrics import MetricsLogger  # noqa: E402
from surya_tpu.data.dataset import DiskDataSource  # noqa: E402
from surya_tpu.data.packed import PackedDataSource  # noqa: E402
from surya_tpu.train import train_and_evaluate  # noqa: E402

ROOT = os.environ.get("SYNTH_ROOT", "/root/datasets/synth8")
PACK = os.environ.get("PACK_DIR", "/root/datasets/synth8_pack")
OUT = "runs/packed_study"


def run(source: str, epochs: int) -> dict:
    cfg = Config(
        model=ModelConfig(name="quadtree", num_classes=8,
                          freeze_backbone=True, use_pallas=False),
        data=DataConfig(data_root=ROOT, batch_size=64, image_size=96,
                        packed_dir=(PACK if source == "packed" else "")),
        train=TrainConfig(epochs=epochs, lr=5e-4, weight_decay=1e-4,
                          seed=42, early_stop_patience=0),
    )
    data = (PackedDataSource(cfg.data) if source == "packed"
            else DiskDataSource(cfg.data))
    t0 = time.perf_counter()
    s = train_and_evaluate(cfg, data, logger=MetricsLogger(echo=False),
                           checkpoints=False)
    wall = time.perf_counter() - t0
    curve = [{"epoch": h["epoch"], "val_acc": h["val_accuracy"],
              "images_per_sec": h["images_per_sec"]}
             for h in s["history"]]
    return {"source": source, "curve": curve,
            "test_acc": s["test"]["accuracy"], "wall_s": round(wall, 1)}


def main():
    # each arm is a separate invocation (argv[2]) so runs stay inside
    # the 10-min process bound; results merge into one report file
    epochs = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    arms = [sys.argv[2]] if len(sys.argv) > 2 else ["disk", "packed"]
    os.makedirs(OUT, exist_ok=True)
    path = os.path.join(OUT, "packed_study.json")
    report = {"epochs": epochs, "runs": []}
    if os.path.exists(path):
        with open(path) as f:
            report = json.load(f)
    for arm in arms:
        report["runs"] = [r for r in report["runs"]
                          if r["source"] != arm] + [run(arm, epochs)]
    for r in report["runs"]:
        # steady-state throughput: epoch 0 is compile-dominated (and
        # with the persistent compile cache the second arm would get an
        # unfair epoch-0 cache hit), so compare epochs >= 1 only
        steady = [c["images_per_sec"] for c in r["curve"][1:]] or [0.0]
        r["steady_images_per_sec"] = round(sum(steady) / len(steady), 1)
    by = {r["source"]: r for r in report["runs"]}
    if "disk" in by and "packed" in by:
        report["speedup_steady"] = round(
            by["packed"]["steady_images_per_sec"]
            / by["disk"]["steady_images_per_sec"], 2)
    with open(path, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
