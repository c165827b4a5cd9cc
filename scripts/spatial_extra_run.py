"""Remaining spatial families on TPU: hierarchical_quadtree /
attention_hierarchical / standard_resnet on the synth8 disk dataset."""
import json, os
from surya_tpu.core.config import Config, DataConfig, ModelConfig, TrainConfig
from surya_tpu.core.metrics import MetricsLogger
from surya_tpu.data.dataset import DiskDataSource
from surya_tpu.train import train_and_evaluate

OUT = "runs/spatial_extra"
os.makedirs(OUT, exist_ok=True)
results = {}
for name in ["hierarchical_quadtree", "attention_hierarchical",
             "standard_resnet"]:
    cfg = Config(model=ModelConfig(name=name, num_classes=8,
                                   freeze_backbone=False),
                 data=DataConfig(data_root="/root/datasets/synth8",
                                 batch_size=64, image_size=96,
                                 data_echo=4),
                 train=TrainConfig(epochs=3, lr=5e-4, weight_decay=1e-4,
                                   seed=42, early_stop_patience=0))
    data = DiskDataSource(cfg.data)
    s = train_and_evaluate(cfg, data, checkpoints=False,
                           logger=MetricsLogger(
                               os.path.join(OUT, f"{name}.jsonl"),
                               echo=False))
    results[name] = {"test_accuracy": s["test"]["accuracy"],
                     "test_f1": s["test"]["f1"],
                     "images_per_sec":
                         s["history"][-1]["images_per_sec"]}
    print(name, results[name], flush=True)
with open(os.path.join(OUT, "results.json"), "w") as f:
    json.dump(results, f, indent=2)
