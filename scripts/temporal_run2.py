"""Remaining temporal families on TPU: fact / resnet3d_video /
hybrid_quadtree_3d (smaller shapes to bound compile time)."""
import json, os
from surya_tpu.core.config import Config, DataConfig, ModelConfig, TrainConfig
from surya_tpu.core.metrics import MetricsLogger
from surya_tpu.data import ArrayDataSource, make_synthetic_temporal
from surya_tpu.train import train_and_evaluate

OUT = "runs/temporal"
os.makedirs(OUT, exist_ok=True)
results = json.load(open(os.path.join(OUT, "results.json")))
for name, kw in [("fact", dict(freeze_backbone=True)),
                 ("resnet3d_video", dict(freeze_backbone=True)),
                 ("hybrid_quadtree_3d", dict(freeze_backbone=True))]:
    splits = {s: make_synthetic_temporal(num_classes=8, per_class=16,
                                         seq_len=4, image_size=64, seed=i)
              for i, s in enumerate(["train", "valid", "test"])}
    data = ArrayDataSource(splits, batch_size=32)
    cfg = Config(model=ModelConfig(name=name, num_classes=8, seq_len=4,
                                   **kw),
                 data=DataConfig(batch_size=32),
                 train=TrainConfig(epochs=5, lr=1e-3, seed=42,
                                   early_stop_patience=0))
    logger = MetricsLogger(os.path.join(OUT, f"{name}.jsonl"), echo=False)
    s = train_and_evaluate(cfg, data, logger=logger, checkpoints=False)
    results[name] = {"test_accuracy": s["test"]["accuracy"],
                     "test_f1": s["test"]["f1"],
                     "final_train_acc": s["history"][-1]["train_accuracy"],
                     "clips_per_sec": s["history"][-1]["images_per_sec"]}
    print(name, results[name], flush=True)
with open(os.path.join(OUT, "results.json"), "w") as f:
    json.dump(results, f, indent=2)
