"""FACT-MoE training demo on TPU (EP model variant, round 2).

Trains the MoE-FFN variant of FACT (``model.moe_experts=4, top-2``,
parallel/moe.py) on the synthetic temporal set through the normal CLI
config path — the aux load-balance loss flows through the 'losses'
collection into the train objective (train/steps.py). Artifact:
runs/temporal/fact_moe.jsonl + results.json entry.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from surya_tpu.core.config import Config, DataConfig, ModelConfig, TrainConfig  # noqa: E402
from surya_tpu.core.metrics import MetricsLogger  # noqa: E402
from surya_tpu.data import ArrayDataSource, make_synthetic_temporal  # noqa: E402
from surya_tpu.train import train_and_evaluate  # noqa: E402

OUT = "runs/temporal"
os.makedirs(OUT, exist_ok=True)
results = json.load(open(os.path.join(OUT, "results.json")))

splits = {s: make_synthetic_temporal(num_classes=8, per_class=16,
                                     seq_len=4, image_size=64, seed=i)
          for i, s in enumerate(["train", "valid", "test"])}
data = ArrayDataSource(splits, batch_size=32)
# same recipe that took the dense FACT to 100% in round 1
# (lr 3e-4, data-echo schedule, 15 epochs)
cfg = Config(model=ModelConfig(name="fact", num_classes=8, seq_len=4,
                               freeze_backbone=True, moe_experts=4,
                               moe_top_k=2),
             data=DataConfig(batch_size=32, data_echo=4),
             train=TrainConfig(epochs=15, lr=3e-4, seed=42,
                               early_stop_patience=0))
logger = MetricsLogger(os.path.join(OUT, "fact_moe.jsonl"), echo=False)
s = train_and_evaluate(cfg, data, logger=logger, checkpoints=False)
results["fact_moe"] = {
    "test_accuracy": s["test"]["accuracy"],
    "test_f1": s["test"]["f1"],
    "final_train_acc": s["history"][-1]["train_accuracy"],
    "clips_per_sec": s["history"][-1]["images_per_sec"],
    "moe_experts": 4, "moe_top_k": 2}
print("fact_moe", results["fact_moe"], flush=True)
with open(os.path.join(OUT, "results.json"), "w") as f:
    json.dump(results, f, indent=2)
