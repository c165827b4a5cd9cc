"""Round-1 artifact: reproduce the reference's comparative analysis flow
on the synth8 disk dataset — train 4 spatial models, compare on valid."""
import json, os
import numpy as np
from surya_tpu.core.config import Config, DataConfig, ModelConfig, TrainConfig
from surya_tpu.core.checkpoint import save_params, host_copy
from surya_tpu.core.metrics import MetricsLogger
from surya_tpu.data.dataset import DiskDataSource
from surya_tpu.train import train_and_evaluate
from surya_tpu.train.compare import compare_models

ROOT = "/root/datasets/synth8"
OUT = "runs/comparative"
os.makedirs(OUT, exist_ok=True)

ENTRIES = [
    ("quadtree", ModelConfig(name="quadtree", num_classes=8,
                             freeze_backbone=True, use_pallas=False)),
    ("resnet18", ModelConfig(name="standard_multimodal",
                             backbone="resnet18", num_classes=8)),
    ("vgg16", ModelConfig(name="standard_multimodal", backbone="vgg16",
                          num_classes=8)),
    ("mobilenet_v2", ModelConfig(name="standard_multimodal",
                                 backbone="mobilenet_v2", num_classes=8)),
]

entries = []
for name, mcfg in ENTRIES:
    cfg = Config(model=mcfg,
                 data=DataConfig(data_root=ROOT, batch_size=64,
                                 image_size=96, data_echo=4),
                 train=TrainConfig(epochs=3, lr=5e-4, weight_decay=1e-4,
                                   seed=42, early_stop_patience=0))
    data = DiskDataSource(cfg.data)
    print(f"=== training {name}")
    s = train_and_evaluate(cfg, data, logger=MetricsLogger(echo=False),
                           checkpoints=False)
    print(name, "test acc:", s["test"]["accuracy"],
          "imgs/s:", s["history"][-1]["images_per_sec"])
    path = os.path.join(OUT, f"{name}_params")
    state = s["state"]
    save_params(path, host_copy({"params": state.params,
                                 "batch_stats": state.batch_stats}))
    entries.append({"name": name, "cfg": cfg, "params_path": path})

data = DiskDataSource(entries[0]["cfg"].data)
summary = compare_models(entries, data, split="valid", out_dir=OUT)
with open(os.path.join(OUT, "comparison.json"), "w") as f:
    json.dump(summary, f, indent=2)
print(json.dumps({n: {k: round(v, 4) for k, v in r.items()
                      if isinstance(v, float)}
                  for n, r in summary.items()}, indent=2))
