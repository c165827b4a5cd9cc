"""Spatial replay control rows (round-4, analysis of the main table).

The main campaign (scripts/reference_replay.py) found every TRAINABLE
baseline clustering at the dataset's ~0.94 Bayes ceiling while the
flagship preset sits at 0.91 — two confounds need isolating:

1. **Epoch budget**: `quadtree-fusion` mirrors ``Quadtree_train.py:22``
   (10 epochs — the reference could afford it because its trunk is
   ImageNet-pretrained, ``models.py:221``); the `comparative-*` presets
   mirror ``comparative analysis/train_cnn.py`` (20 epochs). From
   scratch, the flagship is still climbing when its budget ends.
   Control: `quadtree-fusion` with ``train.epochs=20`` (clearly
   labelled as a deviation row).
2. **Position leakage**: a trainable deep trunk learns absolute
   position through zero-padding border effects, so GAP pooling stops
   being position-blind and the quadtree's structural locality
   advantage dissolves (VGG's flattened classifier is position-aware
   outright). Control: `comparative-resnet18` with a FROZEN trunk —
   the regime where the round-3 capability study showed the quadrant
   split winning decisively — at the replay operating point, against
   the frozen-quadtree row the main table already has
   (`experiment-fusion`).

Same in-process batch pattern as scripts/replay_temporal_batch.py
(watchdog + supervised relaunch + result.json resume).

Run: python scripts/replay_spatial_controls.py --supervise
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

OUT = "runs/reference_replay/controls"
WATCHDOG_S = 480.0
_heartbeat = [time.time()]

CONTROLS = [
    ("quadtree-fusion-20ep", "quadtree-fusion",
     {"train.epochs": "20"}),
    ("comparative-resnet18-frozen", "comparative-resnet18",
     {"model.freeze_backbone": "true"}),
]


def _watchdog():
    while True:
        time.sleep(30)
        if time.time() - _heartbeat[0] > WATCHDOG_S:
            print(f"[watchdog] no heartbeat for {WATCHDOG_S:.0f}s — "
                  "exiting for relaunch", flush=True)
            os._exit(3)


def run_jobs(root: str, seeds: int) -> bool:
    from surya_tpu.__main__ import _build_data, _build_mesh
    from surya_tpu.core.config import get_preset
    from surya_tpu.core.metrics import MetricsLogger
    from surya_tpu.train import train_and_evaluate

    class HeartbeatLogger(MetricsLogger):
        def log(self, *a, **kw):
            _heartbeat[0] = time.time()
            return super().log(*a, **kw)

    all_done = True
    for name, preset, extra in CONTROLS:
        for seed in range(seeds):
            out_dir = os.path.join(OUT, f"{name}_s{seed}")
            res_path = os.path.join(out_dir, "result.json")
            if os.path.exists(res_path):
                continue
            os.makedirs(out_dir, exist_ok=True)
            cfg = get_preset(preset).override({
                "data.data_root": f"{root}/spatial",
                "data.packed_dir": f"{root}/spatial_packed",
                "train.seed": str(seed),
                "train.checkpoint_dir": os.path.join(out_dir, "ckpt"),
                **extra,
            })
            print(f"== {name} seed {seed}", flush=True)
            _heartbeat[0] = time.time()
            t0 = time.time()
            logger = HeartbeatLogger(
                os.path.join(out_dir, "metrics.jsonl"), echo=False)
            try:
                mesh = _build_mesh(cfg)
                data = _build_data(cfg, pad_eval_to=mesh.shape["data"])
                summary = train_and_evaluate(cfg, data, mesh=mesh,
                                             logger=logger,
                                             checkpoints=False)
            except Exception as e:
                with open(res_path, "w") as f:
                    json.dump({"preset": name, "seed": seed,
                               "error": f"{type(e).__name__}: {e}"}, f)
                print(f"  [FAILED] {name} seed {seed}: {e}", flush=True)
                all_done = False
                continue
            finally:
                logger.close()
            result = {"best_epoch": summary["best_epoch"],
                      "best_metric": summary["best_metric"],
                      "test": {k: float(v)
                               for k, v in summary["test"].items()
                               if k != "confusion"},
                      "preset": name, "base_preset": preset,
                      "overrides": extra, "seed": seed,
                      "wall_seconds": round(time.time() - t0, 1)}
            with open(res_path, "w") as f:
                json.dump(result, f, indent=2)
            print(f"  {name} seed {seed}: "
                  f"test {result['test']['accuracy']:.4f} "
                  f"({result['wall_seconds']:.0f}s)", flush=True)
    return all_done


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/root/datasets/replay224")
    ap.add_argument("--seeds", type=int, default=3)
    ap.add_argument("--supervise", action="store_true")
    args = ap.parse_args()

    if args.supervise:
        inner = [sys.executable, __file__, "--root", args.root,
                 "--seeds", str(args.seeds)]
        for round_i in range(40):
            rc = subprocess.call(inner)
            if rc in (0, 4):
                print("[supervise] controls complete", flush=True)
                return
            print(f"[supervise] relaunch {round_i} (rc {rc})",
                  flush=True)
            time.sleep(60)
        raise SystemExit("supervisor gave up")

    threading.Thread(target=_watchdog, daemon=True).start()
    os.makedirs(OUT, exist_ok=True)
    raise SystemExit(0 if run_jobs(args.root, args.seeds) else 4)


if __name__ == "__main__":
    main()
