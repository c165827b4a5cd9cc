"""Temporal replay campaign, in-process batch runner (VERDICT item 4).

The pure-CLI campaign (scripts/reference_replay.py) pays a fresh jax +
axon-tunnel startup per run; mid-round the tunnel's availability
dropped to the point where startup stalls dominated wall time. This
runner keeps the EVIDENCE contract — the exact presets
(``cnn+lstm/training.py:26-29``, ``3dcnn/train_3D_Quadtree_cnn_model
.py:29-43``, ``VIT/fact_model_train.py:27-31``), the packed sequence
pipeline, the library train loop (the same ``_build_data`` +
``train_and_evaluate`` path the CLI's ``cmd_train`` drives) — but runs
all (preset, seed) jobs in ONE process, so one startup is amortized
over the whole batch. Results land in the same
``runs/reference_replay/temporal/<preset>_s<seed>/result.json`` layout
the table phase consumes.

Self-healing: a watchdog thread hard-exits (rc 3) if no training
heartbeat for WATCHDOG_S — the relaunch loop (``--supervise``) then
restarts the process, which skips completed jobs via result.json.

Run: python scripts/replay_temporal_batch.py [--supervise]
     [--root /root/datasets/replay224] [--seeds 3]
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

OUT = "runs/reference_replay/temporal"
PRESETS = ["cnn-lstm", "fact", "quadtree-3d", "resnet3d-video",
           "ji-3dcnn", "hybrid-quadtree-3d"]
T4 = ("cnn-lstm", "fact")
WATCHDOG_S = 480.0

_heartbeat = [time.time()]


def _watchdog():
    while True:
        time.sleep(30)
        if time.time() - _heartbeat[0] > WATCHDOG_S:
            print(f"[watchdog] no heartbeat for {WATCHDOG_S:.0f}s — "
                  "tunnel wedged, exiting for relaunch", flush=True)
            os._exit(3)


def run_jobs(root: str, seeds: int) -> bool:
    """Returns True when every job has a result.json."""
    from surya_tpu.__main__ import _build_data, _build_mesh
    from surya_tpu.core.config import get_preset
    from surya_tpu.core.metrics import MetricsLogger
    from surya_tpu.train import train_and_evaluate

    class HeartbeatLogger(MetricsLogger):
        def log(self, *a, **kw):
            _heartbeat[0] = time.time()
            return super().log(*a, **kw)

    all_done = True
    # seed-major: every family lands a seed-0 row before second seeds
    # (graceful degradation under tunnel outages)
    for seed in range(seeds):
        for preset in PRESETS:
            out_dir = os.path.join(OUT, f"{preset}_s{seed}")
            res_path = os.path.join(out_dir, "result.json")
            if os.path.exists(res_path):
                continue
            os.makedirs(out_dir, exist_ok=True)
            pdir = (f"{root}/temporal_packed_t4" if preset in T4
                    else f"{root}/temporal_packed_t5")
            cfg = get_preset(preset).override({
                "data.seq_root": f"{root}/temporal",
                "data.packed_dir": pdir,
                "train.seed": str(seed),
                "train.checkpoint_dir": os.path.join(out_dir, "ckpt"),
            })
            print(f"== {preset} seed {seed}", flush=True)
            _heartbeat[0] = time.time()
            t0 = time.time()
            logger = HeartbeatLogger(
                os.path.join(out_dir, "metrics.jsonl"))
            try:
                mesh = _build_mesh(cfg)
                data = _build_data(cfg, pad_eval_to=mesh.shape["data"])
                summary = train_and_evaluate(cfg, data, mesh=mesh,
                                             logger=logger,
                                             checkpoints=False)
            except Exception as e:  # record, don't relaunch-loop on it
                result = {"preset": preset, "seed": seed,
                          "error": f"{type(e).__name__}: {e}"}
                with open(res_path, "w") as f:
                    json.dump(result, f, indent=2)
                print(f"  [FAILED] {preset} seed {seed}: {e}",
                      flush=True)
                all_done = False
                continue
            finally:
                logger.close()
            test = {k: v for k, v in summary["test"].items()
                    if k != "confusion"}
            result = {"best_epoch": summary["best_epoch"],
                      "best_metric": summary["best_metric"],
                      "test": {k: float(v) for k, v in test.items()},
                      "preset": preset, "seed": seed,
                      "wall_seconds": round(time.time() - t0, 1),
                      "runner": "in-process batch (same presets/"
                                "pipeline/loop as the CLI; startup "
                                "amortized — see script docstring)"}
            with open(res_path, "w") as f:
                json.dump(result, f, indent=2)
            print(f"  {preset} seed {seed}: "
                  f"test {result['test']['accuracy']:.4f} "
                  f"({result['wall_seconds']:.0f}s)", flush=True)
    return all_done


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/root/datasets/replay224")
    ap.add_argument("--seeds", type=int, default=3)
    ap.add_argument("--supervise", action="store_true",
                    help="relaunch-on-stall outer loop")
    args = ap.parse_args()

    if args.supervise:
        inner = [sys.executable, __file__, "--root", args.root,
                 "--seeds", str(args.seeds)]
        for round_i in range(40):
            rc = subprocess.call(inner)
            if rc == 0:
                print("[supervise] batch complete", flush=True)
                return
            if rc == 4:  # all jobs visited; some recorded errors
                print("[supervise] batch complete with recorded "
                      "failures", flush=True)
                return
            print(f"[supervise] relaunch {round_i} (rc {rc})",
                  flush=True)
            time.sleep(60)
        raise SystemExit("supervisor gave up after 40 relaunches")

    threading.Thread(target=_watchdog, daemon=True).start()
    os.makedirs(OUT, exist_ok=True)
    done = run_jobs(args.root, args.seeds)
    raise SystemExit(0 if done else 4)


if __name__ == "__main__":
    main()
