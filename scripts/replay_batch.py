"""Unified reference-replay batch runner (round-5 VERDICT item 7).

ONE in-process entry point for every replay job family, so campaigns
cannot drift from the table builder (``scripts/reference_replay.py``
keeps only the table/compare phases; the per-run training all lands
here). Job groups, in the priority order they run:

- ``controls``   — spatial control rows isolating the two flagship-
  inversion mechanisms (epoch budget / position leakage; see the
  mechanism discussion in BENCH_NOTES "What replayed"):
  ``quadtree-fusion`` at ``train.epochs=20`` (epoch-matched deviation
  row) and ``comparative-resnet18`` with a frozen trunk (the regime
  where locality must come from architecture).
- ``temporal``   — the six temporal families at reference hypers
  (``cnn+lstm/training.py:26-29``, ``3dcnn/train_3D_Quadtree_cnn_
  model.py:29-43``, ``VIT/fact_model_train.py:27-31``).
- ``temporal-trainable`` — the frozen-trunk families (cnn-lstm, fact,
  resnet3d-video, hybrid-quadtree-3d) with
  ``model.freeze_backbone=false``: the reference freezes those trunks
  because they are ImageNet/ViT/Kinetics-pretrained; with random init
  a frozen trunk floors at ~0.22, so these rows measure the
  architectures rather than the trunks' randomness.
- ``spatial``    — the published spatial table presets
  (``README.md:140-143``); result.json resume makes this a no-op for
  completed rows (it exists to finish ``comparative-mobilenet-v2``).

Reliability contract (ADVICE round-4 fixes):
- a transient failure writes an error result.json with an ``attempts``
  count; on every pass, error rows below MAX_ATTEMPTS are RETRIED
  (previously they were permanently skipped), and permanent failures
  are listed loudly at the end instead of silently vanishing;
- before every (re)attempt, a stale metrics.jsonl from a killed
  attempt is rotated to ``metrics_attempt{k}.jsonl`` so the committed
  curve reflects only the run that produced result.json;
- a watchdog thread hard-exits (rc 3) when no training heartbeat
  arrives for WATCHDOG_S (the axon tunnel wedges mid-RPC); the
  ``--supervise`` outer loop relaunches, resuming via result.json.

Exit codes: 0 = every job has a test result; 3 = watchdog (supervisor
relaunches); 4 = all jobs visited, some permanently failed (>=
MAX_ATTEMPTS) — the supervisor stops and prints the failed rows.

Run: python scripts/replay_batch.py --supervise
     [--groups controls,temporal,temporal-trainable,spatial]
     [--root /root/datasets/replay224] [--seeds 3]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import subprocess
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

REPLAY = "runs/reference_replay"
WATCHDOG_S = 480.0
MAX_ATTEMPTS = 5
_heartbeat = [time.time()]

SPATIAL_PRESETS = [
    "quadtree-fusion", "experiment-fusion", "experiment-image-only",
    "experiment-numerical-only", "comparative-resnet18",
    "comparative-vgg16", "comparative-mobilenet-v2",
]
TEMPORAL_PRESETS = ["cnn-lstm", "fact", "quadtree-3d",
                    "resnet3d-video", "ji-3dcnn", "hybrid-quadtree-3d"]
T4 = ("cnn-lstm", "fact")   # presets whose seq_len=4 truncates windows


def jobs_for(group: str, root: str, seeds: int):
    """Yield (name, base_preset, out_dir, overrides) for a group."""
    spatial = {"data.data_root": f"{root}/spatial",
               "data.packed_dir": f"{root}/spatial_packed"}

    def temporal(preset):
        pdir = (f"{root}/temporal_packed_t4" if preset in T4
                else f"{root}/temporal_packed_t5")
        return {"data.seq_root": f"{root}/temporal",
                "data.packed_dir": pdir}

    if group == "controls":
        rows = [("quadtree-fusion-20ep", "quadtree-fusion",
                 {**spatial, "train.epochs": "20"}),
                ("comparative-resnet18-frozen", "comparative-resnet18",
                 {**spatial, "model.freeze_backbone": "true"})]
        out = f"{REPLAY}/controls"
    elif group == "temporal":
        rows = [(p, p, temporal(p)) for p in TEMPORAL_PRESETS]
        out = f"{REPLAY}/temporal"
    elif group == "temporal-trainable":
        # every family whose reference regime freezes a (here: random)
        # trunk gets an architecture-measuring row; ji-3dcnn and
        # quadtree-3d are natively trainable already
        rows = [(f"{p}-trainable", p,
                 {**temporal(p), "model.freeze_backbone": "false"})
                for p in T4 + ("resnet3d-video", "hybrid-quadtree-3d")]
        out = f"{REPLAY}/temporal"
    elif group == "spatial":
        rows = [(p, p, dict(spatial)) for p in SPATIAL_PRESETS]
        out = f"{REPLAY}/spatial"
    else:
        raise SystemExit(f"unknown group {group!r}")
    for seed in range(seeds):            # seed-major: every row gets a
        for name, preset, ov in rows:    # seed-0 band before seconds
            yield name, preset, os.path.join(out, f"{name}_s{seed}"), \
                {**ov, "train.seed": str(seed)}


def _watchdog():
    while True:
        time.sleep(30)
        if time.time() - _heartbeat[0] > WATCHDOG_S:
            print(f"[watchdog] no heartbeat for {WATCHDOG_S:.0f}s — "
                  "tunnel wedged, exiting for relaunch", flush=True)
            os._exit(3)


def _rotate_metrics(out_dir: str) -> None:
    """A killed attempt leaves a partial metrics.jsonl; move it aside
    so the surviving curve is single-attempt (ADVICE round-4)."""
    m = os.path.join(out_dir, "metrics.jsonl")
    if os.path.exists(m) and os.path.getsize(m):
        n = len(glob.glob(os.path.join(out_dir, "metrics_attempt*")))
        os.rename(m, os.path.join(out_dir, f"metrics_attempt{n}.jsonl"))


def _load_result(res_path: str):
    try:
        with open(res_path) as f:
            return json.load(f)
    except (OSError, json.JSONDecodeError):
        return None


def run_jobs(groups, root: str, seeds: int):
    from surya_tpu.__main__ import _build_data, _build_mesh
    from surya_tpu.core.config import get_preset
    from surya_tpu.core.metrics import MetricsLogger
    from surya_tpu.train import train_and_evaluate

    class HeartbeatLogger(MetricsLogger):
        def log(self, *a, **kw):
            _heartbeat[0] = time.time()
            return super().log(*a, **kw)

    failed = []
    for group in groups:
        for name, preset, out_dir, overrides in jobs_for(
                group, root, seeds):
            res_path = os.path.join(out_dir, "result.json")
            prev = _load_result(res_path)
            attempts = 0
            if prev is not None:
                if "test" in prev:
                    continue                      # done
                attempts = int(prev.get("attempts", 1))
                if attempts >= MAX_ATTEMPTS:      # permanent failure
                    failed.append((name, prev.get("seed"),
                                   prev.get("error", "?")))
                    continue
                os.remove(res_path)               # retryable error row
            os.makedirs(out_dir, exist_ok=True)
            _rotate_metrics(out_dir)
            seed = int(overrides["train.seed"])
            cfg = get_preset(preset).override({
                **overrides,
                "train.checkpoint_dir": os.path.join(out_dir, "ckpt"),
            })
            print(f"== [{group}] {name} seed {seed}"
                  + (f" (retry {attempts})" if attempts else ""),
                  flush=True)
            _heartbeat[0] = time.time()
            t0 = time.time()
            logger = HeartbeatLogger(
                os.path.join(out_dir, "metrics.jsonl"), echo=False)
            try:
                mesh = _build_mesh(cfg)
                data = _build_data(cfg, pad_eval_to=mesh.shape["data"])
                # spatial rows keep checkpoints: the compare tier
                # (reference_replay --phase compare) evaluates the
                # seed-0 checkpoints (analysis.py:33-167 parity)
                summary = train_and_evaluate(
                    cfg, data, mesh=mesh, logger=logger,
                    checkpoints=(group == "spatial"))
            except Exception as e:
                err = {"preset": name, "base_preset": preset,
                       "seed": seed, "attempts": attempts + 1,
                       "error": f"{type(e).__name__}: {e}"}
                with open(res_path, "w") as f:
                    json.dump(err, f, indent=2)
                print(f"  [FAILED attempt {attempts + 1}/"
                      f"{MAX_ATTEMPTS}] {name} seed {seed}: {e}",
                      flush=True)
                if attempts + 1 >= MAX_ATTEMPTS:
                    failed.append((name, seed, err["error"]))
                continue
            finally:
                logger.close()
            result = {"best_epoch": summary["best_epoch"],
                      "best_metric": summary["best_metric"],
                      "test": {k: float(v)
                               for k, v in summary["test"].items()
                               if k != "confusion"},
                      "preset": name, "base_preset": preset,
                      "overrides": {k: v for k, v in overrides.items()
                                    if not k.startswith("data.")},
                      "seed": seed,
                      "wall_seconds": round(time.time() - t0, 1),
                      "runner": "replay_batch in-process (same presets/"
                                "pipeline/loop as the CLI cmd_train)"}
            with open(res_path, "w") as f:
                json.dump(result, f, indent=2)
            print(f"  {name} seed {seed}: "
                  f"test {result['test']['accuracy']:.4f} "
                  f"({result['wall_seconds']:.0f}s)", flush=True)
    return failed


def pending(groups, root, seeds) -> bool:
    """True if any job still lacks a result (done or permanent-fail)."""
    for group in groups:
        for _, _, out_dir, _ in jobs_for(group, root, seeds):
            prev = _load_result(os.path.join(out_dir, "result.json"))
            if prev is None or ("test" not in prev and
                                int(prev.get("attempts", 1))
                                < MAX_ATTEMPTS):
                return True
    return False


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/root/datasets/replay224")
    ap.add_argument("--seeds", type=int, default=3)
    ap.add_argument("--groups", default="controls,temporal,"
                                        "temporal-trainable,spatial")
    ap.add_argument("--supervise", action="store_true")
    args = ap.parse_args()
    groups = [g for g in args.groups.split(",") if g]

    if args.supervise:
        inner = [sys.executable, __file__, "--root", args.root,
                 "--seeds", str(args.seeds), "--groups", args.groups]
        for round_i in range(60):
            rc = subprocess.call(inner)
            if rc == 0:
                print("[supervise] batch complete", flush=True)
                return
            if rc == 4:
                print("[supervise] batch complete WITH PERMANENT "
                      "FAILURES (see rows above)", flush=True)
                return
            print(f"[supervise] relaunch {round_i} (rc {rc})",
                  flush=True)
            time.sleep(60)
        raise SystemExit("supervisor gave up after 60 relaunches")

    threading.Thread(target=_watchdog, daemon=True).start()
    failed = run_jobs(groups, args.root, args.seeds)
    if pending(groups, args.root, args.seeds):
        raise SystemExit(4 if failed else 1)
    if failed:
        print("== permanently failed rows:", flush=True)
        for name, seed, err in failed:
            print(f"  {name} seed {seed}: {err}", flush=True)
        raise SystemExit(4)
    raise SystemExit(0)


if __name__ == "__main__":
    main()
