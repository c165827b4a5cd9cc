"""Reference-replay campaign (round-4 VERDICT items 1 + 4).

Reproduces the reference's comparison tables *as a user would produce
them* — presets + CLI + compare tier, no bespoke loops:

- spatial (``/root/reference/README.md:140-143``): `quadtree-fusion`,
  the three `experiment-*` ablations and the `comparative-*` backbones
  driven through ``python -m surya_tpu train`` on the 224px replay
  dataset (packed pipeline), ≥3 seeds each, then the
  ``python -m surya_tpu compare`` tier on the seed-0 checkpoints;
- temporal (``README.md:149``, CNN+LSTM ~71.68% = weakest family):
  `cnn-lstm`, `ji-3dcnn`, `quadtree-3d`, `resnet3d-video`,
  `hybrid-quadtree-3d`, `fact` on the temporal replay windows.

Training runs are delegated to the unified in-process batch runner
(``scripts/replay_batch.py`` — one campaign entry point, watchdogged
against tunnel stalls, resumable via per-run ``result.json``); this
script owns the pack/compare phases and the final ``table.json``,
which mirrors the reference's table shape: per-model seed bands
(mean ± std over seeds) with accuracy/precision/recall/F1, the
ordering checks, control-row bands, and an explicit ``failures`` list
(error rows are surfaced, never silently dropped).

Run: python scripts/reference_replay.py --phase all
     [--root /root/datasets/replay224] [--seeds 3]
     [--out runs/reference_replay]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SPATIAL_PRESETS = [
    # the reference's README:140-143 table = QuadtreeCNN vs ResNet-18 /
    # VGG-16 / MobileNet-V2 (+ our ablation rows). comparative-resnet50
    # and -densenet121 presets exist and are suite-tested but are not
    # in the published table — omitted to keep the campaign inside the
    # tunnel's availability budget.
    "quadtree-fusion",
    "experiment-fusion",
    "experiment-image-only",
    "experiment-numerical-only",
    "comparative-resnet18",
    "comparative-vgg16",
    "comparative-mobilenet-v2",
]
TEMPORAL_PRESETS = [            # VERDICT-item-4 families first
    "cnn-lstm",
    "fact",
    "quadtree-3d",
    "resnet3d-video",
    "ji-3dcnn",
    "hybrid-quadtree-3d",
]
# presets whose seq_len (5) matches the stored windows; cnn-lstm/fact
# use T=4 and truncate (repeat-last-frame parity semantics,
# cnn+lstm/dataloader.py:50-62)

RUN_TIMEOUT = 3600


def run_cli(args_list, timeout=RUN_TIMEOUT):
    p = subprocess.run([sys.executable, "-m", "surya_tpu"] + args_list,
                       cwd=REPO, capture_output=True, text=True,
                       timeout=timeout)
    return p


def bands(results):
    out = {}
    for preset in {r["preset"] for r in results}:
        rs = [r for r in results if r["preset"] == preset]
        accs = [r["test"]["accuracy"] for r in rs]
        out[preset] = {
            "mean": float(np.mean(accs)), "std": float(np.std(accs)),
            "accs": accs,
            "precision": float(np.mean(
                [r["test"].get("precision", 0) for r in rs])),
            "recall": float(np.mean(
                [r["test"].get("recall", 0) for r in rs])),
            "f1": float(np.mean([r["test"].get("f1", 0) for r in rs])),
        }
    return out


def separated(hi, lo):
    """Non-overlapping seed bands: mean-std of hi above mean+std of lo."""
    return bool(hi["mean"] - hi["std"] > lo["mean"] + lo["std"])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/root/datasets/replay224")
    ap.add_argument("--out", default="runs/reference_replay")
    ap.add_argument("--seeds", type=int, default=3)
    ap.add_argument("--phase", default="all",
                    choices=("spatial", "temporal", "controls",
                             "compare", "table", "all"))
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    spatial_root = os.path.join(args.root, "spatial")
    packed = os.path.join(args.root, "spatial_packed")
    temporal_root = os.path.join(args.root, "temporal")

    if args.phase in ("spatial", "temporal", "controls", "all"):
        # Training runs are owned by the unified in-process batch
        # runner (round-5 consolidation — one campaign entry point so
        # job lists can't drift from this table builder).
        if not os.path.isdir(packed):
            print("== packing spatial replay dataset", flush=True)
            p = run_cli(["pack", "--root", spatial_root, "--out", packed,
                         "--staging", "256"])
            print(p.stdout.strip()[-200:])
            assert p.returncode == 0, p.stderr[-2000:]
        groups = {"spatial": "spatial",
                  "temporal": "temporal,temporal-trainable",
                  "controls": "controls",
                  "all": "controls,temporal,temporal-trainable,"
                         "spatial"}[args.phase]
        print(f"== delegating to replay_batch --groups {groups}",
              flush=True)
        rc = subprocess.call(
            [sys.executable, os.path.join(REPO, "scripts",
                                          "replay_batch.py"),
             "--supervise", "--root", args.root,
             "--seeds", str(args.seeds), "--groups", groups], cwd=REPO)
        if rc != 0:
            print(f"  [replay_batch rc {rc}]", flush=True)

    if args.phase in ("compare", "all"):
        print("== compare tier (seed-0 checkpoints)", flush=True)
        entries = [
            f"{p}={os.path.join(args.out, 'spatial', p + '_s0', 'ckpt')}"
            f":{p}"
            for p in ("quadtree-fusion", "comparative-resnet18",
                      "comparative-vgg16", "comparative-mobilenet-v2")]
        p = run_cli(["compare"] + entries +
                    ["--split", "valid", "--out",
                     os.path.join(args.out, "compare"),
                     f"--data.data_root={spatial_root}",
                     f"--data.packed_dir={packed}"])
        print(p.stdout.strip()[-500:])
        if p.returncode != 0:
            sys.stderr.write(p.stderr[-3000:])

    if args.phase in ("table", "all"):
        results, control_results, failures = [], [], []
        for sub in ("spatial", "temporal", "controls"):
            d = os.path.join(args.out, sub)
            if not os.path.isdir(d):
                continue
            for run in sorted(os.listdir(d)):
                rp = os.path.join(d, run, "result.json")
                if not os.path.exists(rp):
                    failures.append({"run": f"{sub}/{run}",
                                     "error": "no result.json "
                                              "(run never completed)"})
                    continue
                with open(rp) as f:
                    r = json.load(f)
                if "test" not in r:   # error row: surface, don't drop
                    failures.append({"run": f"{sub}/{run}",
                                     "error": r.get("error", "?"),
                                     "attempts": r.get("attempts")})
                    continue
                (control_results if sub == "controls"
                 else results).append(r)
        b = bands(results)
        cb = bands(control_results)
        orderings = {}
        if "quadtree-fusion" in b:
            for other in ("comparative-resnet18", "comparative-resnet50",
                          "comparative-vgg16", "comparative-mobilenet-v2",
                          "comparative-densenet121",
                          "experiment-image-only",
                          "experiment-numerical-only"):
                if other in b:
                    orderings[f"quadtree-fusion_gt_{other}"] = separated(
                        b["quadtree-fusion"], b[other])
            qf = b["quadtree-fusion"]["mean"]
            orderings["flagship_unsaturated"] = bool(qf < 0.99)
            orderings["flagship_band"] = [
                round(b["quadtree-fusion"]["mean"]
                      - b["quadtree-fusion"]["std"], 4),
                round(b["quadtree-fusion"]["mean"]
                      + b["quadtree-fusion"]["std"], 4)]
        if "experiment-fusion" in b and "experiment-image-only" in b:
            orderings["fusion_gt_image_only"] = separated(
                b["experiment-fusion"], b["experiment-image-only"])
        if ("experiment-image-only" in b
                and "experiment-numerical-only" in b):
            orderings["image_only_gt_numerical_only"] = separated(
                b["experiment-image-only"], b["experiment-numerical-only"])
        # temporal: the reference's claim is CNN+LSTM weakest
        # (README.md:149). Frozen-trunk rows floor at the random-trunk
        # ceiling, so the trainable rows (cnn-lstm-trainable /
        # fact-trainable) are the architecture-measuring comparison.
        temporal_all = TEMPORAL_PRESETS + [f"{p}-trainable"
                                           for p in TEMPORAL_PRESETS]
        for base in ("cnn-lstm", "cnn-lstm-trainable"):
            if base not in b:
                continue
            for other in temporal_all:
                if other != base and other in b:
                    orderings[f"{other}_gt_{base}"] = separated(
                        b[other], b[base])
        # controls (deviation rows): (a) epoch-matched flagship vs the
        # 20-ep trainable baselines; (b) frozen-regime quadtree
        # (experiment-fusion) vs frozen resnet18 at the same 224px
        # operating point.
        if "quadtree-fusion-20ep" in cb and "comparative-resnet18" in b:
            orderings["ctrl_quadtree-20ep_gt_resnet18"] = separated(
                cb["quadtree-fusion-20ep"], b["comparative-resnet18"])
            orderings["ctrl_quadtree-20ep_band"] = [
                round(cb["quadtree-fusion-20ep"]["mean"]
                      - cb["quadtree-fusion-20ep"]["std"], 4),
                round(cb["quadtree-fusion-20ep"]["mean"]
                      + cb["quadtree-fusion-20ep"]["std"], 4)]
        if ("comparative-resnet18-frozen" in cb
                and "experiment-fusion" in b):
            orderings["ctrl_frozen-quadtree_gt_frozen-resnet18"] = \
                separated(b["experiment-fusion"],
                          cb["comparative-resnet18-frozen"])
        table = {
            "meta": {
                "dataset": args.root,
                "seeds": args.seeds,
                "reference_table": "README.md:140-143 (spatial), "
                                   ":149 (temporal)",
                "hypers": "preset-encoded (Quadtree_train.py:18-23, "
                          "experiment/train_cnn_model.py:29-33, "
                          "cnn+lstm/training.py:26-29, "
                          "3dcnn/train_3D_Quadtree_cnn_model.py:29-43, "
                          "VIT/fact_model_train.py:27-31)",
                "pipeline": "python -m surya_tpu train (packed spatial"
                            " cache; .npz sequence windows)",
            },
            "bands": dict(sorted(b.items())),
            "control_bands": dict(sorted(cb.items())),
            "failures": failures,
            "orderings": orderings,
        }
        with open(os.path.join(args.out, "table.json"), "w") as f:
            json.dump(table, f, indent=2)
        print(json.dumps({"bands": {k: round(v["mean"], 4)
                                    for k, v in sorted(b.items())},
                          "orderings": orderings}, indent=2))


if __name__ == "__main__":
    main()
