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

Each subprocess is one real CLI invocation; per-run stdout JSON is
cached as ``result.json`` so the campaign is resumable. The final
``table.json`` mirrors the reference's table shape: per-model seed
bands (mean ± std over seeds) with accuracy/precision/recall/F1 and
the ordering checks.

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
import time

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
STALL_SECONDS = 360     # no metrics.jsonl growth for this long = wedged
ATTEMPTS = 5
PROBE = ("import jax, jax.numpy as jnp; "
         "print(jnp.ones((8, 8)).sum())")


def wait_for_tpu(max_wait: float = 7200) -> None:
    """Block until the axon tunnel serves a tiny compute (it goes
    fully down at times — CLAUDE.md); probe every 90 s."""
    t0 = time.time()
    while True:
        try:
            p = subprocess.run([sys.executable, "-c", PROBE],
                               capture_output=True, text=True,
                               timeout=120)
            if p.returncode == 0:
                return
        except subprocess.TimeoutExpired:
            pass
        if time.time() - t0 > max_wait:
            raise RuntimeError(f"TPU unreachable for {max_wait:.0f}s")
        print(f"  [tpu-wait] tunnel down {time.time() - t0:.0f}s, "
              "reprobing in 90s", flush=True)
        time.sleep(90)


def run_cli(args_list, timeout=RUN_TIMEOUT):
    p = subprocess.run([sys.executable, "-m", "surya_tpu"] + args_list,
                       cwd=REPO, capture_output=True, text=True,
                       timeout=timeout)
    return p


def _run_watched(cli_args, out_dir, timeout, log):
    """Run one CLI subprocess with a progress watchdog: the axon TPU
    tunnel can wedge mid-run (an RPC never returns — CLAUDE.md), which
    a plain timeout only catches an hour later. Kill + signal a retry
    if metrics.jsonl stops growing for STALL_SECONDS."""
    metrics = os.path.join(out_dir, "metrics.jsonl")
    with open(log, "w") as lf:
        proc = subprocess.Popen(
            [sys.executable, "-m", "surya_tpu"] + cli_args,
            cwd=REPO, stdout=lf, stderr=subprocess.STDOUT, text=True)
        t0 = time.time()
        last_size, last_change = -1, time.time()
        while True:
            try:
                proc.wait(timeout=20)
                break
            except subprocess.TimeoutExpired:
                pass
            size = (os.path.getsize(metrics)
                    if os.path.exists(metrics) else -1)
            if size != last_size:
                last_size, last_change = size, time.time()
            stalled = time.time() - last_change > STALL_SECONDS
            if stalled or time.time() - t0 > timeout:
                proc.terminate()
                try:
                    proc.wait(timeout=15)
                except subprocess.TimeoutExpired:
                    proc.kill()
                    proc.wait()
                return None, ("stalled" if stalled else "timeout")
    with open(log) as lf:
        out = lf.read()
    return (out, None) if proc.returncode == 0 else (out, "failed")


def train_one(preset, seed, out_dir, overrides):
    """One CLI train run (watchdogged, retried); returns the final
    stdout JSON dict."""
    res_path = os.path.join(out_dir, "result.json")
    if os.path.exists(res_path):
        with open(res_path) as f:
            return json.load(f)
    cli = ["train", "--preset", preset, "--out", out_dir,
           f"--train.seed={seed}"] + overrides
    t0 = time.time()
    for attempt in range(ATTEMPTS):
        out, err = _run_watched(cli, out_dir,
                                RUN_TIMEOUT, os.path.join(
                                    out_dir, f"run_{attempt}.log"))
        if err is None:
            break
        print(f"  [retry] {preset} seed {seed}: attempt {attempt} "
              f"{err}", flush=True)
        wait_for_tpu()  # don't burn attempts while the tunnel is down
    else:
        raise RuntimeError(f"train {preset} seed {seed}: all "
                           f"{ATTEMPTS} attempts failed ({err})")
    line = next((ln for ln in reversed(out.strip().splitlines())
                 if ln.startswith("{")), None)
    if line is None:
        sys.stderr.write(out[-3000:])
        raise RuntimeError(f"train {preset} seed {seed}: no result "
                           "line")
    result = json.loads(line)
    result.update(preset=preset, seed=seed,
                  wall_seconds=round(time.time() - t0, 1))
    with open(res_path, "w") as f:
        json.dump(result, f, indent=2)
    return result


def campaign(presets, seeds, out_root, overrides):
    results = []
    for preset in presets:
        for seed in range(seeds):
            out_dir = os.path.join(out_root, f"{preset}_s{seed}")
            os.makedirs(out_dir, exist_ok=True)
            try:
                r = train_one(preset, seed, out_dir, overrides)
            except RuntimeError as e:
                # tunnel-init flakiness: skip, keep the campaign going;
                # re-invoking the phase retries (result.json caching)
                print(f"  [FAILED] {preset} seed {seed}: {e}",
                      flush=True)
                continue
            acc = r["test"]["accuracy"]
            print(f"  {preset} seed {seed}: test {acc:.4f} "
                  f"({r.get('wall_seconds', 0):.0f}s)", flush=True)
            results.append(r)
    return results


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
                    choices=("spatial", "temporal", "compare", "table",
                             "all"))
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    spatial_root = os.path.join(args.root, "spatial")
    packed = os.path.join(args.root, "spatial_packed")
    temporal_root = os.path.join(args.root, "temporal")

    if args.phase in ("spatial", "all"):
        if not os.path.isdir(packed):
            print("== packing spatial replay dataset", flush=True)
            p = run_cli(["pack", "--root", spatial_root, "--out", packed,
                         "--staging", "256"])
            print(p.stdout.strip()[-200:])
            assert p.returncode == 0, p.stderr[-2000:]
        print("== spatial campaign", flush=True)
        campaign(SPATIAL_PRESETS, args.seeds,
                 os.path.join(args.out, "spatial"),
                 [f"--data.data_root={spatial_root}",
                  f"--data.packed_dir={packed}"])

    if args.phase in ("temporal", "all"):
        print("== temporal campaign", flush=True)
        # PackedSequenceSource auto-builds per seq_len on first use
        # (windows truncate 5→4 with the loader's repeat-last parity)
        t4 = [p for p in TEMPORAL_PRESETS if p in ("cnn-lstm", "fact")]
        t5 = [p for p in TEMPORAL_PRESETS if p not in t4]
        for presets, pdir in ((t4, f"{temporal_root}_packed_t4"),
                              (t5, f"{temporal_root}_packed_t5")):
            campaign(presets, args.seeds,
                     os.path.join(args.out, "temporal"),
                     [f"--data.seq_root={temporal_root}",
                      f"--data.packed_dir={pdir}"])

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
        results = []
        for sub in ("spatial", "temporal"):
            d = os.path.join(args.out, sub)
            if not os.path.isdir(d):
                continue
            for run in sorted(os.listdir(d)):
                rp = os.path.join(d, run, "result.json")
                if os.path.exists(rp):
                    with open(rp) as f:
                        r = json.load(f)
                    if "test" in r:  # skip error-recorded runs
                        results.append(r)
        b = bands(results)
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
        if "cnn-lstm" in b:
            for other in TEMPORAL_PRESETS:
                if other != "cnn-lstm" and other in b:
                    orderings[f"{other}_gt_cnn-lstm"] = separated(
                        b[other], b["cnn-lstm"])
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
            "orderings": orderings,
        }
        with open(os.path.join(args.out, "table.json"), "w") as f:
            json.dump(table, f, indent=2)
        print(json.dumps({"bands": {k: round(v["mean"], 4)
                                    for k, v in sorted(b.items())},
                          "orderings": orderings}, indent=2))


if __name__ == "__main__":
    main()
