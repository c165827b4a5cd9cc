"""Augmentation-value A/B (round-4 VERDICT item 3): does multiview
generative augmentation improve downstream temporal accuracy?

The reference's Zero123-Plus stage exists to multiply training views
feeding the sequence datasets (``Zero123/batch_aug.py:47`` →
``cnn+lstm/prepare_sequential_dataset.py:141`` consumes ``_view_NN``
files). Its pretrained diffusion weights are egress-blocked here, so
this study uses the synthetic pose renderer as an ORACLE novel-view
generator: :func:`surya_tpu.data.synthetic_pose.articulate` fixes a
pose identity (joint angles) and
:func:`~surya_tpu.data.synthetic_pose.camera_transform` renders it
under fresh global camera transforms — genuine novel views of the same
pose, which is exactly the capability Zero123 supplies.

Protocol:
- 8 articulation-preset classes (``class_swing_centers``); per class,
  disjoint TRAIN/VALID/TEST *clips* (generalization over clips+cameras,
  the reference's own split axis — ``Data_organiser.py:151-171``).
- Every clip: F frames of a smooth joint-angle random walk, rendered
  under the clip's own camera (= ``_view_00``); 47-vector features from
  the noisy landmarks (MediaPipe-noise stand-in) via
  ``extract_features_47``.
- AUGMENTED arm additionally renders V novel views per TRAIN clip
  (fresh cameras, same poses). Valid/test are view-00 only in BOTH
  arms — identical eval windows.
- Both arms run the real pipeline: ``build_sequence_dataset``
  (SEQ_LEN=4, STRIDE=2 — ``prepare_sequential_dataset.py:22-23``) then
  the `cnn-lstm` preset through the CLI, N seeds each.

Output: runs/augmentation_value/ab.json with per-arm seed bands.

Run: python scripts/augmentation_value_ab.py [--phase all]
     [--seeds 3] [--views 3] [--root /root/datasets/augval]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

OUT = "runs/augmentation_value"
CLIPS = {"train": 5, "valid": 2, "test": 3}
FRAMES = 10
IMAGE_SIZE = 224
LM_NOISE = 0.04          # landmark noise fed to the feature extractor
SWING_WALK = 0.18        # per-frame joint-angle random-walk step
SWING_START = 0.25       # initial offset from the class center


def _cameras(rng, n):
    return [{"theta": float(rng.uniform(-0.45, 0.45)),
             "scale": float(rng.uniform(0.60, 0.90)),
             "trans": rng.uniform(-0.10, 0.10, 2).astype(np.float32)}
            for _ in range(n)]


def generate(root: str, views: int, seed: int = 0):
    import jax
    import jax.numpy as jnp
    from PIL import Image

    from surya_tpu.data.synthetic_pose import (
        _CHAIN_RANGE,
        TEMPLATE_XY,
        articulate,
        camera_transform,
        class_swing_centers,
        render_pose,
    )
    from surya_tpu.features import extract_features_47

    rng = np.random.default_rng(seed)
    centers = class_swing_centers(8)

    @jax.jit
    def render_clip(swings, thetas, scales, trans, leans):
        """(F,8) swings + per-frame camera → (F,S,S,3) u8, (F,33,4)."""
        def one(sw, th, sc, tr, lean):
            xy = camera_transform(articulate(sw), sc, th, tr)
            # depth from the template lean model (sample_pose parity)
            z = lean * (jnp.asarray(TEMPLATE_XY)[:, 1] - 0.55)
            img = render_pose(xy, z, IMAGE_SIZE)
            inside = jnp.prod(
                jax.nn.sigmoid(xy / 0.01)
                * jax.nn.sigmoid((1.0 - xy) / 0.01), axis=-1)
            lm = jnp.concatenate(
                [xy, z[:, None], jnp.clip(inside, 0, 1)[:, None]], -1)
            return (jnp.clip(img * 255, 0, 255).astype(jnp.uint8), lm)

        return jax.vmap(one)(swings, thetas, scales, trans, leans)

    aug_base = os.path.join(root, "frames_base")
    aug_full = os.path.join(root, "frames_aug")
    flat = os.path.join(root, "flat")
    clip_id = 0
    for split, n_clips in CLIPS.items():
        for c in range(8):
            label = f"pose_{c}"
            for _ in range(n_clips):
                clip_id += 1
                clip = f"video_clip_{clip_id:03d}"
                # smooth articulation walk around the class center
                sw = np.empty((FRAMES, 8), np.float32)
                cur = centers[c] + SWING_START * _CHAIN_RANGE * \
                    rng.standard_normal(8).astype(np.float32)
                for t in range(FRAMES):
                    cur = np.clip(
                        cur + SWING_WALK * _CHAIN_RANGE
                        * rng.standard_normal(8).astype(np.float32),
                        -_CHAIN_RANGE, _CHAIN_RANGE)
                    sw[t] = cur
                lean = float(rng.uniform(-0.3, 0.3))
                n_views = 1 + (views if split == "train" else 0)
                cams = _cameras(rng, n_views)
                for v, cam in enumerate(cams):
                    imgs, lms = render_clip(
                        jnp.asarray(sw),
                        jnp.full((FRAMES,), cam["theta"]),
                        jnp.full((FRAMES,), cam["scale"]),
                        jnp.tile(jnp.asarray(cam["trans"]), (FRAMES, 1)),
                        jnp.full((FRAMES,), lean))
                    imgs = np.asarray(imgs)
                    lms = np.asarray(lms)
                    targets = [aug_full] if v > 0 else [aug_base,
                                                        aug_full]
                    for t in range(FRAMES):
                        fname = f"{clip}_frame_{t:05d}_view_{v:02d}.png"
                        for troot in targets:
                            d = os.path.join(troot, split, label)
                            os.makedirs(d, exist_ok=True)
                            Image.fromarray(imgs[t]).save(
                                os.path.join(d, fname))
                    if v == 0:
                        # features from NOISY view-00 landmarks
                        noisy = lms.copy()
                        noisy[:, :, :2] += LM_NOISE * rng.standard_normal(
                            (FRAMES, 33, 2)).astype(np.float32)
                        feats = np.asarray(extract_features_47(
                            jnp.asarray(noisy)))
                        fd = os.path.join(flat, split, label)
                        os.makedirs(fd, exist_ok=True)
                        for t in range(FRAMES):
                            np.save(os.path.join(
                                fd, f"{clip}_frame_{t:05d}_frame_"
                                    f"{t:05d}.npy"), feats[t])
        print(f"  generated {split}: {8 * n_clips} clips", flush=True)

    from surya_tpu.data.sequences import build_sequence_dataset

    for arm, aug_root in (("base", aug_base), ("aug", aug_full)):
        out_root = os.path.join(root, f"seq_{arm}")
        counts = build_sequence_dataset(aug_root, flat, out_root,
                                        seq_len=4, stride=2,
                                        image_size=IMAGE_SIZE)
        print(f"  windows[{arm}]: {counts}", flush=True)


def train_arm(root, arm, seed, preset="cnn-lstm", trainable=False):
    """One in-process preset run (same presets/pipeline/loop as the
    CLI's cmd_train; startup amortized across the batch — the axon
    tunnel's per-process init stalls dominate subprocess runs).

    ``trainable`` unfreezes the image trunk: the reference-parity
    cnn-lstm freezes its ResNet (``cnn+lstm/models.py:26-27``) because
    it is ImageNet-pretrained; with random weights a frozen trunk
    cripples the image path — the only path novel VIEWS can help — so
    the A/B is also run in the trainable regime where the mechanism
    can act."""
    tag = f"{preset}-trainable" if trainable else preset
    out_dir = os.path.join(OUT, f"{tag}_{arm}_s{seed}")
    res_path = os.path.join(out_dir, "result.json")
    if os.path.exists(res_path):
        with open(res_path) as f:
            return json.load(f)
    os.makedirs(out_dir, exist_ok=True)

    from surya_tpu.__main__ import _build_data, _build_mesh
    from surya_tpu.core.config import get_preset
    from surya_tpu.core.metrics import MetricsLogger
    from surya_tpu.train import train_and_evaluate

    cfg = get_preset(preset).override({
        "data.seq_root": os.path.join(root, "seq_" + arm),
        "train.seed": str(seed),
        "train.checkpoint_dir": os.path.join(out_dir, "ckpt"),
        **({"model.freeze_backbone": "false"} if trainable else {}),
    })
    t0 = time.time()
    logger = MetricsLogger(os.path.join(out_dir, "metrics.jsonl"),
                           echo=False)
    try:
        mesh = _build_mesh(cfg)
        data = _build_data(cfg, pad_eval_to=mesh.shape["data"])
        summary = train_and_evaluate(cfg, data, mesh=mesh,
                                     logger=logger, checkpoints=False)
    finally:
        logger.close()
    r = {"best_epoch": summary["best_epoch"],
         "best_metric": summary["best_metric"],
         "test": {k: float(v) for k, v in summary["test"].items()
                  if k != "confusion"},
         "arm": arm, "seed": seed, "preset": tag,
         "wall_seconds": round(time.time() - t0, 1)}
    with open(res_path, "w") as f:
        json.dump(r, f, indent=2)
    return r


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/root/datasets/augval")
    ap.add_argument("--seeds", type=int, default=3)
    ap.add_argument("--views", type=int, default=3)
    ap.add_argument("--preset", default="cnn-lstm")
    ap.add_argument("--phase", default="all",
                    choices=("generate", "train", "combine", "all"))
    ap.add_argument("--trainable", action="store_true",
                    help="unfreeze the image trunk (see train_arm)")
    ap.add_argument("--cpu", action="store_true",
                    help="render the dataset on host CPU (the "
                         "JAX_PLATFORMS env var is ignored here — "
                         "axon latches the platform; see CLAUDE.md)")
    args = ap.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    os.makedirs(OUT, exist_ok=True)

    if args.phase in ("generate", "all") and not os.path.isdir(
            os.path.join(args.root, "seq_aug")):
        print("== generating oracle-multiview dataset", flush=True)
        generate(args.root, args.views)

    if args.phase in ("train", "all"):
        results = []
        for seed in range(args.seeds):       # seed-major: pairs first
            for arm in ("base", "aug"):
                r = train_arm(args.root, arm, seed, args.preset,
                              trainable=args.trainable)
                print(f"  {arm} seed {seed}: "
                      f"test {r['test']['accuracy']:.4f}", flush=True)
                results.append(r)
        bands = {}
        for arm in ("base", "aug"):
            accs = [r["test"]["accuracy"] for r in results
                    if r["arm"] == arm]
            bands[arm] = {"mean": float(np.mean(accs)),
                          "std": float(np.std(accs)), "accs": accs}
        gain = bands["aug"]["mean"] - bands["base"]["mean"]
        sep = (bands["aug"]["mean"] - bands["aug"]["std"]
               > bands["base"]["mean"] + bands["base"]["std"])
        ab = {
            "meta": {
                "mechanism": "oracle novel views via articulate()+"
                             "camera_transform() (Zero123 stand-in, "
                             "Zero123/batch_aug.py:47)",
                "preset": (f"{args.preset}-trainable" if args.trainable
                           else args.preset),
                "regime": ("trainable trunk (mechanism-enabled)"
                           if args.trainable else
                           "frozen trunk (cnn+lstm/models.py:26-27 "
                           "parity; random weights — image path "
                           "crippled)"),
                "seeds": args.seeds,
                "views_per_train_clip": 1 + args.views,
                "eval": "valid/test are view-00 windows of HELD-OUT "
                        "clips, identical across arms",
                "clips": CLIPS, "frames_per_clip": FRAMES,
                "landmark_noise": LM_NOISE,
            },
            "bands": bands,
            "gain": gain,
            "separated_bands": bool(sep),
            "conclusion": (
                "view augmentation helps (non-overlapping seed bands)"
                if gain > 0 and sep else
                "positive mean gain but seed bands overlap — "
                "suggestive, not separated" if gain > 0
                else "no measured benefit"),
        }
        tag = (f"{args.preset}-trainable" if args.trainable
               else args.preset)
        name = {"cnn-lstm": "ab.json",
                "cnn-lstm-trainable": "ab_trainable.json"}.get(
                    tag, f"ab_{tag}.json")
        with open(os.path.join(OUT, name), "w") as f:
            json.dump(ab, f, indent=2)
        print(json.dumps(ab, indent=2))

    if args.phase == "combine":
        combine()


def combine():
    """Aggregate every per-run result into the paired-gain summary
    (`combined.json`) — the defensible cross-vehicle framing: mean
    paired (aug − base) accuracy gain over all (vehicle, seed) pairs."""
    import glob
    import re

    runs = {}
    for rp in glob.glob(os.path.join(OUT, "*_s*", "result.json")):
        m = re.match(r"(.+)_(base|aug)_s(\d+)$",
                     os.path.basename(os.path.dirname(rp)))
        if not m:
            continue
        with open(rp) as f:
            r = json.load(f)
        if "test" not in r:
            continue
        runs[(m.group(1), m.group(2), int(m.group(3)))] = \
            r["test"]["accuracy"]

    regimes = {}
    paired = []
    names = {"cnn-lstm": "cnn-lstm-frozen"}
    for vehicle in sorted({k[0] for k in runs}):
        seeds = sorted({s for v, a, s in runs
                        if v == vehicle and (vehicle, "base", s) in runs
                        and (vehicle, "aug", s) in runs})
        if not seeds:
            continue
        bands = {}
        for arm in ("base", "aug"):
            accs = [runs[(vehicle, arm, s)] for s in seeds]
            bands[arm] = {"mean": float(np.mean(accs)),
                          "std": float(np.std(accs)), "accs": accs}
        gain = bands["aug"]["mean"] - bands["base"]["mean"]
        sep = (bands["aug"]["mean"] - bands["aug"]["std"]
               > bands["base"]["mean"] + bands["base"]["std"])
        regimes[names.get(vehicle, vehicle)] = {
            "bands": bands, "gain": gain,
            "separated_bands": bool(sep)}
        paired += [round(runs[(vehicle, "aug", s)]
                         - runs[(vehicle, "base", s)], 4)
                   for s in seeds]

    pos = sum(1 for d in paired if d > 0)
    decisive = [k for k, v in regimes.items() if v["separated_bands"]
                and v["gain"] > 0]
    out = {
        "regimes": regimes,
        "paired_diffs": paired,
        "summary": {
            "n_pairs": len(paired),
            "mean_gain": float(np.mean(paired)) if paired else None,
            "positive_pairs": pos,
            "decisive_vehicles": decisive,
            "conclusion": (
                f"oracle multiview augmentation: mean paired gain "
                f"{np.mean(paired):+.3f} over {len(paired)} (vehicle, "
                f"seed) pairs, {pos}/{len(paired)} positive; "
                + (f"non-overlapping bands on {', '.join(decisive)}"
                   if decisive else "no vehicle with separated bands")),
        },
    }
    with open(os.path.join(OUT, "combined.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out["summary"], indent=2))


if __name__ == "__main__":
    main()
