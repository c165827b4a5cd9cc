"""Accuracy-evidence campaign (round-3 VERDICT item 1).

Two studies, both written to runs/accuracy_evidence/:

1. **Multi-seed framework A/B at a high operating point** — the round-2
   A/B ran the reference's trainable-trunk flagship hypers and both
   arms stalled near 31%; the echo study proved the frozen-trunk
   regime reaches 75-80% on the same noise-2.5 synthetic set. This
   reruns the A/B there: frozen trunk (``experiment/models_cnn.py:16-17``
   semantics — ALL resnet params frozen, BN stats still updating in
   train mode), lr 5e-4, wd 1e-4, BS 16, N seeds per arm. Arms share
   init per seed (torch-seeded state_dict → full_import) and per-epoch
   batch permutations; dropout draws differ by framework — the claim is
   final-accuracy parity bands, not bit equality (bit-level trajectory
   parity is pinned by tests/test_training_dynamics.py).

2. **Capability-discrimination study** — the reference's raison d'être
   is its published ordering (``README.md:140-143``): fusion beats the
   unimodal ablations and QuadtreeCNN beats GAP-pooled standard
   backbones. ``make_synthetic_capability`` encodes the mechanism
   (quadrant-of-patch × numeric bit, disjoint information); this trains
   quadtree-{fusion,image_only,numerical_only} + standard_multimodal +
   standard_resnet, N seeds each, through the library loop and records
   the orderings with seed bands.

Run:  python scripts/accuracy_evidence.py [--seeds 3] [--epochs 25]
      [--study ab|cap|both]
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

OUT = "runs/accuracy_evidence"
LR, WD, BS = 5e-4, 1e-4, 16
IMG, NOISE = 96, 2.5
PER_CLASS = {"train": 64, "valid": 16, "test": 16}


# ---------------------------------------------------------------------------
# Study 1: multi-seed framework A/B (frozen trunk, high operating point)
# ---------------------------------------------------------------------------

def make_ab_data(seed_base: int = 10):
    from surya_tpu.data.synthetic import make_synthetic_spatial

    return {split: make_synthetic_spatial(
        per_class=pc, image_size=IMG, seed=seed_base + i, noise=NOISE)
        for i, (split, pc) in enumerate(PER_CLASS.items())}


def make_perms(n: int, epochs: int, seed: int):
    rng = np.random.default_rng(seed)
    n_use = (n // BS) * BS
    return [rng.permutation(n)[:n_use] for _ in range(epochs)]


def run_torch_frozen(sd, splits, perms, seed):
    import torch

    from torch_mirrors import MirrorQuadtree

    torch.manual_seed(seed)
    tm = MirrorQuadtree(img=IMG)
    tm.load_state_dict({k: torch.from_numpy(np.asarray(v))
                        for k, v in sd.items()})
    # experiment/models_cnn.py:16-17 — freeze every resnet param; BN
    # stats keep updating under model.train()
    for p in tm.base_cnn.parameters():
        p.requires_grad_(False)
    opt = torch.optim.Adam(
        [p for p in tm.parameters() if p.requires_grad],
        lr=LR, weight_decay=WD)
    loss_fn = torch.nn.CrossEntropyLoss()

    def tt(a):
        a = np.asarray(a)
        if a.ndim == 4:
            a = a.transpose(0, 3, 1, 2)
        return torch.from_numpy(a)

    x, f, y = splits["train"]
    tx_all, tf_all = tt(x), tt(f)
    ty_all = torch.from_numpy(y.astype(np.int64))

    def evaluate(split):
        xi, fi_, yi = splits[split]
        tm.eval()
        with torch.no_grad():
            pred = tm(tt(xi), tt(fi_)).argmax(-1).numpy()
        return float((pred == yi).mean())

    curve = []
    t0 = time.time()
    for perm in perms:
        tm.train()
        for s in range(0, len(perm), BS):
            idx = torch.from_numpy(perm[s:s + BS].astype(np.int64))
            opt.zero_grad()
            loss = loss_fn(tm(tx_all[idx], tf_all[idx]), ty_all[idx])
            loss.backward()
            opt.step()
        curve.append(evaluate("valid"))
    return {"arm": "torch-f32-cpu", "seed": seed, "val_curve": curve,
            "test_acc": evaluate("test"),
            "train_seconds": time.time() - t0}


def run_jax_frozen(params, stats, dtype_name, splits, perms, seed):
    import jax
    import jax.numpy as jnp
    import optax

    from surya_tpu.models.spatial.quadtree import QuadtreeCNN
    from surya_tpu.train.steps import (
        stop_frozen_gradients,
        trainable_mask,
    )

    dtype = {"f32": jnp.float32, "bf16": jnp.bfloat16}[dtype_name]
    model = QuadtreeCNN(dtype=dtype, use_pallas=False)
    inner = optax.chain(optax.add_decayed_weights(WD), optax.adam(LR))
    mask = trainable_mask(params, "quadtree", True)
    labels_tree = jax.tree.map(
        lambda t: "train" if t else "freeze", mask)
    tx = optax.multi_transform(
        {"train": inner, "freeze": optax.set_to_zero()}, labels_tree)
    params = jax.tree.map(jnp.asarray, params)
    stats = jax.tree.map(jnp.asarray, stats)
    opt_state = tx.init(params)

    x, f, y = (jnp.asarray(a) for a in splits["train"])
    n_batches = perms[0].size // BS

    @jax.jit
    def epoch_fn(params, stats, opt_state, key, perm):
        xb = x[perm].reshape(n_batches, BS, IMG, IMG, 3)
        fb = f[perm].reshape(n_batches, BS, -1)
        yb = y[perm].reshape(n_batches, BS)
        keys = jax.random.split(key, n_batches)

        def step(carry, batch):
            params, stats, opt_state = carry
            bx, bf, by, k = batch

            def loss_fn(p):
                p = stop_frozen_gradients(p, "quadtree", True)
                logits, mut = model.apply(
                    {"params": p, "batch_stats": stats}, bx, bf,
                    train=True, mutable=["batch_stats"],
                    rngs={"dropout": k})
                loss = optax.softmax_cross_entropy_with_integer_labels(
                    logits.astype(jnp.float32), by).mean()
                return loss, mut["batch_stats"]

            (loss, new_stats), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            return (optax.apply_updates(params, updates), new_stats,
                    opt_state), loss

        (params, stats, opt_state), losses = jax.lax.scan(
            step, (params, stats, opt_state), (xb, fb, yb, keys))
        return params, stats, opt_state, losses.mean()

    @jax.jit
    def eval_fn(params, stats, xs, fs, ys):
        logits = model.apply({"params": params, "batch_stats": stats},
                             xs, fs, train=False)
        return (jnp.argmax(logits, -1) == ys).mean()

    def evaluate(split):
        xs, fs, ys = (jnp.asarray(a) for a in splits[split])
        return float(eval_fn(params, stats, xs, fs, ys))

    key = jax.random.PRNGKey(seed)
    curve = []
    t0 = time.time()
    for perm in perms:
        key, ek = jax.random.split(key)
        params, stats, opt_state, _ = epoch_fn(
            params, stats, opt_state, ek, jnp.asarray(perm))
        curve.append(evaluate("valid"))
    return {"arm": f"jax-{dtype_name}", "seed": seed,
            "val_curve": curve, "test_acc": evaluate("test"),
            "train_seconds": time.time() - t0}


def study_ab(seeds: int, epochs: int) -> dict:
    import torch

    from torch_mirrors import MirrorQuadtree

    from surya_tpu.models import full_import as fi

    splits = make_ab_data()
    results = []
    for seed in range(seeds):
        perms = make_perms(len(splits["train"][2]), epochs,
                           seed=42 + seed)
        torch.manual_seed(seed)
        sd = {k: v.numpy() for k, v in
              MirrorQuadtree(img=IMG).state_dict().items()}
        params, stats = fi.import_quadtree(
            {k: torch.from_numpy(v) for k, v in sd.items()})
        for runner in (
                lambda: run_torch_frozen(sd, splits, perms, seed),
                lambda: run_jax_frozen(params, stats, "f32", splits,
                                       perms, seed),
                lambda: run_jax_frozen(params, stats, "bf16", splits,
                                       perms, seed)):
            r = runner()
            results.append(r)
            print(f"  seed {seed} {r['arm']}: test {r['test_acc']:.4f} "
                  f"(final val {r['val_curve'][-1]:.4f}, "
                  f"{r['train_seconds']:.0f}s)", flush=True)

    bands = {}
    for arm in ("torch-f32-cpu", "jax-f32", "jax-bf16"):
        accs = [r["test_acc"] for r in results if r["arm"] == arm]
        bands[arm] = {"mean": float(np.mean(accs)),
                      "std": float(np.std(accs)), "accs": accs}
    return {"meta": {"seeds": seeds, "epochs": epochs, "lr": LR,
                     "wd": WD, "batch_size": BS, "image_size": IMG,
                     "noise": NOISE, "per_class": PER_CLASS,
                     "freeze_backbone": True,
                     "freeze_source": "experiment/models_cnn.py:16-17"},
            "bands": bands, "results": results}


# ---------------------------------------------------------------------------
# Study 2: capability discrimination (orderings, seed bands)
# ---------------------------------------------------------------------------

CAP_CONFIGS = (
    ("quadtree", "fusion"),
    ("quadtree", "image_only"),
    ("quadtree", "numerical_only"),
    ("standard_multimodal", "fusion"),   # GAP trunk + numeric MLP
    ("standard_resnet", "fusion"),       # GAP trunk, numeric ignored
)


def study_cap(seeds: int, epochs: int) -> dict:
    from surya_tpu.core.config import (
        Config,
        DataConfig,
        ModelConfig,
        TrainConfig,
    )
    from surya_tpu.data import ArrayDataSource, make_synthetic_capability
    from surya_tpu.data.synthetic import make_synthetic_capability as cap
    from surya_tpu.train import train_and_evaluate

    splits = {split: cap(per_class=pc, image_size=IMG, seed=20 + i)
              for i, (split, pc) in enumerate(PER_CLASS.items())}

    results = []
    for name, mode in CAP_CONFIGS:
        for seed in range(seeds):
            cfg = Config(
                model=ModelConfig(name=name, mode=mode, num_classes=8,
                                  freeze_backbone=True,
                                  use_pallas=False),
                data=DataConfig(batch_size=64, image_size=IMG),
                train=TrainConfig(epochs=epochs, lr=LR,
                                  weight_decay=WD, seed=seed,
                                  early_stop_patience=0))
            s = train_and_evaluate(cfg, ArrayDataSource(splits, 64),
                                   checkpoints=False)
            results.append({"model": name, "mode": mode, "seed": seed,
                            "test_acc": s["test"]["accuracy"],
                            "val_acc": s["history"][-1]["val_accuracy"]})
            print(f"  {name}/{mode} seed {seed}: "
                  f"test {s['test']['accuracy']:.4f}", flush=True)

    bands = {}
    for name, mode in CAP_CONFIGS:
        accs = [r["test_acc"] for r in results
                if r["model"] == name and r["mode"] == mode]
        bands[f"{name}/{mode}"] = {"mean": float(np.mean(accs)),
                                   "std": float(np.std(accs)),
                                   "accs": accs}

    b = {k: v["mean"] for k, v in bands.items()}
    orderings = {
        "fusion_gt_image_only":
            b["quadtree/fusion"] > b["quadtree/image_only"],
        "image_only_gt_numerical_only":
            b["quadtree/image_only"] > b["quadtree/numerical_only"],
        "quadtree_gt_standard_multimodal":
            b["quadtree/fusion"] > b["standard_multimodal/fusion"],
        "quadtree_gt_standard_resnet":
            b["quadtree/fusion"] > b["standard_resnet/fusion"],
    }
    return {"meta": {"seeds": seeds, "epochs": epochs, "lr": LR,
                     "wd": WD, "image_size": IMG,
                     "generator": "make_synthetic_capability",
                     "reference_ordering": "README.md:140-143"},
            "bands": bands, "orderings": orderings, "results": results}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=3)
    ap.add_argument("--epochs", type=int, default=25)
    ap.add_argument("--study", choices=("ab", "cap", "both"),
                    default="both")
    args = ap.parse_args()
    os.makedirs(OUT, exist_ok=True)
    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.abspath(__file__)), "..", "tests"))

    if args.study in ("cap", "both"):
        cap = study_cap(args.seeds, args.epochs)
        with open(os.path.join(OUT, "capability_ordering.json"),
                  "w") as f:
            json.dump(cap, f, indent=2)
        print("capability bands:", json.dumps(cap["bands"], indent=1))
        print("orderings:", cap["orderings"])

    if args.study in ("ab", "both"):
        ab = study_ab(args.seeds, args.epochs)
        with open(os.path.join(OUT, "framework_ab_multiseed.json"),
                  "w") as f:
            json.dump(ab, f, indent=2)
        print("A/B bands:", json.dumps(ab["bands"], indent=1))


if __name__ == "__main__":
    main()
