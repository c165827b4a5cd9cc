"""Framework accuracy A/B: torch reference-equivalent vs surya_tpu,
trained to convergence on IDENTICAL data from IDENTICAL init.

Extends tests/test_training_dynamics.py (25 coupled steps, dropout 0)
to the full training regime: the reference's flagship hypers
(``Quadtree_from scratch/Quadtree_train.py:18-27`` — Adam lr 1e-4,
L2 wd 1e-4, BS 16, CE loss, dropout 0.5, BN train mode, trainable
trunk), run for E epochs on a hard synthetic multimodal set (noise 2.5,
so accuracy tops out well below 100% and the arms can actually
separate). Three arms:

  torch-f32-cpu : MirrorQuadtree (tests/torch_mirrors.py — the exact
                  reference architecture with reference state_dict
                  names), torch.optim.Adam(weight_decay=…) (L2).
  jax-f32       : surya_tpu QuadtreeCNN, optax add_decayed_weights+adam
                  (the L2-equivalent chain), f32 compute.
  jax-bf16      : same, bf16 compute / f32 params (the shipped TPU
                  default) — demonstrates bf16 training costs no
                  accuracy vs torch's f32.

All arms start from the SAME weights (flax init is exported is not —
torch init is imported via full_import.import_quadtree) and consume the
SAME per-epoch batch permutations. Dropout RNGs differ by framework —
the claim is final-accuracy parity, not bit equality (bit-level
trajectory parity is pinned separately by test_training_dynamics.py).

The jax arms run each epoch as ONE jitted lax.scan over the permuted
batch stack (device-resident data, 20 dispatches per run instead of
640 — both TPU-idiomatic and tunnel-safe).

Run: python scripts/framework_ab.py [EPOCHS]  → runs/framework_ab/
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

LR, WD, BS = 1e-4, 1e-4, 16
IMG, NOISE = 96, 2.5
PER_CLASS = {"train": 64, "valid": 16, "test": 16}
OUT = "runs/framework_ab"


def make_data():
    from surya_tpu.data.synthetic import make_synthetic_spatial

    splits = {}
    for i, (split, pc) in enumerate(PER_CLASS.items()):
        splits[split] = make_synthetic_spatial(
            per_class=pc, image_size=IMG, seed=10 + i, noise=NOISE)
    return splits


def make_perms(n: int, epochs: int, seed: int = 42):
    rng = np.random.default_rng(seed)
    n_use = (n // BS) * BS
    return [rng.permutation(n)[:n_use] for _ in range(epochs)]


def run_torch(sd, splits, perms):
    import torch

    from torch_mirrors import MirrorQuadtree

    torch.manual_seed(7)
    tm = MirrorQuadtree(img=IMG)
    tm.load_state_dict({k: torch.from_numpy(np.asarray(v))
                        for k, v in sd.items()})
    opt = torch.optim.Adam(tm.parameters(), lr=LR, weight_decay=WD)
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
        print(f"  torch epoch {len(curve)}: val {curve[-1]:.4f}",
              flush=True)
    return {"arm": "torch-f32-cpu", "val_curve": curve,
            "test_acc": evaluate("test"),
            "train_seconds": time.time() - t0}


def run_jax(params, stats, dtype_name, splits, perms):
    import jax
    import jax.numpy as jnp
    import optax

    from surya_tpu.models.spatial.quadtree import QuadtreeCNN

    dtype = {"f32": jnp.float32, "bf16": jnp.bfloat16}[dtype_name]
    model = QuadtreeCNN(dtype=dtype, use_pallas=False)
    tx = optax.chain(optax.add_decayed_weights(WD), optax.adam(LR))
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

    key = jax.random.PRNGKey(7)
    curve = []
    t0 = time.time()
    for e, perm in enumerate(perms):
        key, ek = jax.random.split(key)
        params, stats, opt_state, _ = epoch_fn(
            params, stats, opt_state, ek, jnp.asarray(perm))
        curve.append(evaluate("valid"))
        print(f"  jax-{dtype_name} epoch {e + 1}: val {curve[-1]:.4f}",
              flush=True)
    return {"arm": f"jax-{dtype_name}", "val_curve": curve,
            "test_acc": evaluate("test"),
            "train_seconds": time.time() - t0}


def main():
    epochs = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    os.makedirs(OUT, exist_ok=True)
    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.abspath(__file__)), "..", "tests"))

    import torch

    from torch_mirrors import MirrorQuadtree

    from surya_tpu.models import full_import as fi

    splits = make_data()
    perms = make_perms(len(splits["train"][2]), epochs)

    # one shared init: torch-seeded mirror → state_dict → flax import
    torch.manual_seed(0)
    sd = {k: v.numpy() for k, v in
          MirrorQuadtree(img=IMG).state_dict().items()}
    params, stats = fi.import_quadtree(
        {k: torch.from_numpy(v) for k, v in sd.items()})

    results = [
        run_torch(sd, splits, perms),
        run_jax(params, stats, "f32", splits, perms),
        run_jax(params, stats, "bf16", splits, perms),
    ]
    meta = {"epochs": epochs, "batch_size": BS, "lr": LR, "wd": WD,
            "image_size": IMG, "noise": NOISE, "per_class": PER_CLASS,
            "hypers_source":
                "Quadtree_from scratch/Quadtree_train.py:18-27"}
    with open(os.path.join(OUT, "framework_ab.json"), "w") as fh:
        json.dump({"meta": meta, "results": results}, fh, indent=2)
    for r in results:
        print(f"{r['arm']}: test {r['test_acc']:.4f} "
              f"(final val {r['val_curve'][-1]:.4f}, "
              f"{r['train_seconds']:.0f}s)")


if __name__ == "__main__":
    main()
