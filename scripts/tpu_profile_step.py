"""Ablation-timing profile of the flagship train step on real TPU.

Localizes where the QuadtreeCNN train-step time goes WITHOUT needing the
tensorboard profile plugin: times jitted sub-programs with the same
fused-fori_loop + device_get methodology as bench.py (the only honest
clock through the axon tunnel — see BENCH_NOTES.md).

Run: python scripts/tpu_profile_step.py [steps]
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def timed(fn, *args, steps):
    """Compile, warm, then time ONE fused dispatch of `steps` iterations."""
    import jax

    out = fn(*args)
    jax.device_get(jax.tree.leaves(out)[0])
    t0 = time.perf_counter()
    out = fn(*args)
    jax.device_get(jax.tree.leaves(out)[0])
    return time.perf_counter() - t0


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from surya_tpu.core.config import (
        Config,
        DataConfig,
        ModelConfig,
        TrainConfig,
    )
    from surya_tpu.core.prng import PRNG
    from surya_tpu.models import get_model

    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    bs = 256
    print(f"device={jax.devices()[0].platform} bs={bs} steps={steps}")

    cfg = Config(
        model=ModelConfig(name="quadtree", mode="fusion", num_classes=8,
                          compute_dtype="bfloat16", use_pallas=False),
        data=DataConfig(batch_size=bs),
        train=TrainConfig(lr=1e-4, weight_decay=1e-4, nan_guard=False),
    )
    model = get_model(cfg.model)
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.normal(size=(bs, 224, 224, 3)),
                         jnp.float32)
    feats = jnp.asarray(rng.normal(size=(bs, 47)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, 8, bs), jnp.int32)
    key = PRNG(0).named(0, "dropout")

    variables = model.init({"params": PRNG(0).named(0, "init")}, images,
                           feats, train=False)
    params, stats = variables["params"], variables["batch_stats"]
    tx = optax.adamw(1e-4, weight_decay=1e-4)
    opt_state = tx.init(params)

    def loss_of(p, s, imgs):
        logits, mut = model.apply(
            {"params": p, "batch_stats": s}, imgs, feats, train=True,
            mutable=["batch_stats"],
            rngs={"dropout": key})
        return optax.softmax_cross_entropy_with_integer_labels(
            logits, labels).mean(), mut["batch_stats"]

    def fused(body):
        @jax.jit
        def run(*args):
            def step(_, carry):
                return body(*carry)
            return jax.lax.fori_loop(0, steps, step, args)
        return run

    results = {}

    # 1. forward only (train-mode, stats update)
    def fwd_body(p, s, imgs, acc):
        loss, s2 = loss_of(p, s, imgs + acc * 1e-20)
        return p, s2, imgs, acc + loss

    results["forward"] = timed(fused(fwd_body), params, stats, images,
                               jnp.float32(0), steps=steps)

    # 2. forward + backward (no optimizer)
    def fb_body(p, s, imgs, acc):
        (loss, s2), grads = jax.value_and_grad(
            loss_of, has_aux=True)(p, s, imgs + acc * 1e-20)
        gsum = sum(jnp.sum(jnp.abs(g)) for g in jax.tree.leaves(grads))
        return p, s2, imgs, acc + loss + gsum * 1e-20

    results["fwd+bwd"] = timed(fused(fb_body), params, stats, images,
                               jnp.float32(0), steps=steps)

    # 3. full train step (fwd+bwd+adamw)
    def full_body(p, s, o, imgs, acc):
        (loss, s2), grads = jax.value_and_grad(
            loss_of, has_aux=True)(p, s, imgs + acc * 1e-20)
        upd, o2 = tx.update(grads, o, p)
        p2 = optax.apply_updates(p, upd)
        return p2, s2, o2, imgs, acc + loss

    results["full_step"] = timed(fused(full_body), params, stats,
                                 opt_state, images, jnp.float32(0),
                                 steps=steps)

    # 4. trunk only fwd+bwd (layer1..4, no heads) — is the ResNet the cost?
    from surya_tpu.models.backbones.resnet import make_resnet

    trunk = make_resnet("resnet18", dtype=jnp.bfloat16)
    tvars = trunk.init({"params": PRNG(0).named(1, "init")}, images,
                       train=False)

    def trunk_loss(p, s, imgs):
        outs, mut = trunk.apply({"params": p, "batch_stats": s}, imgs,
                                train=True, mutable=["batch_stats"])
        return jnp.sum(outs["out"].astype(jnp.float32) ** 2), \
            mut["batch_stats"]

    def trunk_body(p, s, imgs, acc):
        (loss, s2), grads = jax.value_and_grad(
            trunk_loss, has_aux=True)(p, s, imgs + acc * 1e-20)
        gsum = sum(jnp.sum(jnp.abs(g)) for g in jax.tree.leaves(grads))
        return p, s2, imgs, acc + loss + gsum * 1e-20

    results["trunk_fwd+bwd"] = timed(
        fused(trunk_body), tvars["params"], tvars["batch_stats"], images,
        jnp.float32(0), steps=steps)

    # 5. per-stage forward+backward: start from the stage's input map
    x = images
    stage_results = {}
    for upto, start in (("stem", None), ("layer1", "layer1"),
                        ("layer2", "layer2"), ("layer3", "layer3"),
                        ("layer4", "layer4")):
        if start is None:
            seg = lambda p, s, xx: trunk.apply(
                {"params": p, "batch_stats": s}, xx, train=True,
                mutable=["batch_stats"], upto="stem")
        else:
            seg = lambda p, s, xx, st=start: trunk.apply(
                {"params": p, "batch_stats": s}, xx, train=True,
                mutable=["batch_stats"], start=st, upto=st)

        def seg_loss(p, s, xx, seg=seg):
            outs, mut = seg(p, s, xx)
            return jnp.sum(outs["out"].astype(jnp.float32) ** 2), \
                (mut["batch_stats"], outs["out"])

        def seg_body(p, s, xx, acc, seg_loss=seg_loss):
            (loss, (s2, _)), grads = jax.value_and_grad(
                seg_loss, has_aux=True)(p, s, xx + acc * 1e-20)
            gsum = sum(jnp.sum(jnp.abs(g))
                       for g in jax.tree.leaves(grads))
            return p, s2, xx, acc + loss * 1e-20 + gsum * 1e-20

        stage_results[upto] = timed(
            fused(seg_body), tvars["params"], tvars["batch_stats"],
            x.astype(jnp.bfloat16), jnp.float32(0), steps=steps)
        # advance x to this stage's output for the next segment
        outs = trunk.apply(tvars, x, train=False,
                           **({"upto": "stem"} if start is None else
                              {"start": start, "upto": start}))
        x = outs["out"]

    results["stages"] = stage_results

    for k, v in results.items():
        if isinstance(v, dict):
            for k2, v2 in v.items():
                print(f"{k}/{k2:10s}: {v2:7.3f} s  "
                      f"({bs * steps / v2:9.1f} img/s)")
        else:
            print(f"{k:14s}: {v:7.3f} s  ({bs * steps / v:9.1f} img/s)")
    print(json.dumps({k: v for k, v in results.items()}))


if __name__ == "__main__":
    main()
