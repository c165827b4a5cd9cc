"""Pose-landmark training on the on-device synthetic generator.

The MediaPipe-replacement tier's training loop as a library function:
the articulated-stick-figure generator (``data/synthetic_pose.py``)
runs INSIDE the jitted train step — sample, render, forward, backward,
and update are one XLA program; the host contributes a PRNG key per
step. Reachable as ``python -m surya_tpu pose-train`` (the CLI tier)
or via ``scripts/pose_train_demo.py`` (env-knob wrapper).

The saved checkpoint is the self-describing msgpack
(``save_pose_params``), usable anywhere a ``LandmarkExtractor`` goes
via ``load_pose_extractor`` / ``--pose-ckpt`` (still-image prep per
reference ``experiment/1_prepare_still_image_dataset.py:30``, sequence
prep, live video ``experiment/test_on_video_cnn.py:256-258``).
"""

from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from surya_tpu.data.synthetic_pose import make_pose_batch
from surya_tpu.models.pose.landmark_net import (
    PoseLandmarkNet,
    landmark_loss,
    pck,
    save_pose_params,
)


def train_pose_landmark(steps: int = 600, batch: int = 64,
                        image_size: int = 256, width: int = 32,
                        out_dir: str = "runs/pose_landmark",
                        peak_lr: float = 1e-3, eval_every: int = 50,
                        seed: int = 0, echo: bool = True,
                        occlude_p: float = 0.0,
                        mirror_p: float = 0.0) -> dict:
    """Train, log JSONL metrics, save the msgpack checkpoint.

    Returns the summary dict (also written to ``out_dir/summary.json``):
    holdout PCK@0.05/0.10, mean pixel error, z MAE, visibility accuracy,
    parameter count, wall time, checkpoint path.

    ``occlude_p`` / ``mirror_p`` turn on the generator's on-device
    occlusion / chirality augmentation (``augment_pose_batch``) inside
    the jitted step — closes the occlusion and mirrored-input failure
    modes of the unaugmented model (BENCH_NOTES robustness table). The
    holdout eval batch stays unaugmented (in-distribution anchor).
    """
    os.makedirs(out_dir, exist_ok=True)
    model = PoseLandmarkNet(width=width)
    key = jax.random.PRNGKey(seed)
    init_imgs = jnp.zeros((batch, image_size, image_size, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(seed + 1), init_imgs)["params"]
    n_params = sum(int(np.prod(p.shape))
                   for p in jax.tree.leaves(params))

    sched = optax.warmup_cosine_decay_schedule(
        0.0, peak_lr, warmup_steps=min(50, steps // 2), decay_steps=steps)
    tx = optax.adam(sched)
    opt = tx.init(params)

    @jax.jit
    def train_step(params, opt, key):
        kd, knext = jax.random.split(key)
        imgs, xy, z, vis = make_pose_batch(
            kd, batch, image_size,
            occlude_p=occlude_p, mirror_p=mirror_p)

        def loss_fn(p):
            out = model.apply({"params": p}, imgs)
            total, parts = landmark_loss(out, xy, z, vis)
            return total, parts

        (loss, parts), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt = tx.update(grads, opt)
        return optax.apply_updates(params, updates), opt, knext, loss, parts

    @jax.jit
    def eval_metrics(params, key):
        imgs, xy, z, vis = make_pose_batch(key, 128, image_size)
        out = model.apply({"params": params}, imgs)
        lm = out["landmarks"]
        mask = (vis > 0.5).astype(jnp.float32)
        denom = jnp.maximum(jnp.sum(mask), 1.0)
        err = jnp.sum(mask * jnp.linalg.norm(
            lm[..., :2] - xy, axis=-1)) / denom
        zerr = jnp.sum(mask * jnp.abs(lm[..., 2] - z)) / denom
        vis_acc = jnp.mean(((lm[..., 3] > 0.5) == (vis > 0.5))
                           .astype(jnp.float32))
        return {"pck05": pck(lm[..., :2], xy, vis, 0.05),
                "pck10": pck(lm[..., :2], xy, vis, 0.10),
                "mean_err_px": err * image_size, "z_mae": zerr,
                "vis_acc": vis_acc}

    eval_key = jax.random.PRNGKey(99)  # holdout: never used in training
    log_path = os.path.join(out_dir, "train.jsonl")
    t0 = time.time()
    with open(log_path, "w") as log:
        for step in range(1, steps + 1):
            params, opt, key, loss, parts = train_step(params, opt, key)
            if step % eval_every == 0 or step == 1:
                m = jax.device_get(eval_metrics(params, eval_key))
                rec = {"step": step, "loss": float(loss),
                       **{k: float(v) for k, v in parts.items()},
                       **{k: float(v) for k, v in m.items()},
                       "wall_s": round(time.time() - t0, 1)}
                log.write(json.dumps(rec) + "\n")
                log.flush()
                if echo:
                    print(rec, flush=True)

    final = {k: float(v) for k, v in
             jax.device_get(eval_metrics(params, eval_key)).items()}
    ckpt = os.path.join(out_dir, "pose_landmark.msgpack")
    save_pose_params(ckpt, params, image_size=image_size)
    summary = {"steps": steps, "batch": batch, "image_size": image_size,
               "width": width, "params": n_params,
               "occlude_p": occlude_p, "mirror_p": mirror_p,
               "backend": jax.default_backend(),
               "wall_s": round(time.time() - t0, 1),
               "checkpoint": ckpt,
               # the metrics below are on the CLEAN in-distribution
               # holdout (make_pose_batch, key 99 — no occlusion or
               # mirroring even when those augmentations are on);
               # perturbation-suite numbers live in robustness.json
               # (scripts/pose_robustness_eval.py)
               "eval_distribution": "clean in-dist holdout (key 99)",
               **final}
    with open(os.path.join(out_dir, "summary.json"), "w") as f:
        json.dump(summary, f, indent=1)
    if echo:
        print(json.dumps(summary), flush=True)
    return summary
