"""Train the TPU-native pose-landmark model on the on-device generator.

Demonstrates the MediaPipe-replacement tier (models/pose) training end
to end on real TPU: the synthetic articulated-stick-figure generator
(data/synthetic_pose.py) runs INSIDE the jitted train step — sample,
render, forward, backward, and update are one XLA program; the host
contributes nothing but a PRNG key per step. Reports holdout PCK@0.05
/ PCK@0.1, mean pixel error, z error, and visibility accuracy, then
saves a single-file msgpack checkpoint usable via
``neural_landmark_extractor`` anywhere a ``LandmarkExtractor`` goes
(still-image prep, sequence prep, live video).

Run: python scripts/pose_train_demo.py [STEPS] → runs/pose_landmark/
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from surya_tpu.core.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import jax  # noqa: E402

if os.environ.get("POSE_PLATFORM"):  # env var alone is ignored here —
    # the axon plugin latches the platform; the config API works.
    jax.config.update("jax_platforms", os.environ["POSE_PLATFORM"])

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
import optax  # noqa: E402

from surya_tpu.data.synthetic_pose import make_pose_batch  # noqa: E402
from surya_tpu.models.pose import (  # noqa: E402
    PoseLandmarkNet,
    landmark_loss,
    pck,
    save_pose_params,
)

# Env knobs (bench.py convention) so a reduced CPU run is possible
# when the TPU tunnel is down.
SIZE = int(os.environ.get("POSE_SIZE", "256"))      # divisible by 16
BATCH = int(os.environ.get("POSE_BATCH", "64"))
WIDTH = int(os.environ.get("POSE_WIDTH", "32"))
OUT = os.environ.get("POSE_OUT", "runs/pose_landmark")


def main(steps: int = 600) -> None:
    os.makedirs(OUT, exist_ok=True)
    model = PoseLandmarkNet(width=WIDTH)
    key = jax.random.PRNGKey(0)
    init_imgs = jnp.zeros((BATCH, SIZE, SIZE, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(1), init_imgs)["params"]
    n_params = sum(int(np.prod(p.shape))
                   for p in jax.tree.leaves(params))

    sched = optax.warmup_cosine_decay_schedule(
        0.0, 1e-3, warmup_steps=50, decay_steps=steps)
    tx = optax.adam(sched)
    opt = tx.init(params)

    @jax.jit
    def train_step(params, opt, key):
        kd, knext = jax.random.split(key)
        imgs, xy, z, vis = make_pose_batch(kd, BATCH, SIZE)

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
        imgs, xy, z, vis = make_pose_batch(key, 128, SIZE)
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
                "mean_err_px": err * SIZE, "z_mae": zerr,
                "vis_acc": vis_acc}

    eval_key = jax.random.PRNGKey(99)  # holdout: never used in training
    log_path = os.path.join(OUT, "train.jsonl")
    t0 = time.time()
    with open(log_path, "w") as log:
        for step in range(1, steps + 1):
            params, opt, key, loss, parts = train_step(params, opt, key)
            if step % 50 == 0 or step == 1:
                m = jax.device_get(eval_metrics(params, eval_key))
                rec = {"step": step, "loss": float(loss),
                       **{k: float(v) for k, v in parts.items()},
                       **{k: float(v) for k, v in m.items()},
                       "wall_s": round(time.time() - t0, 1)}
                log.write(json.dumps(rec) + "\n")
                log.flush()
                print(rec, flush=True)

    final = {k: float(v) for k, v in
             jax.device_get(eval_metrics(params, eval_key)).items()}
    ckpt = os.path.join(OUT, "pose_landmark.msgpack")
    save_pose_params(ckpt, params, image_size=SIZE)
    summary = {"steps": steps, "batch": BATCH, "image_size": SIZE,
               "width": WIDTH, "params": n_params,
               "backend": jax.default_backend(),
               "wall_s": round(time.time() - t0, 1),
               "checkpoint": ckpt, **final}
    with open(os.path.join(OUT, "summary.json"), "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary), flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 600)
