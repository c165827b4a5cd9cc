"""Fine-tune the TPU-native U²-Net on a synthetic matting task.

Demonstrates the segmentation tier (models/segmentation/u2net.py)
training end to end on real TPU — the capability a user needs to adapt
background removal to their footage when the published rembg weights
aren't available or aren't good enough (here: random-init u2netp on
procedurally generated foreground/background composites, since this
image has no egress to fetch the .pth).

Run: python scripts/u2net_finetune.py [STEPS] → runs/u2net_finetune/
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
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
import optax  # noqa: E402

from surya_tpu.models.segmentation import U2Net, u2net_loss  # noqa: E402

SIZE = 128
BATCH = 16
OUT = "runs/u2net_finetune"


def make_batch(rng: np.random.Generator):
    """Foreground ellipse with textured fill over a textured
    background; target = the alpha mask."""
    yy, xx = np.mgrid[0:SIZE, 0:SIZE].astype(np.float32) / SIZE
    imgs = np.empty((BATCH, SIZE, SIZE, 3), np.float32)
    masks = np.empty((BATCH, SIZE, SIZE, 1), np.float32)
    for b in range(BATCH):
        cy, cx = rng.uniform(0.3, 0.7, 2)
        ry, rx = rng.uniform(0.12, 0.3, 2)
        ang = rng.uniform(0, np.pi)
        dy, dx = yy - cy, xx - cx
        u = dy * np.cos(ang) + dx * np.sin(ang)
        v = -dy * np.sin(ang) + dx * np.cos(ang)
        m = ((u / ry) ** 2 + (v / rx) ** 2 < 1.0).astype(np.float32)
        fg = (0.5 + 0.5 * np.sin(
            2 * np.pi * (yy * rng.uniform(2, 8)
                         + xx * rng.uniform(2, 8)))[..., None]
              * rng.uniform(0.3, 1.0, 3))
        bg = rng.uniform(0, 1, 3)[None, None] * np.ones_like(fg)
        bg = bg + 0.15 * rng.normal(size=fg.shape)
        imgs[b] = np.clip(fg * m[..., None] + bg * (1 - m[..., None]),
                          0, 1)
        masks[b] = m[..., None]
    return imgs, masks


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 150
    os.makedirs(OUT, exist_ok=True)
    model = U2Net(variant="u2netp")
    rng = np.random.default_rng(0)
    x0, y0 = make_batch(rng)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x0),
                           train=False)
    params, stats = variables["params"], variables["batch_stats"]
    tx = optax.adam(1e-3)
    opt = tx.init(params)

    @jax.jit
    def train_step(params, stats, opt, imgs, masks):
        def loss_fn(p):
            (fused, sides), new = model.apply(
                {"params": p, "batch_stats": stats}, imgs, train=True,
                mutable=["batch_stats"])
            loss = u2net_loss(fused, sides, masks)
            mae = jnp.mean(jnp.abs(fused - masks))
            return loss, (new["batch_stats"], mae)

        (loss, (stats2, mae)), g = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        up, opt2 = tx.update(g, opt, params)
        return optax.apply_updates(params, up), stats2, opt2, loss, mae

    hist = []
    t0 = time.perf_counter()
    for i in range(steps):
        imgs, masks = make_batch(rng)
        params, stats, opt, loss, mae = train_step(
            params, stats, opt, jnp.asarray(imgs), jnp.asarray(masks))
        if i % 10 == 0 or i == steps - 1:
            hist.append({"step": i, "loss": round(float(loss), 4),
                         "mae": round(float(mae), 4)})
            print(hist[-1])
    wall = time.perf_counter() - t0

    # eval matting sample on held-out composites
    imgs, masks = make_batch(np.random.default_rng(123))
    fused, _ = model.apply({"params": params, "batch_stats": stats},
                           jnp.asarray(imgs), train=False)
    pred = np.asarray(fused)
    final_mae = float(np.mean(np.abs(pred - masks)))
    iou = float((((pred > 0.5) & (masks > 0.5)).sum())
                / max(((pred > 0.5) | (masks > 0.5)).sum(), 1))
    report = {"steps": steps, "batch": BATCH, "size": SIZE,
              "backend": jax.default_backend(), "wall_s": round(wall, 1),
              "history": hist, "holdout_mae": round(final_mae, 4),
              "holdout_iou@0.5": round(iou, 4)}
    with open(os.path.join(OUT, "u2net_finetune.json"), "w") as f:
        json.dump(report, f, indent=1)

    try:  # sample triptych (input | pred | target), headless
        from PIL import Image

        trip = np.concatenate(
            [imgs[0], np.repeat(pred[0], 3, -1),
             np.repeat(masks[0], 3, -1)], axis=1)
        Image.fromarray((trip * 255).astype(np.uint8)).save(
            os.path.join(OUT, "sample_matting.png"))
    except Exception:
        pass
    print(json.dumps({k: report[k] for k in
                      ("wall_s", "holdout_mae", "holdout_iou@0.5")}))


if __name__ == "__main__":
    main()
