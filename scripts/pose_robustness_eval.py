"""PCK robustness eval for the pose-landmark tier (round-3 item 3).

Evaluates a trained checkpoint under HELD-OUT perturbations the
generator can produce but the training distribution does not cover
(train ranges in ``data/synthetic_pose.sample_pose``: scale 0.55-0.95,
rotation ±0.5 rad, no occlusion, no mirroring):

  in_dist    : the training distribution (holdout key) — the anchor
  small/large: global scale pushed below/above the train range
  rotation   : extra ±(0.5..1.0) rad global rotation on top
  occlusion  : a random ~quarter-image black patch after rendering
               (landmarks under it must still be localized from
               kinematic context)
  chirality  : horizontally mirrored images with x→1−x targets, same
               landmark indices — solvable only by reading the
               renderer's left/right channel coding, not position
               priors (the left-limb channels appear on the RIGHT of
               the mirrored frame)

Writes runs/pose_landmark/robustness.json with PCK@0.05/0.10 + mean
pixel error per suite.

Run: python scripts/pose_robustness_eval.py [CKPT] [N]
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

CKPT = sys.argv[1] if len(sys.argv) > 1 else \
    "runs/pose_landmark/pose_landmark.msgpack"
N = int(sys.argv[2]) if len(sys.argv) > 2 else 256
BATCH = 64


def main():
    import jax
    import jax.numpy as jnp

    from surya_tpu.data.synthetic_pose import (
        _rot2,
        make_pose_batch,
        render_pose,
        sample_pose,
    )
    from surya_tpu.models.pose.landmark_net import _load_artifact, pck

    params, model, size = _load_artifact(CKPT)
    print(f"ckpt={CKPT} image_size={size} n_per_suite={N}", flush=True)

    def recompute_vis(xy):
        inside = jnp.prod(
            jax.nn.sigmoid(xy / 0.01) * jax.nn.sigmoid((1.0 - xy) / 0.01),
            axis=-1)
        return jnp.clip(inside, 0.0, 1.0)

    def perturbed_batch(key, kind):
        """(key) → (imgs, xy, z, vis) under one perturbation suite."""
        kp, kt, kn, ko = jax.random.split(key, 4)
        if kind == "in_dist":
            return make_pose_batch(kp, BATCH, size)

        xy, z, vis = jax.vmap(sample_pose)(
            jax.random.split(kp, BATCH))
        center = jnp.array([0.5, 0.55], jnp.float32)

        if kind in ("scale_small", "scale_large"):
            lo, hi = ((0.45, 0.65) if kind == "scale_small"
                      else (1.05, 1.25))
            s = jax.random.uniform(kt, (BATCH, 1, 1), minval=lo,
                                   maxval=hi)
            xy = (xy - center) * s + center
        elif kind == "rotation":
            k1, k2 = jax.random.split(kt)
            sign = jnp.sign(jax.random.uniform(
                k1, (BATCH,), minval=-1, maxval=1))
            mag = jax.random.uniform(k2, (BATCH,), minval=0.5,
                                     maxval=1.0)
            th = sign * mag
            rots = jax.vmap(_rot2)(th)                       # (B,2,2)
            xy = jnp.einsum("bij,bkj->bki", rots, xy - center) + center
        vis = recompute_vis(xy)
        imgs = jax.vmap(lambda a, b: render_pose(a, b, size))(xy, z)
        imgs = jnp.clip(
            imgs + 0.03 * jax.random.normal(kn, imgs.shape), 0, 1)

        if kind == "occlusion":
            q = size // 2
            oy = jax.random.randint(ko, (BATCH,), 0, size - q)
            ox = jax.random.randint(kt, (BATCH,), 0, size - q)
            yy = jnp.arange(size)[None, :, None]
            xx = jnp.arange(size)[None, None, :]
            mask = ((yy >= oy[:, None, None]) & (yy < oy[:, None, None] + q)
                    & (xx >= ox[:, None, None]) & (xx < ox[:, None, None] + q))
            imgs = jnp.where(mask[..., None], 0.0, imgs)
        elif kind == "chirality":
            imgs = imgs[:, :, ::-1, :]
            xy = xy.at[..., 0].set(1.0 - xy[..., 0])
        return imgs, xy, z, vis

    def run_suite(kind, base_seed):
        @jax.jit
        def one(key):
            imgs, xy, z, vis = perturbed_batch(key, kind)
            lm = model.apply({"params": params}, imgs)["landmarks"]
            mask = (vis > 0.5).astype(jnp.float32)
            denom = jnp.maximum(jnp.sum(mask), 1.0)
            err = jnp.sum(mask * jnp.linalg.norm(
                lm[..., :2] - xy, axis=-1)) / denom
            return (pck(lm[..., :2], xy, vis, 0.05),
                    pck(lm[..., :2], xy, vis, 0.10), err, jnp.sum(mask))

        p05s, p10s, errs, ws = [], [], [], []
        for i in range(N // BATCH):
            a, b, e, w = jax.device_get(
                one(jax.random.PRNGKey(base_seed + i)))
            p05s.append(float(a) * float(w))
            p10s.append(float(b) * float(w))
            errs.append(float(e) * float(w))
            ws.append(float(w))
        tw = sum(ws)
        return {"pck05": sum(p05s) / tw, "pck10": sum(p10s) / tw,
                "mean_err_px": sum(errs) / tw * size,
                "n_visible_joints": tw}

    suites = ("in_dist", "scale_small", "scale_large", "rotation",
              "occlusion", "chirality")
    results = {"checkpoint": CKPT, "image_size": size, "n": N}
    for i, kind in enumerate(suites):
        results[kind] = run_suite(kind, 1000 + 97 * i)
        print(f"{kind:12s}: PCK@0.05 {results[kind]['pck05']:.4f}  "
              f"PCK@0.10 {results[kind]['pck10']:.4f}  "
              f"err {results[kind]['mean_err_px']:.2f}px", flush=True)

    out = os.path.join(os.path.dirname(CKPT) or ".", "robustness.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=2)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
