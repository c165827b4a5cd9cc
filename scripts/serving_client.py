"""Minimal torch-free StableHLO serving client.

Demonstrates that a ``python -m surya_tpu export`` artifact is
self-contained: this script imports ONLY jax + numpy — no surya_tpu
model code, no torch, no flax — deserializes the artifact, chunks and
tail-pads a request stream to the artifact's fixed batch, and prints
per-sample predictions. This is the deployment story the reference
lacks entirely (its "serving" is re-running ``evaluate_model_cnn.py``
eagerly with the full training stack installed;
``experiment/test_on_video_cnn.py:253-254``).

Usage:
    python scripts/serving_client.py ARTIFACT [REQUEST.npz]

ARTIFACT     — .stablehlo file from ``python -m surya_tpu export``.
REQUEST.npz  — optional; arrays ``images`` (N,H,W,3) and ``features``
               (N,F). Dtypes must match the artifact's wire format
               (uint8 raw pixels for --input-dtype uint8 exports,
               float32 [0,1] otherwise). Without it, a random request
               matching the artifact's input spec is synthesized.
"""

from __future__ import annotations

import sys

import numpy as np

import jax
import jax.numpy as jnp


def main() -> int:
    if len(sys.argv) < 2:
        print(__doc__)
        return 2
    with open(sys.argv[1], "rb") as f:
        exported = jax.export.deserialize(f.read())

    img_spec, feat_spec = exported.in_avals
    batch = img_spec.shape[0]
    print(f"artifact: fn={exported.fun_name!r} platforms="
          f"{exported.platforms} batch={batch} "
          f"image={img_spec.shape}/{img_spec.dtype} "
          f"features={feat_spec.shape}/{feat_spec.dtype}")

    if len(sys.argv) > 2:
        req = np.load(sys.argv[2])
        images, feats = req["images"], req["features"]
    else:  # synthesize a request that exercises the padded tail chunk
        rng = np.random.default_rng(0)
        n = batch + max(1, batch // 2)
        if np.dtype(img_spec.dtype) == np.uint8:
            images = rng.integers(
                0, 256, size=(n,) + img_spec.shape[1:], dtype=np.uint8)
        else:
            images = rng.random(
                (n,) + img_spec.shape[1:]).astype(img_spec.dtype)
        feats = rng.normal(size=(n,) + feat_spec.shape[1:]).astype(
            feat_spec.dtype)

    n = images.shape[0]
    preds, probs = [], []
    for lo in range(0, n, batch):
        im, ft = images[lo:lo + batch], feats[lo:lo + batch]
        pad = batch - im.shape[0]
        if pad:  # tail chunk: repeat last row, slice off after
            im = np.concatenate([im, np.repeat(im[-1:], pad, 0)])
            ft = np.concatenate([ft, np.repeat(ft[-1:], pad, 0)])
        p, pr = exported.call(jnp.asarray(im), jnp.asarray(ft))
        take = min(batch, n - lo)
        preds.append(np.asarray(p)[:take])
        probs.append(np.asarray(pr)[:take])
    preds = np.concatenate(preds)
    probs = np.concatenate(probs)

    for i, (p, pr) in enumerate(zip(preds, probs)):
        print(f"sample {i}: class {int(p)}  p={pr[p]:.4f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
