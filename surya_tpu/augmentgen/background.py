"""Offline background removal stage.

Parity with ``Background_remove/batch_remove_background.py:22-128``:
for the target clips, look up each frame's label through the master
label CSVs + per-clip frame maps, run background removal, and save a
transparent PNG to ``<out>/<split>/<label>/`` — skipping outputs that
already exist (restartable, ``:106-107``).

``remove_fn`` has two real backends plus injection for tests:

- :func:`u2net_remove_fn` — the TPU-native path: the same U²-Net
  rembg runs via onnxruntime, implemented in Flax
  (``models/segmentation/u2net.py``), jitted once at a fixed 320²
  input so every frame reuses one compiled program. Load converted
  weights via ``import_u2net``; without weights the matting is
  untrained (this environment has no egress to fetch the ``.pth``).
- :func:`rembg_remove_fn` — the reference's host-side dependency,
  gated (rembg is absent in this image).
"""

from __future__ import annotations

import os
from typing import Callable

from surya_tpu.data.prep.frame_renaming import load_frame_map
from surya_tpu.data.prep.still_image_dataset import load_labels


def rembg_remove_fn() -> Callable:
    try:
        from rembg import remove
    except ImportError as e:  # pragma: no cover
        raise ImportError(
            "rembg is required for background removal; install it or "
            "inject remove_fn") from e

    from PIL import Image

    def fn(src_path: str, dst_path: str):
        with Image.open(src_path) as im:
            out = remove(im)
            out.save(dst_path)

    return fn


def u2net_remove_fn(variables=None, variant: str = "u2netp",
                    size: int = 320, seed: int = 0) -> Callable:
    """TPU-native background removal: Flax U²-Net saliency → alpha.

    Matches rembg's basic (non-alpha-matting) output semantics for
    ``rembg.remove()`` (ref ``batch_remove_background.py:114``):
    RGBA PNG whose alpha is the min-max-normalized fused saliency map.
    ``variables`` comes from :func:`import_u2net` (converted torch
    weights) or a prior fine-tune; defaults to random init (untrained —
    only useful for pipeline plumbing/tests in this egress-less image).
    """
    import jax
    import numpy as np

    from surya_tpu.models.segmentation.u2net import U2Net, saliency_fn

    model = U2Net(variant=variant)
    if variables is None:
        import jax.numpy as jnp

        variables = model.init(jax.random.PRNGKey(seed),
                               jnp.zeros((1, size, size, 3)), train=False)
    fn = jax.jit(saliency_fn(model, variables, size=size))

    from PIL import Image

    def remove(src_path: str, dst_path: str):
        with Image.open(src_path) as im:
            rgb_im = im.convert("RGB")
            rgb = np.asarray(rgb_im)
            # pre-resize on host so the jitted program has ONE fixed
            # (size, size, 3) signature across arbitrary source sizes
            small = np.asarray(rgb_im.resize((size, size),
                                             Image.BILINEAR))
        alpha = np.asarray(jax.device_get(fn(small)))  # (size, size)
        a_im = Image.fromarray(
            np.clip(np.round(alpha * 255.0), 0, 255).astype(np.uint8))
        a8 = np.asarray(a_im.resize((rgb.shape[1], rgb.shape[0]),
                                    Image.BILINEAR))
        out = np.dstack([rgb, a8])
        Image.fromarray(out, mode="RGBA").save(dst_path)

    return remove


def process_pipeline(renamed_root: str, label_csvs: list[str],
                     out_root: str, target_clips: list[str] | None = None,
                     remove_fn: Callable | None = None,
                     splits=("train", "valid", "test")) -> dict:
    """Returns {split: {"done": n, "skipped": n}}. Resumable."""
    remove_fn = remove_fn or rembg_remove_fn()
    labels = load_labels(label_csvs)
    report: dict = {}
    for split in splits:
        split_dir = os.path.join(renamed_root, split)
        if not os.path.isdir(split_dir):
            continue
        done = skipped = 0
        for clip in sorted(os.listdir(split_dir)):
            if target_clips and clip not in target_clips:
                continue
            clip_dir = os.path.join(split_dir, clip)
            if not os.path.isdir(clip_dir):
                continue
            try:
                fmap = load_frame_map(clip_dir, clip)
            except FileNotFoundError:
                continue
            for new_name, original in sorted(fmap.items()):
                label = labels.get(original)
                if label is None:
                    continue
                dest_dir = os.path.join(out_root, split, label)
                os.makedirs(dest_dir, exist_ok=True)
                stem = os.path.splitext(new_name)[0]
                dst = os.path.join(dest_dir, f"{clip}_{stem}.png")
                if os.path.exists(dst):   # resume (ref :106-107)
                    skipped += 1
                    continue
                remove_fn(os.path.join(clip_dir, new_name), dst)
                done += 1
        report[split] = {"done": done, "skipped": skipped}
    return report
