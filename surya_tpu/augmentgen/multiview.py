"""Offline Zero123-Plus multiview augmentation stage.

Parity with ``Zero123/batch_aug.py:20-148``: for each clean
(background-removed) PNG, a diffusion pipeline generates a 3×2 grid of
novel viewpoints which is sliced into 6 view images
``<base>_view_%02d.png``; processing resumes by checking the first
view's existence (``:110-114``). The default 75 inference steps match
``:136-143`` (CLI ``--steps``).

``generate_fn`` has three backends:

- :func:`jax_diffusion_generate_fn` — the TPU-native path: the
  trailing-timestep Euler-Ancestral sampler the reference configures
  (``:59-67``) reimplemented in JAX (``models/diffusion/``) with the
  whole trajectory fused into one ``lax.scan`` program, conditioned
  on the clean input image and emitting the 3×2 grid directly. The
  denoiser is pluggable; the built-in ``TinyDenoiser`` makes the path
  executable here (the real zero123plus UNet weights are
  egress-blocked).
- ``zero123plus_generate_fn`` — the reference's diffusers adapter
  (requires diffusers + a GPU/large host; gated).
- any injected callable (tests). The grid slicer is pure PIL and
  fully tested.

Usage: python -m surya_tpu.augmentgen.multiview CLEAN_ROOT OUT --steps 75
"""

from __future__ import annotations

import os
from typing import Callable


def slice_grid_in_memory(grid_img, rows: int = 3, cols: int = 2):
    """Slice a (rows×cols) tiled image into row-major crops
    (``batch_aug.py:20-45``)."""
    w, h = grid_img.size
    tile_w, tile_h = w // cols, h // rows
    views = []
    for r in range(rows):
        for c in range(cols):
            box = (c * tile_w, r * tile_h,
                   (c + 1) * tile_w, (r + 1) * tile_h)
            views.append(grid_img.crop(box))
    return views


def zero123plus_generate_fn(num_steps: int = 75) -> Callable:
    try:  # pragma: no cover - heavy optional dependency
        import torch
        from diffusers import DiffusionPipeline, EulerAncestralDiscreteScheduler
    except ImportError as e:  # pragma: no cover
        raise ImportError(
            "diffusers is required for multiview generation; install it "
            "or inject generate_fn") from e

    pipeline = DiffusionPipeline.from_pretrained(  # pragma: no cover
        "sudo-ai/zero123plus-v1.1",
        custom_pipeline="sudo-ai/zero123plus-pipeline",
        torch_dtype=torch.float16)
    pipeline.scheduler = EulerAncestralDiscreteScheduler.from_config(
        pipeline.scheduler.config,
        timestep_spacing="trailing")  # pragma: no cover

    def fn(image):  # pragma: no cover
        return pipeline(image, num_inference_steps=num_steps).images[0]

    return fn


def jax_diffusion_generate_fn(denoiser=None, variables=None,
                              num_steps: int = 75, tile: int = 320,
                              rows: int = 3, cols: int = 2,
                              prediction_type: str = "v_prediction",
                              seed: int = 0) -> Callable:
    """TPU-native grid generation: Euler-Ancestral (trailing spacing,
    as the reference configures diffusers at ``batch_aug.py:59-67``)
    over a pluggable conditional denoiser, one fused ``lax.scan``
    program per fixed grid shape.

    ``denoiser(scaled_latents, t, cond) -> model_output`` where cond
    is the clean input resized to the grid, in [-1, 1]. Defaults to a
    random-init :class:`TinyDenoiser` (untrained — plumbing/testing
    only; zero123plus weights cannot be fetched in this image).
    v-prediction default matches zero123plus v1.1's training.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np
    from PIL import Image

    from surya_tpu.models.diffusion import (
        EulerAncestralSchedule,
        TinyDenoiser,
        sample,
    )

    gh, gw = rows * tile, cols * tile
    if denoiser is None:
        model = TinyDenoiser()
        if variables is None:
            variables = model.init(
                jax.random.PRNGKey(seed),
                jnp.zeros((1, gh, gw, 3)), jnp.float32(0.0),
                jnp.zeros((1, gh, gw, 3)))

        def denoiser(scaled, t, cond):
            return model.apply(variables, scaled, t, cond)

    schedule = EulerAncestralSchedule.create(
        num_steps, timestep_spacing="trailing",
        prediction_type=prediction_type)

    @jax.jit
    def run(cond, key):
        dn = lambda scaled, t: denoiser(scaled, t, cond)  # noqa: E731
        return sample(schedule, dn, key, (1, gh, gw, 3))

    counter = [0]

    def fn(image):
        cond = np.asarray(
            image.convert("RGB").resize((gw, gh), Image.BILINEAR),
            np.float32) / 127.5 - 1.0
        key = jax.random.fold_in(jax.random.PRNGKey(seed), counter[0])
        counter[0] += 1
        out = np.asarray(jax.device_get(run(cond[None], key)))[0]
        out = np.clip((out + 1.0) * 127.5, 0, 255).astype(np.uint8)
        return Image.fromarray(out)

    return fn


def zero123plus_unet_generate_fn(unet_config, unet_variables,
                                 vae_config, vae_variables,
                                 encoder_hidden_states,
                                 num_steps: int = 75, tile: int = 320,
                                 rows: int = 3, cols: int = 2,
                                 seed: int = 0) -> Callable:
    """The REAL zero123plus pipeline shape, fully TPU-native: VAE-encode
    the clean conditioning image, run the reference-attention-
    conditioned SD2 UNet (``models/diffusion/unet_cond.py``) through the
    trailing-spacing Euler-Ancestral v-prediction trajectory in latent
    space, VAE-decode the 3×2 grid. One jitted program per grid shape.

    ``encoder_hidden_states`` is the (1, S, cross_dim) cross-attention
    context — upstream this is the empty-prompt CLIP text embedding
    plus the ramped CLIP vision embedding of the conditioning image;
    both encoders' weights are egress-blocked here, so the context is
    an explicit input (any fixed conditioning tokens work for
    plumbing). UNet/VAE weights come from ``import_unet``/``import_vae``
    when a checkpoint is available; random-init works for wiring tests.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np
    from PIL import Image

    from surya_tpu.models.diffusion import (
        EulerAncestralSchedule,
        UNet2DCondition,
        reference_conditioned_denoiser,
        sample,
    )
    from surya_tpu.models.diffusion.vae import (
        SD_SCALING_FACTOR,
        AutoencoderKL,
        sample_latents,
    )

    unet = UNet2DCondition(unet_config)
    vae = AutoencoderKL(vae_config)
    # spatial reduction of the VAE tower (2× per non-final level)
    factor = 2 ** (len(vae_config.block_out_channels) - 1)
    gh, gw = rows * tile, cols * tile
    lat_shape = (1, gh // factor, gw // factor,
                 vae_config.latent_channels)
    schedule = EulerAncestralSchedule.create(
        num_steps, timestep_spacing="trailing",
        prediction_type="v_prediction")
    ehs = jnp.asarray(encoder_hidden_states)

    @jax.jit
    def run(cond_px, key):
        kc, kd, ks = jax.random.split(key, 3)
        mean, logvar = vae.apply(vae_variables, cond_px,
                                 method="encode")
        cond_lat = sample_latents(mean, logvar, kc) * SD_SCALING_FACTOR
        denoiser = reference_conditioned_denoiser(
            unet, unet_variables["params"], schedule, ehs, cond_lat, kd)
        latents = sample(schedule, denoiser, ks, lat_shape)
        return vae.apply(vae_variables, latents / SD_SCALING_FACTOR,
                         method="decode")

    counter = [0]

    def fn(image):
        cond = np.asarray(
            image.convert("RGB").resize((tile, tile), Image.BILINEAR),
            np.float32) / 127.5 - 1.0
        key = jax.random.fold_in(jax.random.PRNGKey(seed), counter[0])
        counter[0] += 1
        out = np.asarray(jax.device_get(run(
            jnp.asarray(cond[None]), key)))[0]
        out = np.clip((out + 1.0) * 127.5, 0, 255).astype(np.uint8)
        return Image.fromarray(out).resize((gw, gh), Image.BILINEAR)

    return fn


def process_augmentation(clean_root: str, out_root: str,
                         generate_fn: Callable | None = None,
                         num_steps: int = 75, rows: int = 3,
                         cols: int = 2,
                         splits=("train", "valid", "test")) -> dict:
    """Walk <clean_root>/<split>/<label>/*.png; write 6 view crops per
    image under the same relative layout. Resumable via the first view's
    existence. Returns {split: {"generated": n, "skipped": n}}."""
    from PIL import Image

    generate_fn = generate_fn or zero123plus_generate_fn(num_steps)
    report: dict = {}
    n_views = rows * cols
    for split in splits:
        split_dir = os.path.join(clean_root, split)
        if not os.path.isdir(split_dir):
            continue
        generated = skipped = 0
        for label in sorted(os.listdir(split_dir)):
            ldir = os.path.join(split_dir, label)
            if not os.path.isdir(ldir):
                continue
            out_dir = os.path.join(out_root, split, label)
            os.makedirs(out_dir, exist_ok=True)
            for fname in sorted(os.listdir(ldir)):
                if not fname.lower().endswith(".png"):
                    continue
                base = os.path.splitext(fname)[0]
                first = os.path.join(out_dir, f"{base}_view_01.png")
                if os.path.exists(first):   # resume (ref :110-114)
                    skipped += 1
                    continue
                with Image.open(os.path.join(ldir, fname)) as im:
                    grid = generate_fn(im.convert("RGB"))
                for vi, view in enumerate(
                        slice_grid_in_memory(grid, rows, cols)):
                    view.save(os.path.join(
                        out_dir, f"{base}_view_{vi + 1:02d}.png"))
                generated += 1
        report[split] = {"generated": generated, "skipped": skipped,
                         "views_per_image": n_views}
    return report


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("clean_root")
    ap.add_argument("out_root")
    ap.add_argument("--steps", type=int, default=75)
    ap.add_argument("--backend", choices=("diffusers", "jax"),
                    default="diffusers",
                    help="jax = TPU-native Euler-Ancestral sampler "
                         "(models/diffusion); pass converted denoiser "
                         "weights programmatically via "
                         "jax_diffusion_generate_fn for real output")
    args = ap.parse_args()
    gen = (jax_diffusion_generate_fn(num_steps=args.steps)
           if args.backend == "jax" else None)
    print(process_augmentation(args.clean_root, args.out_root,
                               generate_fn=gen, num_steps=args.steps))
