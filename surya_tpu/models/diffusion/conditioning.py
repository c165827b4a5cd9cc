"""zero123plus conditioning: build the UNet's cross-attention context.

Upstream (the pipeline the reference drives at
``Zero123/batch_aug.py:59-67``), the context fed to every cross
-attention layer is

    encoder_hidden_states = prompt_embeds("" empty prompt, CLIP text)
                            + ramp[None, :, None] * image_embeds[:, None, :]

where ``image_embeds`` is the CLIP-vision projection of the clean
conditioning image and ``ramp`` is the checkpoint's learned per-token
``ramping_coefficients`` (length = text sequence, 77) — zero123plus's
"scaled-reference" global conditioning. :func:`combine_conditioning`
is that math; :func:`clip_conditioning_fn` wires it to transformers'
Flax CLIP modules (present in this image; *weights* are egress-blocked,
so real conditioning needs a downloaded checkpoint — random-init
modules exercise the path in tests).
"""

from __future__ import annotations

import jax.numpy as jnp


def combine_conditioning(prompt_embeds, image_embeds, ramp):
    """(B,S,D) text embeds + (B,D) image embeds + (S,) ramp → (B,S,D).

    The ramped broadcast-add zero123plus applies (its pipeline's
    ``encoder_hidden_states = prompt_embeds + global_embeds * ramp``).
    """
    prompt_embeds = jnp.asarray(prompt_embeds)
    image_embeds = jnp.asarray(image_embeds)
    ramp = jnp.asarray(ramp)
    if ramp.shape[0] != prompt_embeds.shape[1]:
        raise ValueError(
            f"ramp length {ramp.shape[0]} != token count "
            f"{prompt_embeds.shape[1]}")
    return prompt_embeds + image_embeds[:, None, :] * ramp[None, :, None]


def clip_conditioning_fn(text_module, text_params, vision_module,
                         vision_params, empty_prompt_ids, ramp,
                         image_proj=None):
    """Build ``image (B,H,W,3) in [0,1] → encoder_hidden_states`` from
    transformers Flax CLIP modules.

    - ``text_module``/``vision_module``: ``FlaxCLIPTextModel`` /
      ``FlaxCLIPVisionModel`` (or projection variants); params passed
      explicitly (transformers Flax modules are linen underneath).
    - ``empty_prompt_ids``: (1, S) tokenized "" — the tokenizer's
      output, supplied as an array so no vocab download is needed at
      call time.
    - ``image_proj``: optional (D_vis, D_txt) projection matrix (CLIP's
      visual_projection) applied to the vision pooled output when the
      plain (non-projection) vision model is used.
    - ``ramp``: the checkpoint's ramping_coefficients, length S.

    Runs host-side once per image (the context is a fixed input to the
    jitted sampling program, so this is off the hot path by design).
    """
    prompt_embeds = text_module(
        jnp.asarray(empty_prompt_ids),
        params=text_params).last_hidden_state

    def fn(image):
        image = jnp.asarray(image)
        # transformers CLIP vision wants NCHW pixel_values, CLIP-norm'd;
        # callers hand [0,1] RGB — apply the CLIP normalization here
        mean = jnp.asarray([0.48145466, 0.4578275, 0.40821073])
        std = jnp.asarray([0.26862954, 0.26130258, 0.27577711])
        px = ((image - mean) / std).transpose(0, 3, 1, 2)
        out = vision_module(px, params=vision_params)
        embeds = getattr(out, "image_embeds", None)
        if embeds is None:
            embeds = out.pooler_output
            if image_proj is not None:
                embeds = embeds @ jnp.asarray(image_proj)
        b = embeds.shape[0]
        return combine_conditioning(
            jnp.broadcast_to(prompt_embeds,
                             (b,) + prompt_embeds.shape[1:]),
            embeds, ramp)

    return fn
