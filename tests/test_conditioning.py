"""zero123plus conditioning math + CLIP adapter (tiny random-init
transformers Flax CLIP modules; pretrained weights are egress-blocked
so this pins the path, not the embeddings)."""

import numpy as np
import jax.numpy as jnp
import pytest

from surya_tpu.models.diffusion.conditioning import (
    clip_conditioning_fn,
    combine_conditioning,
)


def test_combine_conditioning_oracle():
    rng = np.random.default_rng(0)
    prompt = rng.normal(0, 1, (2, 5, 8)).astype(np.float32)
    image = rng.normal(0, 1, (2, 8)).astype(np.float32)
    ramp = rng.normal(0, 1, (5,)).astype(np.float32)
    got = np.asarray(combine_conditioning(prompt, image, ramp))
    want = prompt + image[:, None, :] * ramp[None, :, None]
    np.testing.assert_allclose(got, want, rtol=1e-6)

    with pytest.raises(ValueError, match="ramp length"):
        combine_conditioning(prompt, image, ramp[:3])


def test_clip_adapter_tiny():
    transformers = pytest.importorskip("transformers")
    if not hasattr(transformers, "FlaxCLIPTextModel"):
        pytest.skip("transformers build lacks Flax CLIP")
    tcfg = transformers.CLIPTextConfig(
        hidden_size=16, intermediate_size=32, num_hidden_layers=2,
        num_attention_heads=2, vocab_size=99,
        max_position_embeddings=16)
    vcfg = transformers.CLIPVisionConfig(
        hidden_size=16, intermediate_size=32, num_hidden_layers=2,
        num_attention_heads=2, image_size=32, patch_size=8)
    text = transformers.FlaxCLIPTextModel(tcfg, seed=0)
    vision = transformers.FlaxCLIPVisionModel(vcfg, seed=1)

    ids = np.arange(5, dtype=np.int32)[None] % 99
    ramp = np.linspace(0.0, 1.0, 5).astype(np.float32)
    proj = np.random.default_rng(2).normal(
        0, 0.1, (16, 16)).astype(np.float32)
    fn = clip_conditioning_fn(text, text.params, vision, vision.params,
                              ids, ramp, image_proj=proj)
    img = np.random.default_rng(3).uniform(
        0, 1, (2, 32, 32, 3)).astype(np.float32)
    ehs = fn(img)
    assert ehs.shape == (2, 5, 16)
    assert bool(jnp.isfinite(ehs).all())
    # ramp token 0 is 0.0 → token 0 equals the raw prompt embedding for
    # every image; later tokens are image-dependent
    e2 = fn(img * 0.5)
    np.testing.assert_allclose(np.asarray(ehs[:, 0]),
                               np.asarray(e2[:, 0]), atol=1e-6)
    assert float(jnp.abs(ehs[:, -1] - e2[:, -1]).max()) > 1e-5
