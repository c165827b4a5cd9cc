"""AutoencoderKL torch-import parity + latent round-trip mechanics."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from torch_mirror_vae import MirrorAutoencoderKL

from surya_tpu.models.diffusion.vae import (
    SD_SCALING_FACTOR,
    AutoencoderKL,
    import_vae,
    sample_latents,
    tiny_vae_config,
)

TINY = dict(in_channels=3, out_channels=3, latent_channels=4,
            block_out_channels=(8, 16), layers_per_block=1,
            norm_num_groups=4)


def test_torch_import_parity():
    torch.manual_seed(0)
    mirror = MirrorAutoencoderKL(**TINY).eval()
    x = np.random.default_rng(0).normal(
        0, 1, (2, 3, 16, 16)).astype(np.float32)
    with torch.no_grad():
        want_rec, (want_mean, want_logvar) = mirror(torch.from_numpy(x))

    model = AutoencoderKL(tiny_vae_config())
    variables = import_vae(mirror.state_dict())
    xn = jnp.asarray(x.transpose(0, 2, 3, 1))

    ref_init = model.init(jax.random.PRNGKey(0), xn)
    paths = lambda v: {jax.tree_util.keystr(p) for p, _ in  # noqa: E731
                       jax.tree_util.tree_leaves_with_path(v["params"])}
    assert paths(ref_init) == paths(variables), (
        paths(ref_init) ^ paths(variables))

    rec, (mean, logvar) = model.apply(variables, xn)
    np.testing.assert_allclose(
        np.asarray(mean).transpose(0, 3, 1, 2), want_mean.numpy(),
        rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(logvar).transpose(0, 3, 1, 2), want_logvar.numpy(),
        rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(rec).transpose(0, 3, 1, 2), want_rec.numpy(),
        rtol=1e-4, atol=1e-4)


def test_shapes_and_reparam():
    model = AutoencoderKL(tiny_vae_config())
    x = jnp.zeros((1, 16, 16, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    mean, logvar = model.apply(variables, x, method="encode")
    # one downsample (2 levels) → /2 spatial, latent_channels channels
    assert mean.shape == logvar.shape == (1, 8, 8, 4)
    z = sample_latents(mean, logvar, jax.random.PRNGKey(1))
    assert z.shape == mean.shape
    z2 = sample_latents(mean, logvar, jax.random.PRNGKey(1))
    np.testing.assert_array_equal(np.asarray(z), np.asarray(z2))
    out = model.apply(variables, z, method="decode")
    assert out.shape == (1, 16, 16, 3)
    assert 0.17 < SD_SCALING_FACTOR < 0.19
