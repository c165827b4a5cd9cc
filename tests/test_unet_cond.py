"""Zero123-Plus-class conditional UNet: torch-import parity, reference
attention semantics, sampler integration.

The torch side is `tests/torch_mirror_unet.py` — a from-scratch mirror
of diffusers' UNet2DConditionModel with diffusers-exact state_dict
names, so a real zero123plus checkpoint is one `import_unet` call away.
"""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from torch_mirror_unet import MirrorUNet2DCondition

from surya_tpu.models.diffusion.euler_ancestral import (
    EulerAncestralSchedule,
    sample,
)
from surya_tpu.models.diffusion import unet_cond as uc

TINY = dict(in_channels=4, out_channels=4, block_out_channels=(8, 16),
            layers_per_block=1, num_heads=(2, 2),
            down_has_attn=(True, False), cross_attention_dim=12,
            norm_num_groups=4)


def _tiny_inputs(seed=0, b=2, hw=16):
    rng = np.random.default_rng(seed)
    x = rng.normal(0, 1, (b, hw, hw, 4)).astype(np.float32)
    t = np.asarray([3.0, 999.0][:b], np.float32)
    ehs = rng.normal(0, 1, (b, 7, 12)).astype(np.float32)
    return x, t, ehs


def test_torch_import_parity():
    """Random-init torch mirror → state_dict → import_unet → logits
    match the torch forward (both f32)."""
    torch.manual_seed(0)
    mirror = MirrorUNet2DCondition(**TINY).eval()
    x, t, ehs = _tiny_inputs()
    with torch.no_grad():
        want = mirror(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                      torch.from_numpy(t),
                      torch.from_numpy(ehs)).numpy()

    model = uc.UNet2DCondition(uc.tiny_config())
    variables = uc.import_unet(mirror.state_dict())

    # the importer must cover the full param tree (no silently missing
    # or extra leaves vs a fresh init)
    ref_init = model.init(jax.random.PRNGKey(0), jnp.asarray(x),
                          jnp.asarray(t), jnp.asarray(ehs))
    want_paths = {jax.tree_util.keystr(p) for p, _ in
                  jax.tree_util.tree_leaves_with_path(ref_init["params"])}
    got_paths = {jax.tree_util.keystr(p) for p, _ in
                 jax.tree_util.tree_leaves_with_path(variables["params"])}
    assert want_paths == got_paths, (
        want_paths - got_paths, got_paths - want_paths)

    got, _ = model.apply(variables, jnp.asarray(x), jnp.asarray(t),
                         jnp.asarray(ehs))
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2),
                               want, rtol=1e-4, atol=1e-4)


def test_duplicated_ref_is_identity():
    """Feeding a forward's own K/V bank back as refs must reproduce the
    plain forward exactly: softmax over duplicated keys re-normalizes to
    the same attention distribution. This pins both the bank capture
    point (post-norm1 hidden states) and the read-side K/V concat."""
    model = uc.UNet2DCondition(uc.tiny_config())
    x, t, ehs = _tiny_inputs(seed=1)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x),
                           jnp.asarray(t), jnp.asarray(ehs))
    plain, bank = model.apply(variables, jnp.asarray(x),
                              jnp.asarray(t), jnp.asarray(ehs))
    # down level 0 (1 layer) + mid (1) + up level 1 (layers+1 = 2)
    assert len(bank) == 4
    reread, _ = model.apply(variables, jnp.asarray(x), jnp.asarray(t),
                            jnp.asarray(ehs), refs=bank)
    np.testing.assert_allclose(np.asarray(reread), np.asarray(plain),
                               rtol=1e-5, atol=1e-5)

    # a *different* conditioning bank must change the output (the
    # mechanism is live, not a no-op)
    x2 = jnp.asarray(np.random.default_rng(9).normal(
        0, 1, x.shape).astype(np.float32))
    _, bank2 = model.apply(variables, x2, jnp.asarray(t),
                           jnp.asarray(ehs))
    changed, _ = model.apply(variables, jnp.asarray(x), jnp.asarray(t),
                             jnp.asarray(ehs), refs=bank2)
    assert float(jnp.abs(changed - plain).max()) > 1e-4


def test_ref_denoiser_full_trajectory():
    """reference_conditioned_denoiser + Euler-Ancestral sample() is one
    jittable program end to end (the zero123plus pipeline shape)."""
    model = uc.UNet2DCondition(uc.tiny_config())
    x, t, ehs = _tiny_inputs(b=1, hw=8)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x[:1]),
                           jnp.asarray(t[:1]), jnp.asarray(ehs[:1]))
    schedule = EulerAncestralSchedule.create(
        3, prediction_type="v_prediction")
    cond = jnp.asarray(np.random.default_rng(3).normal(
        0, 1, (1, 8, 8, 4)).astype(np.float32))
    denoiser = uc.reference_conditioned_denoiser(
        model, variables["params"], schedule, jnp.asarray(ehs[:1]),
        cond, jax.random.PRNGKey(5))
    out = jax.jit(lambda k: sample(schedule, denoiser, k,
                                   (1, 8, 8, 4)))(jax.random.PRNGKey(7))
    assert out.shape == (1, 8, 8, 4)
    assert bool(jnp.isfinite(out).all())
    # conditioning must steer the trajectory
    denoiser2 = uc.reference_conditioned_denoiser(
        model, variables["params"], schedule, jnp.asarray(ehs[:1]),
        cond * -1.0, jax.random.PRNGKey(5))
    out2 = jax.jit(lambda k: sample(schedule, denoiser2, k,
                                    (1, 8, 8, 4)))(jax.random.PRNGKey(7))
    assert float(jnp.abs(out2 - out).max()) > 1e-4


def test_zero123plus_latent_pipeline_end_to_end():
    """The full pipeline shape — VAE encode → ref-attention UNet over
    the Euler-Ancestral trajectory in latent space → VAE decode → 3×2
    grid slice — runs TPU-natively on tiny configs."""
    from PIL import Image

    from surya_tpu.augmentgen.multiview import (
        slice_grid_in_memory,
        zero123plus_unet_generate_fn,
    )
    from surya_tpu.models.diffusion.vae import (
        AutoencoderKL,
        tiny_vae_config,
    )

    ucfg = uc.tiny_config()
    unet = uc.UNet2DCondition(ucfg)
    uvars = unet.init(jax.random.PRNGKey(0), jnp.zeros((1, 12, 8, 4)),
                      jnp.zeros((1,)), jnp.zeros((1, 7, 12)))
    vcfg = tiny_vae_config()
    vae = AutoencoderKL(vcfg)
    vvars = vae.init(jax.random.PRNGKey(1), jnp.zeros((1, 16, 16, 3)))
    ehs = np.random.default_rng(2).normal(0, 1, (1, 7, 12)).astype(
        np.float32)

    gen = zero123plus_unet_generate_fn(
        ucfg, uvars, vcfg, vvars, ehs, num_steps=2, tile=8)
    cond = Image.fromarray(np.random.default_rng(3).integers(
        0, 255, (8, 8, 3), np.uint8), "RGB")
    grid = gen(cond)
    assert grid.size == (16, 24)  # (cols*tile, rows*tile)
    views = slice_grid_in_memory(grid)
    assert len(views) == 6 and views[0].size == (8, 8)


def test_zero123plus_config_is_sd2_shape():
    cfg = uc.zero123plus_config()
    assert cfg.block_out_channels == (320, 640, 1280, 1280)
    assert cfg.layers_per_block == 2
    assert cfg.cross_attention_dim == 1024
    # every level's head width is 64 (SD2's uniform head size)
    for ch, heads in zip(cfg.block_out_channels, cfg.num_heads):
        assert ch // heads == 64
    assert cfg.down_has_attn == (True, True, True, False)
    assert cfg.up_has_attn == (False, True, True, True)
