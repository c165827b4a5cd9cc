"""TPU-native Euler-Ancestral diffusion scaffold
(surya_tpu/models/diffusion/) — the sampler the reference configures
diffusers with for Zero123-Plus multiview generation
(``Zero123/batch_aug.py:59-67``, trailing timestep spacing).

Pins: schedule construction (sigmas/timesteps/init scale), step math
vs an independent numpy transcription, exact x0 recovery under a
perfect epsilon denoiser, scan-vs-python-loop equivalence of
``sample``, and end-to-end grid generation through
``augmentgen.multiview.process_augmentation``.
"""

import numpy as np
import pytest

from surya_tpu.models.diffusion import EulerAncestralSchedule, sample


def _np_oracle_step(model_output, x, s_from, s_to, noise, pred_type):
    if pred_type == "epsilon":
        x0 = x - s_from * model_output
    else:  # v_prediction
        x0 = (model_output * (-s_from / np.sqrt(s_from ** 2 + 1.0))
              + x / (s_from ** 2 + 1.0))
    s_up = np.sqrt(s_to ** 2 * (s_from ** 2 - s_to ** 2) / s_from ** 2)
    s_down = np.sqrt(s_to ** 2 - s_up ** 2)
    d = (x - x0) / s_from
    return x + d * (s_down - s_from) + noise * s_up


def test_schedule_construction():
    sch = EulerAncestralSchedule.create(10, timestep_spacing="trailing")
    assert len(sch.timesteps) == 10 and len(sch.sigmas) == 11
    # trailing hits the last train step exactly and strides back by T/N
    np.testing.assert_allclose(
        sch.timesteps, [999, 899, 799, 699, 599, 499, 399, 299, 199, 99])
    assert sch.sigmas[-1] == 0.0
    assert np.all(np.diff(sch.sigmas) < 0)  # strictly decreasing
    # sigma at an integer train step t is sqrt((1-abar)/abar)
    betas = np.linspace(0.00085 ** 0.5, 0.012 ** 0.5, 1000) ** 2
    abar = np.cumprod(1 - betas)
    np.testing.assert_allclose(
        sch.sigmas[0], np.sqrt((1 - abar[999]) / abar[999]), rtol=1e-6)
    assert sch.init_noise_sigma == pytest.approx(float(sch.sigmas[0]))

    # exact step count for every num_steps (np.arange float fuzz used
    # to emit num_steps+1 with a trailing t=-1 for e.g. 61, 103)
    for n in (61, 103, 121, 122, 201):
        s = EulerAncestralSchedule.create(n, timestep_spacing="trailing")
        assert len(s.timesteps) == n and len(s.sigmas) == n + 1
        assert s.timesteps[0] == 999.0 and s.timesteps[-1] >= 0.0

    lin = EulerAncestralSchedule.create(10, timestep_spacing="linspace")
    assert lin.timesteps[0] == pytest.approx(999.0)
    assert lin.timesteps[-1] == pytest.approx(0.0)
    lead = EulerAncestralSchedule.create(10, timestep_spacing="leading")
    # leading applies the SD-family steps_offset=1 (diffusers parity)
    # and excludes T-1; init scale is karras-style sqrt(sigma_max^2+1)
    assert lead.timesteps[-1] == 1.0
    assert lead.init_noise_sigma == pytest.approx(
        float(np.sqrt(lead.sigmas[0] ** 2 + 1)))
    lead0 = EulerAncestralSchedule.create(10, timestep_spacing="leading",
                                          steps_offset=0)
    assert lead0.timesteps[-1] == 0.0


@pytest.mark.parametrize("pred_type", ["epsilon", "v_prediction"])
def test_step_matches_numpy_oracle(pred_type):
    rng = np.random.default_rng(0)
    sch = EulerAncestralSchedule.create(7, prediction_type=pred_type)
    x = rng.normal(size=(2, 4, 4, 3)).astype(np.float32)
    for i in range(7):
        out = rng.normal(size=x.shape).astype(np.float32)
        noise = rng.normal(size=x.shape).astype(np.float32)
        got = np.asarray(sch.step(out, i, x, noise))
        want = _np_oracle_step(out, x, sch.sigmas[i], sch.sigmas[i + 1],
                               noise, pred_type)
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)
        x = got


def test_perfect_epsilon_denoiser_recovers_x0():
    """With a denoiser that knows the true x0, the ancestral chain
    lands exactly on x0 (last step is deterministic: sigma_to=0)."""
    import jax

    x0 = np.random.default_rng(1).normal(
        size=(1, 8, 8, 3)).astype(np.float32) * 0.3
    sch = EulerAncestralSchedule.create(12)

    def denoiser(scaled, t):
        # undo scale_model_input, then report the exact noise
        i = np.searchsorted(-sch.timesteps, -float(t))
        sigma = sch.sigmas[i]
        sample_ = scaled * np.sqrt(sigma ** 2 + 1.0)
        return (sample_ - x0) / sigma

    # python loop (denoiser uses host math, so no scan here)
    key = jax.random.PRNGKey(0)
    key, sub = jax.random.split(key)
    lat = np.asarray(jax.random.normal(sub, x0.shape)) * sch.init_noise_sigma
    for i in range(len(sch.timesteps)):
        key, kn = jax.random.split(key)
        scaled = np.asarray(sch.scale_model_input(lat, i))
        out = denoiser(scaled, sch.timesteps[i])
        noise = np.asarray(jax.random.normal(kn, lat.shape))
        lat = np.asarray(sch.step(out, i, lat, noise))
    np.testing.assert_allclose(lat, x0, rtol=1e-4, atol=1e-4)


def test_sample_scan_equals_python_loop():
    import jax
    import jax.numpy as jnp

    sch = EulerAncestralSchedule.create(5)

    def denoiser(scaled, t):
        return 0.1 * scaled + 0.01 * t / 1000.0

    key = jax.random.PRNGKey(42)
    got = np.asarray(sample(sch, denoiser, key, (1, 4, 4, 3)))

    key2, sub = jax.random.split(key)
    lat = jax.random.normal(sub, (1, 4, 4, 3)) * sch.init_noise_sigma
    k = key2
    for i in range(5):
        k, kn = jax.random.split(k)
        scaled = sch.scale_model_input(lat, i)
        out = denoiser(scaled, jnp.asarray(sch.timesteps)[i])
        lat = sch.step(out, i, lat, jax.random.normal(kn, lat.shape))
    np.testing.assert_allclose(got, np.asarray(lat), rtol=1e-5, atol=1e-5)


def test_tiny_denoiser_odd_dims():
    """Odd H/W must survive the down/up path (regression: resize-to-2x
    mismatched the SAME-padded ceil(h/2) stride-2 output)."""
    import jax
    import jax.numpy as jnp

    from surya_tpu.models.diffusion import TinyDenoiser

    model = TinyDenoiser(features=16)
    x = jnp.zeros((1, 45, 30, 3))
    v = model.init(jax.random.PRNGKey(0), x, jnp.float32(5.0), x)
    out = model.apply(v, x, jnp.float32(5.0), x)
    assert out.shape == (1, 45, 30, 3)


def test_tiny_denoiser_shapes_and_grad():
    import jax
    import jax.numpy as jnp

    from surya_tpu.models.diffusion import TinyDenoiser

    model = TinyDenoiser(features=16)
    x = jnp.zeros((2, 16, 16, 3))
    v = model.init(jax.random.PRNGKey(0), x, jnp.float32(10.0), x)
    out = model.apply(v, x, jnp.float32(10.0), x)
    assert out.shape == (2, 16, 16, 3)

    def loss(p):
        o = model.apply(p, x + 1.0, jnp.float32(500.0), x)
        return jnp.mean((o - 0.5) ** 2)

    g = jax.grad(loss)(v)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    assert any(float(np.abs(np.asarray(l)).max()) > 0 for l in leaves)


def test_multiview_jax_backend_end_to_end(tmp_path):
    from PIL import Image

    from surya_tpu.augmentgen.multiview import (
        jax_diffusion_generate_fn,
        process_augmentation,
    )

    clean = tmp_path / "clean" / "train" / "cobra"
    clean.mkdir(parents=True)
    rng = np.random.default_rng(0)
    Image.fromarray(rng.integers(0, 255, (20, 20, 4), np.uint8),
                    mode="RGBA").save(clean / "f1.png")

    fn = jax_diffusion_generate_fn(num_steps=3, tile=16)
    out = str(tmp_path / "aug")
    r = process_augmentation(str(tmp_path / "clean"), out,
                             generate_fn=fn)
    assert r["train"]["generated"] == 1
    views = sorted((tmp_path / "aug" / "train" / "cobra").iterdir())
    assert len(views) == 6
    with Image.open(views[0]) as im:
        assert im.size == (16, 16)
    # resume: second run skips
    r2 = process_augmentation(str(tmp_path / "clean"), out,
                              generate_fn=fn)
    assert r2["train"]["skipped"] == 1
