"""Euler-Ancestral diffusion sampling in JAX, TPU-first.

The reference's multiview augmentation drives ``sudo-ai/zero123plus``
through diffusers with an ``EulerAncestralDiscreteScheduler`` in
``timestep_spacing='trailing'`` mode (``Zero123/batch_aug.py:59-67``).
This module makes the *sampling machinery* TPU-native so the
augmentation stage no longer depends on diffusers for anything but the
pretrained UNet weights (which are egress-blocked in this image):

- :class:`EulerAncestralSchedule` precomputes the full noise schedule
  (scaled-linear betas — the Stable-Diffusion family defaults
  zero123plus inherits — trailing/linspace/leading timestep spacing,
  interpolated sigmas) as static arrays; everything downstream is pure
  ``jnp`` on those arrays.
- :func:`sample` runs the whole denoising trajectory as ONE
  ``lax.scan`` under jit — static step count, PRNG threaded through
  the scan carry for the ancestral noise, pluggable
  ``denoiser(scaled_latents, t) -> model_output`` (epsilon or
  v-prediction). No per-step Python, no host↔device ping-pong: the
  entire 75-step trajectory is a single XLA program.

Algorithm transcribed from the published Euler-Ancestral method
(Karras et al. 2022 stochastic sampler; diffusers'
``EulerAncestralDiscreteScheduler`` semantics) and pinned by an
independent step-by-step numpy oracle in ``tests/test_diffusion.py``.
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class EulerAncestralSchedule:
    """Static schedule arrays for a fixed number of inference steps.

    sigmas has length num_steps+1 (final 0.0); timesteps has length
    num_steps (descending).
    """

    timesteps: np.ndarray
    sigmas: np.ndarray
    init_noise_sigma: float
    prediction_type: str  # "epsilon" | "v_prediction"

    @staticmethod
    def create(num_steps: int, num_train_timesteps: int = 1000,
               beta_start: float = 0.00085, beta_end: float = 0.012,
               beta_schedule: str = "scaled_linear",
               timestep_spacing: str = "trailing",
               steps_offset: int = 1,
               prediction_type: str = "epsilon") -> "EulerAncestralSchedule":
        if beta_schedule == "scaled_linear":
            betas = np.linspace(beta_start ** 0.5, beta_end ** 0.5,
                                num_train_timesteps) ** 2
        elif beta_schedule == "linear":
            betas = np.linspace(beta_start, beta_end, num_train_timesteps)
        else:
            raise ValueError(f"unknown beta_schedule {beta_schedule!r}")
        alphas_cumprod = np.cumprod(1.0 - betas)
        full_sigmas = np.sqrt((1.0 - alphas_cumprod) / alphas_cumprod)

        T = num_train_timesteps
        if timestep_spacing == "trailing":
            # walk back from T in equal strides; hits T-1 exactly.
            # Closed-form (not np.arange(T, 0, -step)): float fuzz in
            # arange yields num_steps+1 entries with a trailing -1 for
            # ~6% of step counts (e.g. 61, 103).
            step = T / num_steps
            timesteps = (T - step * np.arange(num_steps)).round() - 1.0
        elif timestep_spacing == "linspace":
            timesteps = np.linspace(0, T - 1, num_steps)[::-1].copy()
        elif timestep_spacing == "leading":
            # diffusers applies the config's steps_offset (1 for the
            # SD/zero123plus family) in this mode only
            step = T // num_steps
            timesteps = (np.arange(num_steps) * step).round()[::-1].copy()
            timesteps += steps_offset
        else:
            raise ValueError(f"unknown timestep_spacing {timestep_spacing!r}")

        sigmas = np.interp(timesteps, np.arange(T), full_sigmas)
        sigmas = np.concatenate([sigmas, [0.0]]).astype(np.float32)
        if timestep_spacing in ("linspace", "trailing"):
            init_noise_sigma = float(sigmas.max())
        else:
            init_noise_sigma = float((sigmas.max() ** 2 + 1) ** 0.5)
        return EulerAncestralSchedule(
            timesteps=timesteps.astype(np.float32), sigmas=sigmas,
            init_noise_sigma=init_noise_sigma,
            prediction_type=prediction_type)

    # -- pure-jnp pieces (usable inside jit/scan) ---------------------------

    def scale_model_input(self, sample, step_index):
        sigma = jnp.asarray(self.sigmas)[step_index]
        return sample / jnp.sqrt(sigma ** 2 + 1.0)

    def pred_original(self, model_output, sample, sigma):
        if self.prediction_type == "epsilon":
            return sample - sigma * model_output
        if self.prediction_type == "v_prediction":
            # x0 = -v·sigma/sqrt(sigma²+1) + x/(sigma²+1)
            return (model_output * (-sigma / jnp.sqrt(sigma ** 2 + 1.0))
                    + sample / (sigma ** 2 + 1.0))
        raise ValueError(self.prediction_type)

    def step(self, model_output, step_index, sample, noise):
        """One ancestral Euler step: x_{i+1} from x_i and the model
        output at sigma_i; ``noise`` is standard normal of x's shape."""
        sigmas = jnp.asarray(self.sigmas)
        sigma_from = sigmas[step_index]
        sigma_to = sigmas[step_index + 1]
        x0 = self.pred_original(model_output, sample, sigma_from)
        sigma_up = jnp.sqrt(
            sigma_to ** 2 * (sigma_from ** 2 - sigma_to ** 2)
            / sigma_from ** 2)
        sigma_down = jnp.sqrt(sigma_to ** 2 - sigma_up ** 2)
        derivative = (sample - x0) / sigma_from
        prev = sample + derivative * (sigma_down - sigma_from)
        return prev + noise * sigma_up

    def add_noise(self, clean, noise, step_index):
        """Forward-noise clean data to the given step's sigma
        (img2img/strength entry point)."""
        sigma = jnp.asarray(self.sigmas)[step_index]
        return clean + noise * sigma


def sample(schedule: EulerAncestralSchedule,
           denoiser: Callable, key, shape,
           init_latents=None) -> jnp.ndarray:
    """Full trajectory as one ``lax.scan``: jit-able end to end.

    denoiser(scaled_latents, t) -> model_output, with t the (float)
    train-timestep for that step. Starts from
    ``init_noise_sigma``-scaled standard normal latents unless
    ``init_latents`` is given (already noised via :meth:`add_noise`).
    """
    key, sub = jax.random.split(key)
    if init_latents is None:
        init_latents = (jax.random.normal(sub, shape, jnp.float32)
                        * schedule.init_noise_sigma)
    timesteps = jnp.asarray(schedule.timesteps)

    def body(carry, i):
        latents, k = carry
        k, kn = jax.random.split(k)
        scaled = schedule.scale_model_input(latents, i)
        out = denoiser(scaled, timesteps[i])
        noise = jax.random.normal(kn, latents.shape, latents.dtype)
        latents = schedule.step(out, i, latents, noise)
        return (latents, k), None

    (latents, _), _ = jax.lax.scan(
        body, (init_latents, key), jnp.arange(len(schedule.timesteps)))
    return latents
