"""Fused fusion-head kernel vs lax reference (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from surya_tpu.ops.pallas.fusion_head import (
    _fusion_head_impl,
    _lax_reference,
    fusion_head,
)


@pytest.mark.parametrize("b,d,h,c", [(16, 5376, 2688, 8),
                                     (5, 256, 128, 3)])
def test_matches_lax(b, d, h, c):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(b, d)) * 0.1, jnp.float32)
    w1 = jnp.asarray(rng.normal(size=(d, h)) * 0.02, jnp.float32)
    b1 = jnp.asarray(rng.normal(size=(h,)), jnp.float32)
    w2 = jnp.asarray(rng.normal(size=(h, c)) * 0.02, jnp.float32)
    b2 = jnp.asarray(rng.normal(size=(c,)), jnp.float32)
    want = _lax_reference(x, w1, b1, w2, b2)
    with pltpu.force_tpu_interpret_mode():
        got = _fusion_head_impl(x, w1, b1, w2, b2, block_b=8)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_grad_matches_lax():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(4, 64)) * 0.1, jnp.float32)
    w1 = jnp.asarray(rng.normal(size=(64, 32)) * 0.1, jnp.float32)
    b1 = jnp.asarray(rng.normal(size=(32,)), jnp.float32)
    w2 = jnp.asarray(rng.normal(size=(32, 4)) * 0.1, jnp.float32)
    b2 = jnp.asarray(rng.normal(size=(4,)), jnp.float32)

    def loss_p(*a):
        with pltpu.force_tpu_interpret_mode():
            return jnp.sum(fusion_head(*a) ** 2)

    def loss_l(*a):
        return jnp.sum(_lax_reference(*a) ** 2)

    gp = jax.grad(loss_p, argnums=tuple(range(5)))(x, w1, b1, w2, b2)
    gl = jax.grad(loss_l, argnums=tuple(range(5)))(x, w1, b1, w2, b2)
    for a, b in zip(gp, gl):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)
