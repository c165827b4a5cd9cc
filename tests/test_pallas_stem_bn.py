"""Fused stem BN+ReLU kernels (ops/pallas/stem_bn.py) vs the XLA
oracle and vs flax BatchNorm train-mode semantics, in pallas interpret
mode on CPU (the same kernels compile on TPU via
scripts/tpu_stem_fusion_probe.py)."""

import flax.linen as nn
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from surya_tpu.ops.pallas.stem_bn import (
    fused_bn_relu_train,
    reference_bn_relu_train,
)


@pytest.mark.parametrize("shape,dtype", [
    ((4, 16, 16, 64), jnp.float32),     # pads (N/2=512 < block)
    ((2, 14, 14, 64), jnp.bfloat16),    # odd spatial, bf16 map
])
def test_fused_matches_oracle(shape, dtype):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=shape) * 3 + 0.5, dtype)
    scale = jnp.asarray(rng.uniform(0.5, 2.0, shape[-1]), jnp.float32)
    bias = jnp.asarray(rng.normal(size=shape[-1]), jnp.float32)

    with pltpu.force_tpu_interpret_mode():
        y, mean, var = fused_bn_relu_train(x, scale, bias)
    yr, mr, vr = reference_bn_relu_train(x, scale, bias)

    tol = 1e-5 if dtype == jnp.float32 else 2e-2
    np.testing.assert_allclose(np.asarray(mean), np.asarray(mr),
                               rtol=tol, atol=tol)
    np.testing.assert_allclose(np.asarray(var), np.asarray(vr),
                               rtol=tol, atol=tol)
    np.testing.assert_allclose(
        np.asarray(y, np.float32), np.asarray(yr, np.float32),
        rtol=tol, atol=tol)


def test_matches_flax_batchnorm_train():
    """Same normalization as flax nn.BatchNorm(train) + relu, and the
    returned (mean, var) are exactly what the momentum update needs."""
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(4, 8, 8, 64)) * 2, jnp.float32)
    scale = jnp.asarray(rng.uniform(0.5, 2.0, 64), jnp.float32)
    bias = jnp.asarray(rng.normal(size=64), jnp.float32)

    bn = nn.BatchNorm(use_running_average=False, momentum=0.9,
                      epsilon=1e-5, dtype=jnp.float32)
    v = bn.init(jax.random.key(0), x)
    v = {"params": {"scale": scale, "bias": bias},
         "batch_stats": v["batch_stats"]}
    want, mut = bn.apply(v, x, mutable=["batch_stats"])
    want = jnp.maximum(want, 0.0)

    with pltpu.force_tpu_interpret_mode():
        got, mean, var = fused_bn_relu_train(x, scale, bias, eps=1e-5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)
    # flax's updated running mean: 0.9*0 + 0.1*batch_mean
    np.testing.assert_allclose(
        np.asarray(mut["batch_stats"]["mean"]),
        0.1 * np.asarray(mean), rtol=1e-5, atol=1e-6)
