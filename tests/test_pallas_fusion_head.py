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


def _params(b, d, h, c, seed=0):
    rng = np.random.default_rng(seed)
    return (jnp.asarray(rng.normal(size=(b, d)) * 0.1, jnp.float32),
            jnp.asarray(rng.normal(size=(d, h)) * 0.02, jnp.float32),
            jnp.asarray(rng.normal(size=(h,)), jnp.float32),
            jnp.asarray(rng.normal(size=(h, c)) * 0.02, jnp.float32),
            jnp.asarray(rng.normal(size=(c,)), jnp.float32))


@pytest.mark.parametrize("b,d,h,c", [(16, 5376, 2688, 8),
                                     (5, 256, 128, 3)])
def test_matches_lax(b, d, h, c):
    x, w1, b1, w2, b2 = _params(b, d, h, c)
    want = _lax_reference(x, w1, b1, w2, b2)
    seed = jnp.zeros((1, 1), jnp.int32)
    with pltpu.force_tpu_interpret_mode():
        got, hidden = _fusion_head_impl(x, w1, b1, w2, b2, seed,
                                        block_b=8)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)
    # hidden residual = post-ReLU activations (no dropout at rate 0)
    np.testing.assert_allclose(
        np.asarray(hidden), np.asarray(jax.nn.relu(x @ w1 + b1)),
        rtol=2e-4, atol=2e-4)


def test_grad_matches_lax():
    x, w1, b1, w2, b2 = _params(4, 64, 32, 4, seed=1)

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


requires_tpu = pytest.mark.skipif(
    jax.default_backend() != "tpu",
    reason="interpret mode stubs prng_random_bits to zeros (jax 0.9.0 "
           "interpret_pallas_call.py:1183); run scripts/tpu_kernel_checks.py "
           "on hardware for these")


@requires_tpu
def test_dropout_kernel_semantics():
    """In-kernel dropout: ~rate of units dropped; surviving logits equal
    the lax head evaluated with the kernel's own mask."""
    b, d, h, c = 16, 256, 512, 8
    x, w1, _, w2, b2 = _params(b, d, h, c, seed=2)
    b1 = jnp.ones((h,), jnp.float32)  # keep pre-activations mostly > 0
    rate = 0.5
    seed = jnp.full((1, 1), 1234, jnp.int32)
    got, hidden = _fusion_head_impl(x, w1, b1, w2, b2, seed,
                                    rate=rate, block_b=8)
    hidden = np.asarray(hidden)
    relu = np.asarray(jax.nn.relu(x @ w1 + b1))
    # drop fraction among units that were positive pre-dropout
    pos = relu > 0
    dropped = (hidden == 0) & pos
    frac = dropped.sum() / pos.sum()
    assert 0.4 < frac < 0.6, frac
    # surviving units are scaled by 1/(1-rate)
    kept = hidden > 0
    np.testing.assert_allclose(hidden[kept], relu[kept] / (1 - rate),
                               rtol=1e-3)
    # final logits = hidden @ w2 + b2 exactly
    np.testing.assert_allclose(
        np.asarray(got), hidden @ np.asarray(w2) + np.asarray(b2),
        rtol=2e-4, atol=2e-4)


@requires_tpu
def test_dropout_grad_matches_masked_lax():
    """Backward with dropout == lax gradients computed with the SAME
    mask (reconstructed from the saved hidden residual)."""
    import surya_tpu.ops.pallas.fusion_head as fmod

    b, d, h, c = 8, 64, 32, 4
    x, w1, b1, w2, b2 = _params(b, d, h, c, seed=3)
    rate = 0.5
    seed = jnp.full((1, 1), 7, jnp.int32)

    _, hidden = _fusion_head_impl(x, w1, b1, w2, b2, seed, rate=rate)
    mask = jnp.asarray(np.asarray(hidden) > 0, jnp.float32)

    def loss_p(*a):
        return jnp.sum(fmod.fusion_head(*a, rate=rate, seed=7) ** 2)

    def loss_l(x, w1, b1, w2, b2):
        hh = jax.nn.relu(x @ w1 + b1) * mask / (1 - rate)
        return jnp.sum((hh @ w2 + b2) ** 2)

    gp = jax.grad(loss_p, argnums=tuple(range(5)))(x, w1, b1, w2, b2)
    gl = jax.grad(loss_l, argnums=tuple(range(5)))(x, w1, b1, w2, b2)
    for a, b in zip(gp, gl):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_fusion_classifier_pallas_path_shares_params():
    """FusionClassifier(use_pallas=True) has the identical param tree and
    (eval-mode) outputs as the Dense path."""
    from surya_tpu.models.common import FusionClassifier

    x = jnp.asarray(np.random.default_rng(0).normal(size=(4, 96)),
                    jnp.float32)
    m_lax = FusionClassifier(num_classes=5, dtype=jnp.float32)
    m_pls = FusionClassifier(num_classes=5, dtype=jnp.float32,
                             use_pallas=True)
    v_lax = m_lax.init(jax.random.key(0), x)
    v_pls = m_pls.init(jax.random.key(0), x)
    assert (jax.tree.structure(v_lax) == jax.tree.structure(v_pls))
    for a, b in zip(jax.tree.leaves(v_lax), jax.tree.leaves(v_pls)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # CPU backend → pallas path falls back to lax; outputs match exactly
    out_l = m_lax.apply(v_lax, x)
    out_p = m_pls.apply(v_lax, x)
    np.testing.assert_allclose(np.asarray(out_l), np.asarray(out_p),
                               rtol=1e-5, atol=1e-5)


def test_fusion_classifier_pallas_train_dropout():
    """Train-mode pallas path consumes the dropout rng and regularizes."""
    from surya_tpu.models.common import FusionClassifier

    x = jnp.asarray(np.random.default_rng(1).normal(size=(8, 64)),
                    jnp.float32)
    m = FusionClassifier(num_classes=4, dtype=jnp.float32,
                         use_pallas=True, dropout=0.5)
    v = m.init(jax.random.key(0), x)
    o1 = m.apply(v, x, train=True, rngs={"dropout": jax.random.key(1)})
    o2 = m.apply(v, x, train=True, rngs={"dropout": jax.random.key(2)})
    o_eval = m.apply(v, x)
    assert not np.allclose(np.asarray(o1), np.asarray(o2))
    assert not np.allclose(np.asarray(o1), np.asarray(o_eval))
    # gradients flow through the train path
    g = jax.grad(lambda p: m.apply(
        {"params": p}, x, train=True,
        rngs={"dropout": jax.random.key(3)}).sum())(v["params"])
    assert all(np.isfinite(np.asarray(leaf)).all()
               for leaf in jax.tree.leaves(g))
