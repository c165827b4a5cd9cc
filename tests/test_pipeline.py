"""Pipeline parallelism (parallel/pipeline.py) on the fake 8-device mesh.

The GPipe schedule must be a pure re-scheduling: outputs and gradients
equal the plain sequential layer stack (same layers, same order, same
dtypes), for any microbatch count, composed with data parallelism, and
end-to-end through the FACT fusion encoder.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, PartitionSpec as P

from surya_tpu.parallel.pipeline import pipeline_apply, stack_layer_params

L, D, B, T = 4, 16, 8, 6


def _mesh(pipe, rest=None):
    devs = np.array(jax.devices())
    if rest:
        return Mesh(devs[:pipe * rest[1]].reshape(pipe, rest[1]),
                    ("pipe", rest[0]))
    return Mesh(devs[:pipe], ("pipe",))


def _layer_params(key):
    ks = jax.random.split(key, L)
    return jnp.stack([jax.random.normal(k, (D, D)) * 0.3 for k in ks])


def _layer_fn(p, x):
    return jnp.tanh(x @ p)


def _sequential(stacked, x):
    for i in range(L):
        x = _layer_fn(stacked[i], x)
    return x


@pytest.mark.parametrize("microbatches", [4, 8])
def test_forward_matches_sequential(microbatches):
    stacked = _layer_params(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (B, T, D))
    want = _sequential(stacked, x)
    got = pipeline_apply(_layer_fn, stacked, x, _mesh(4),
                         num_microbatches=microbatches)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-6)


def test_two_layers_per_stage():
    """L=4 layers over 2 stages -> 2 layers per stage."""
    stacked = _layer_params(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (B, T, D))
    got = pipeline_apply(_layer_fn, stacked, x, _mesh(2),
                         num_microbatches=4)
    np.testing.assert_allclose(np.asarray(got),
                               np.asarray(_sequential(stacked, x)),
                               atol=1e-6)


def test_grads_match_sequential():
    stacked = _layer_params(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (B, T, D))
    mesh = _mesh(4)

    def loss_pp(p, x):
        return jnp.sum(pipeline_apply(_layer_fn, p, x, mesh,
                                      num_microbatches=4) ** 2)

    def loss_seq(p, x):
        return jnp.sum(_sequential(p, x) ** 2)

    gp, gx = jax.grad(loss_pp, argnums=(0, 1))(stacked, x)
    sp, sx = jax.grad(loss_seq, argnums=(0, 1))(stacked, x)
    np.testing.assert_allclose(np.asarray(gp), np.asarray(sp),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(sx),
                               rtol=1e-4, atol=1e-5)


def test_pp_times_dp():
    """pipe4 x data2: batch sharded over 'data', layers over 'pipe'."""
    stacked = _layer_params(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (B, T, D))
    mesh = _mesh(4, ("data", 2))
    got = pipeline_apply(_layer_fn, stacked, x, mesh,
                         num_microbatches=4, batch_spec=P("data"))
    np.testing.assert_allclose(np.asarray(got),
                               np.asarray(_sequential(stacked, x)),
                               atol=1e-6)


def test_under_jit_and_value_grad():
    stacked = _layer_params(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (B, T, D))
    mesh = _mesh(4)

    @jax.jit
    def step(p, x):
        def loss(p):
            return jnp.mean(pipeline_apply(_layer_fn, p, x, mesh,
                                           num_microbatches=8) ** 2)
        return jax.value_and_grad(loss)(p)

    l, g = step(stacked, x)
    def loss_seq(p):
        return jnp.mean(_sequential(p, x) ** 2)
    ls, gs = jax.value_and_grad(loss_seq)(stacked)
    np.testing.assert_allclose(float(l), float(ls), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(g), np.asarray(gs),
                               rtol=1e-4, atol=1e-6)


def test_validation_errors():
    stacked = _layer_params(jax.random.PRNGKey(0))
    x = jnp.zeros((B, T, D))
    with pytest.raises(ValueError, match="not divisible"):
        pipeline_apply(_layer_fn, stacked, x, _mesh(4),
                       num_microbatches=3)
    with pytest.raises(ValueError, match="layers"):
        pipeline_apply(_layer_fn, stacked[:3], x, _mesh(4))


def test_fact_pipelined_matches_plain():
    from surya_tpu.models.temporal.fact import (
        FactModel,
        fact_apply_pipelined,
    )

    m = FactModel(num_classes=5, seq_len=2, num_features=7,
                  embed_dim=32, num_layers=4, num_heads=4, vit_depth=1,
                  vit_heads=2, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.normal(size=(8, 2, 32, 32, 3)), jnp.float32)
    num = jnp.asarray(rng.normal(size=(8, 2, 7)), jnp.float32)
    v = m.init({"params": jax.random.PRNGKey(0)}, img, num, train=False)

    want = m.apply(v, img, num, train=False)
    got = fact_apply_pipelined(m, v, img, num, _mesh(4),
                               num_microbatches=4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_fact_pipelined_train_grads_finite():
    """Train mode with dropout rngs: a full value_and_grad through the
    pipelined FACT forward produces finite grads for every param."""
    import optax

    from surya_tpu.models.temporal.fact import (
        FactModel,
        fact_apply_pipelined,
    )

    m = FactModel(num_classes=5, seq_len=2, num_features=7,
                  embed_dim=32, num_layers=4, num_heads=4, vit_depth=1,
                  vit_heads=2, dtype=jnp.float32, dropout=0.2)
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.normal(size=(8, 2, 32, 32, 3)), jnp.float32)
    num = jnp.asarray(rng.normal(size=(8, 2, 7)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, 5, 8), jnp.int32)
    v = m.init({"params": jax.random.PRNGKey(0)}, img, num, train=False)
    mesh = _mesh(4)

    def loss(params):
        logits = fact_apply_pipelined(
            m, {"params": params}, img, num, mesh, num_microbatches=4,
            train=True, rngs={"dropout": jax.random.PRNGKey(7)})
        return optax.softmax_cross_entropy_with_integer_labels(
            logits, labels).mean()

    l, g = jax.value_and_grad(loss)(v["params"])
    assert np.isfinite(float(l))
    for leaf in jax.tree.leaves(g):
        assert np.all(np.isfinite(np.asarray(leaf)))
    # the pipelined encoder's params actually receive gradient
    gnorm = jnp.linalg.norm(
        jax.tree.leaves(g["fusion2"])[0].astype(jnp.float32))
    assert float(gnorm) > 0


def test_stack_layer_params_roundtrip():
    p = {"fusion0": {"w": jnp.ones((2, 2))},
         "fusion1": {"w": jnp.full((2, 2), 2.0)}}
    s = stack_layer_params(p, ["fusion0", "fusion1"])
    assert s["w"].shape == (2, 2, 2)
    np.testing.assert_array_equal(np.asarray(s["w"][1]),
                                  np.full((2, 2), 2.0))
