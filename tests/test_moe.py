"""Mixture-of-Experts FFN + expert parallelism (parallel/moe.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, PartitionSpec as P

from surya_tpu.parallel.moe import MoEFFN, top_k_dispatch

B, T, D, FF = 4, 6, 16, 32


def _x(seed=0):
    return jnp.asarray(np.random.default_rng(seed).normal(
        size=(B, T, D)), jnp.float32)


def test_dispatch_shapes_and_gates():
    probs = jax.nn.softmax(jnp.asarray(
        np.random.default_rng(0).normal(size=(24, 4)), jnp.float32))
    d, c, aux = top_k_dispatch(probs, 2, capacity=24)
    assert d.shape == (24, 4, 24) and c.shape == (24, 4, 24)
    # ample capacity: every token dispatched to exactly k experts,
    # combine weights renormalized to 1
    np.testing.assert_allclose(np.asarray(d.sum((1, 2))), 2.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(c.sum((1, 2))), 1.0, atol=1e-5)
    # each capacity slot holds at most one token
    assert float(jnp.max(d.sum(0))) <= 1.0 + 1e-6


def test_dispatch_capacity_drops():
    # all tokens pick expert 0 -> only `capacity` fit
    probs = jnp.tile(jnp.asarray([[0.97, 0.01, 0.01, 0.01]]), (10, 1))
    d, c, aux = top_k_dispatch(probs, 1, capacity=4)
    assert float(d.sum()) == 4.0
    # aux loss is maximal (E * 1 * mean prob of the hot expert)
    assert float(aux) > 1.0


def test_aux_loss_balanced():
    # uniform router -> aux == 1 exactly at perfect balance
    n, e = 32, 4
    idx = jnp.arange(n) % e
    probs = jax.nn.one_hot(idx, e) * 0.97 + 0.01
    probs = probs / probs.sum(-1, keepdims=True)
    _, _, aux = top_k_dispatch(probs, 1, capacity=n)
    np.testing.assert_allclose(float(aux), 1.0, atol=0.05)


def test_single_expert_equals_dense_ffn():
    """E=1, k=1: the MoE output must equal the plain FFN with the same
    weights (every token routed to the only expert, gate weight 1)."""
    m = MoEFFN(num_experts=1, ff_dim=FF, top_k=1, capacity_factor=1.0,
               dtype=jnp.float32)
    x = _x()
    v = m.init(jax.random.PRNGKey(0), x)
    got = m.apply(v, x)
    p = v["params"]
    want = jnp.maximum(x @ p["w1"][0] + p["b1"][0], 0.0) @ p["w2"][0] \
        + p["b2"][0]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_expert_parallel_matches_unsharded():
    """Same params, same input: EP-constrained under a 4-way expert
    mesh == unsharded single-program result."""
    x = _x()
    plain = MoEFFN(num_experts=4, ff_dim=FF, top_k=2, dtype=jnp.float32)
    v = plain.init(jax.random.PRNGKey(1), x)
    want = plain.apply(v, x)

    mesh = Mesh(np.array(jax.devices()[:4]), ("expert",))
    ep = MoEFFN(num_experts=4, ff_dim=FF, top_k=2, dtype=jnp.float32,
                mesh=mesh)
    with mesh:
        got = jax.jit(lambda v, x: ep.apply(v, x))(v, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)


def test_aux_loss_sown_and_grads_flow():
    m = MoEFFN(num_experts=4, ff_dim=FF, top_k=2, dtype=jnp.float32,
               aux_loss_weight=0.01)
    x = _x()
    v = m.init(jax.random.PRNGKey(2), x)

    def loss(params):
        out, mut = m.apply({"params": params}, x, mutable=["losses"])
        aux = sum(jnp.sum(l) for l in jax.tree.leaves(mut["losses"]))
        return jnp.mean(out ** 2) + aux

    l, g = jax.value_and_grad(loss)(v["params"])
    assert np.isfinite(float(l))
    # router receives gradient (through gates AND the aux loss)
    assert float(jnp.linalg.norm(g["router"])) > 0
    for leaf in jax.tree.leaves(g):
        assert np.all(np.isfinite(np.asarray(leaf)))


def test_fact_moe_end_to_end():
    """FACT with MoE fusion layers: forward + a full train step through
    make_train_step (aux loss collected via the 'losses' collection)."""
    import optax

    from surya_tpu.core.config import Config, DataConfig, ModelConfig, TrainConfig
    from surya_tpu.models.temporal.fact import FactModel
    from surya_tpu.train.steps import create_train_state, make_train_step

    m = FactModel(num_classes=5, seq_len=2, num_features=7,
                  embed_dim=32, num_layers=2, num_heads=4, vit_depth=1,
                  vit_heads=2, dtype=jnp.float32, moe_experts=4,
                  freeze_backbone=False)
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.normal(size=(4, 2, 32, 32, 3)), jnp.float32)
    num = jnp.asarray(rng.normal(size=(4, 2, 7)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, 5, 4), jnp.int32)

    v = m.init({"params": jax.random.PRNGKey(0)}, img, num, train=False)
    assert "moe" in v["params"]["fusion0"]

    cfg = Config(model=ModelConfig(name="fact", num_classes=5,
                                   freeze_backbone=False),
                 data=DataConfig(batch_size=4),
                 train=TrainConfig(lr=1e-3, nan_guard=True))
    state, tx = create_train_state(m, cfg, jax.random.PRNGKey(1),
                                   (img, num, labels))
    step = make_train_step(m, tx, cfg)
    d0 = np.asarray(jax.tree.leaves(state.params)[0]).copy()
    state2, metrics = step(state, (img, num, labels),
                           jax.random.PRNGKey(2))  # donates state
    assert np.isfinite(float(metrics["loss"]))
    # params moved
    d1 = np.asarray(jax.tree.leaves(state2.params)[0])
    assert not np.allclose(d0, d1)


def test_dense_param_tree_unchanged_by_moe_flag():
    """moe_experts=0 keeps the reference-parity ff1/ff2 tree."""
    from surya_tpu.models.temporal.fact import PostLNEncoderLayer

    x = _x()
    dense = PostLNEncoderLayer(num_heads=4, ff_dim=FF,
                               dtype=jnp.float32)
    v = dense.init(jax.random.PRNGKey(0), x)
    assert set(v["params"].keys()) == {"attn", "ln1", "ff1", "ff2",
                                       "ln2"}
