"""Ring attention vs full attention on the 8-device CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from surya_tpu.core.mesh import MeshSpec, create_mesh
from surya_tpu.parallel.ring_attention import (
    full_attention_reference,
    ring_attention,
    shard_qkv,
)


def _qkv(b=2, t=32, h=4, d=16, seed=0):
    rng = np.random.default_rng(seed)
    mk = lambda: jnp.asarray(rng.normal(size=(b, t, h, d)), jnp.float32)  # noqa: E731
    return mk(), mk(), mk()


@pytest.fixture(scope="module")
def seq_mesh():
    # 1 data × 1 model × 8 seq
    return create_mesh(MeshSpec(data=1, model=1, seq=8))


def test_matches_full_attention(seq_mesh):
    q, k, v = _qkv()
    qs = shard_qkv(seq_mesh, q)
    ks = shard_qkv(seq_mesh, k)
    vs = shard_qkv(seq_mesh, v)
    with seq_mesh:
        got = ring_attention(qs, ks, vs, seq_mesh)
    want = full_attention_reference(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_degenerate_single_device():
    mesh = create_mesh(MeshSpec(data=1, model=1, seq=1),
                       devices=jax.devices()[:1])
    q, k, v = _qkv(t=8)
    with mesh:
        got = ring_attention(q, k, v, mesh)
    want = full_attention_reference(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_grad_flows_through_ring(seq_mesh):
    q, k, v = _qkv(t=16)

    def loss_ring(q, k, v):
        return jnp.sum(ring_attention(q, k, v, seq_mesh) ** 2)

    def loss_full(q, k, v):
        return jnp.sum(full_attention_reference(q, k, v) ** 2)

    with seq_mesh:
        gr = jax.grad(loss_ring, argnums=(0, 1, 2))(q, k, v)
    gf = jax.grad(loss_full, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gr, gf):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_bf16_inputs(seq_mesh):
    q, k, v = _qkv()
    qb, kb, vb = (x.astype(jnp.bfloat16) for x in (q, k, v))
    with seq_mesh:
        got = ring_attention(shard_qkv(seq_mesh, qb),
                             shard_qkv(seq_mesh, kb),
                             shard_qkv(seq_mesh, vb), seq_mesh)
    assert got.dtype == jnp.bfloat16
    want = full_attention_reference(qb, kb, vb)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        rtol=5e-2, atol=5e-2)


def test_non_divisible_token_count(seq_mesh):
    """T=27 on an 8-way seq axis: internal padding must be exact."""
    q, k, v = _qkv(t=27)
    with seq_mesh:
        got = ring_attention(q, k, v, seq_mesh)
    want = full_attention_reference(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_causal_mask(seq_mesh):
    q, k, v = _qkv(t=32)
    t = q.shape[1]
    causal = jnp.tril(jnp.ones((t, t), bool))[None, None]
    with seq_mesh:
        got = ring_attention(q, k, v, seq_mesh, mask=causal)
    want = full_attention_reference(q, k, v, mask=causal)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_padding_mask_and_nondivisible(seq_mesh):
    """Per-batch key-padding mask combined with T % axis != 0."""
    q, k, v = _qkv(b=3, t=21)
    lengths = jnp.asarray([21, 13, 5])
    keymask = (jnp.arange(21)[None] < lengths[:, None])  # (B, Tk)
    mask = keymask[:, None, None, :]                      # (B,1,1,Tk)
    with seq_mesh:
        got = ring_attention(q, k, v, seq_mesh, mask=mask)
    want = full_attention_reference(q, k, v, mask=mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_additive_bias(seq_mesh):
    q, k, v = _qkv(t=16)
    rng = np.random.default_rng(3)
    bias = jnp.asarray(rng.normal(size=(1, q.shape[2], 16, 16)),
                       jnp.float32)
    with seq_mesh:
        got = ring_attention(q, k, v, seq_mesh, bias=bias)
    want = full_attention_reference(q, k, v, bias=bias)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_masked_grads_match(seq_mesh):
    q, k, v = _qkv(t=24)
    t = q.shape[1]
    causal = jnp.tril(jnp.ones((t, t), bool))[None, None]

    def loss_ring(q, k, v):
        return jnp.sum(ring_attention(q, k, v, seq_mesh,
                                      mask=causal) ** 2)

    def loss_full(q, k, v):
        return jnp.sum(full_attention_reference(q, k, v,
                                                mask=causal) ** 2)

    with seq_mesh:
        gr = jax.grad(loss_ring, argnums=(0, 1, 2))(q, k, v)
    gf = jax.grad(loss_full, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gr, gf):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_attention_dropout_on_ring(seq_mesh):
    """Flax-semantics attention dropout: deterministic off-switch,
    rng-reproducible, unbiased in expectation."""
    q, k, v = _qkv(t=16)
    clean = ring_attention(q, k, v, seq_mesh)

    # jit once over the key: each bare call re-traces shard_map
    @jax.jit
    def dropped(key):
        return ring_attention(q, k, v, seq_mesh, dropout_rate=0.3,
                              dropout_rng=key)

    with seq_mesh:
        d1 = np.asarray(dropped(jax.random.key(0)))
        d1b = np.asarray(dropped(jax.random.key(0)))
        d2 = np.asarray(dropped(jax.random.key(1)))
    # reproducible given the rng; different rng → different output
    np.testing.assert_array_equal(d1, d1b)
    assert not np.allclose(d1, d2)
    assert not np.allclose(d1, np.asarray(clean))
    assert np.isfinite(d1).all()
    # unbiased: the mean over many draws approaches the clean output
    with seq_mesh:
        outs = [np.asarray(dropped(jax.random.key(100 + i)))
                for i in range(48)]
    err = np.abs(np.mean(outs, axis=0) - np.asarray(clean)).mean()
    scale = np.abs(np.asarray(clean)).mean()
    assert err < 0.15 * scale, (err, scale)


def test_fact_with_cp_mesh_matches_plain():
    """FACT fusion attention over a 3-way seq mesh == plain attention
    (same params; 2T+1 = 9 tokens → 3 per device)."""
    from surya_tpu.core.mesh import MeshSpec, create_mesh
    from surya_tpu.models.temporal.fact import FactModel

    mesh = create_mesh(MeshSpec(data=1, model=1, seq=3),
                       devices=jax.devices()[:3])
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.normal(size=(2, 4, 32, 32, 3)), jnp.float32)
    feats = jnp.asarray(rng.normal(size=(2, 4, 47)), jnp.float32)

    kw = dict(num_classes=5, seq_len=4, embed_dim=64, num_layers=2,
              num_heads=4, vit_depth=1, vit_heads=4, dtype=jnp.float32)
    plain = FactModel(**kw)
    variables = plain.init({"params": jax.random.key(0)}, imgs, feats,
                           train=False)
    want = plain.apply(variables, imgs, feats, train=False)

    cp = FactModel(**kw, cp_mesh=mesh)
    with mesh:
        got = cp.apply(variables, imgs, feats, train=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)
