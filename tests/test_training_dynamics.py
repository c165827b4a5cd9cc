"""Training-dynamics parity: torch and flax flagship models, initialized
from IDENTICAL weights and fed IDENTICAL batches, must trace matching
loss trajectories under the reference's optimizer.

The reference trains QuadtreeCNN with Adam(lr=1e-4, weight_decay=1e-4) +
CrossEntropyLoss (``Quadtree_from scratch/Quadtree_train.py:18-27``).
torch ``Adam(weight_decay=…)`` is L2-into-gradient (NOT AdamW), which in
optax is ``chain(add_decayed_weights(wd), adam(lr))``. Dropout is set to
0 on both sides so the only stochasticity is float accumulation; BN runs
in train mode (batch stats) on both. 25 steps at f32 must agree to ~1e-3
— the strongest training-parity evidence obtainable without the dataset.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import optax  # noqa: E402

from surya_tpu.models import full_import as fi  # noqa: E402
from torch_mirrors import MirrorQuadtree  # noqa: E402

STEPS = 25
LR, WD = 1e-4, 1e-4
B, IMG = 4, 64


def _batch():
    rng = np.random.default_rng(42)
    images = rng.normal(size=(B, IMG, IMG, 3), scale=0.5).astype(
        np.float32)
    feats = rng.normal(size=(B, 47)).astype(np.float32)
    labels = rng.integers(0, 8, size=(B,))
    return images, feats, labels


def _torch_losses(tm, images, feats, labels):
    tm.train()
    opt = torch.optim.Adam(tm.parameters(), lr=LR, weight_decay=WD)
    loss_fn = torch.nn.CrossEntropyLoss()
    timg = torch.from_numpy(images.transpose(0, 3, 1, 2))
    tfeat = torch.from_numpy(feats)
    tlab = torch.from_numpy(labels.astype(np.int64))
    losses = []
    for _ in range(STEPS):
        opt.zero_grad()
        loss = loss_fn(tm(timg, tfeat), tlab)
        loss.backward()
        opt.step()
        losses.append(float(loss.detach()))
    return np.array(losses)


def _flax_losses(model, params, stats, images, feats, labels):
    tx = optax.chain(optax.add_decayed_weights(WD), optax.adam(LR))
    opt_state = tx.init(params)
    x = jnp.asarray(images)
    f = jnp.asarray(feats)
    y = jnp.asarray(labels.astype(np.int32))

    @jax.jit
    def step(params, stats, opt_state):
        def loss_fn(p):
            logits, mut = model.apply(
                {"params": p, "batch_stats": stats}, x, f, train=True,
                mutable=["batch_stats"])
            loss = optax.softmax_cross_entropy_with_integer_labels(
                logits, y).mean()
            return loss, mut["batch_stats"]

        (loss, new_stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return loss, optax.apply_updates(params, updates), new_stats, \
            opt_state

    losses = []
    for _ in range(STEPS):
        loss, params, stats, opt_state = step(params, stats, opt_state)
        losses.append(float(loss))
    return np.array(losses)


def test_quadtree_training_dynamics_match_torch():
    from surya_tpu.models.spatial.quadtree import QuadtreeCNN

    torch.manual_seed(0)
    tm = MirrorQuadtree(dropout=0.0, img=IMG)
    params, stats = fi.import_quadtree(tm.state_dict())
    images, feats, labels = _batch()

    want = _torch_losses(tm, images, feats, labels)
    model = QuadtreeCNN(dropout=0.0, dtype=jnp.float32, use_pallas=False)
    got = _flax_losses(model, params, stats, images, feats, labels)

    # identical first loss (same weights, same batch) …
    np.testing.assert_allclose(got[0], want[0], rtol=1e-4, atol=1e-4)
    # … and matching trajectory: float error accumulates across 25
    # coupled fwd+bwd+Adam steps, so the tail tolerance is looser.
    np.testing.assert_allclose(got, want, rtol=4e-3, atol=4e-3)
    # the run actually learned something (trajectory is non-trivial)
    assert want[-1] < want[0]
