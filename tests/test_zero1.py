"""ZeRO-1 optimizer-state sharding (parallel/zero.py): numerics match
the replicated baseline exactly, and the Adam moments are actually
split over the data axis."""

import numpy as np

import jax
import jax.numpy as jnp
import optax

from surya_tpu.core.config import Config, DataConfig, ModelConfig, TrainConfig
from surya_tpu.core.mesh import replicate, shard_batch
from surya_tpu.models import get_model
from surya_tpu.parallel.zero import apply_zero1, zero1_shardings
from surya_tpu.train.steps import create_train_state, make_train_step


def _setup(mesh8):
    cfg = Config(
        model=ModelConfig(name="quadtree", mode="fusion", num_classes=4,
                          compute_dtype="float32"),
        data=DataConfig(batch_size=16),
        train=TrainConfig(lr=1e-3, weight_decay=1e-4, nan_guard=False),
    )
    model = get_model(cfg.model)
    rng = np.random.default_rng(0)
    batch = (rng.normal(size=(16, 64, 64, 3)).astype(np.float32),
             rng.normal(size=(16, 47)).astype(np.float32),
             rng.integers(0, 4, 16).astype(np.int32))
    with mesh8:
        state, tx = create_train_state(
            model, cfg, jax.random.key(0),
            tuple(jnp.asarray(b) for b in batch))
    # host copy: the train step donates its input state, so each branch
    # below must start from buffers the other can't have deleted
    state = jax.tree.map(np.asarray, jax.device_get(state))
    return cfg, model, tx, state, batch


def test_zero1_matches_replicated_and_shards_moments(mesh8):
    cfg, model, tx, state0, batch = _setup(mesh8)
    key = jax.random.key(1)
    with mesh8:
        sharded = shard_batch(mesh8, batch)

        base_state = replicate(mesh8, state0)
        base_step = make_train_step(model, tx, cfg)
        for _ in range(3):
            base_state, base_m = base_step(base_state, sharded, key)

        z_state = replicate(mesh8, state0)
        z_state, shardings = apply_zero1(z_state, mesh8)
        z_step = make_train_step(model, tx, cfg, mesh=mesh8,
                                 state_shardings=shardings)
        for _ in range(3):
            z_state, z_m = z_step(z_state, sharded, key)

    # identical numerics
    np.testing.assert_allclose(float(base_m["loss"]), float(z_m["loss"]),
                               rtol=1e-5)
    for a, b in zip(jax.tree.leaves(base_state.params),
                    jax.tree.leaves(z_state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-5)

    # the moments are genuinely sharded: find a large Adam mu leaf and
    # check its per-device shard is 1/8 of the full array
    big = [l for l in jax.tree.leaves(z_state.opt_state)
           if hasattr(l, "shape") and l.ndim >= 1
           and l.shape[0] % 8 == 0 and l.size >= 8]
    assert big, "no sharded optimizer leaves found"
    sharded_leaves = [l for l in big
                      if "data" in tuple(l.sharding.spec)]
    assert sharded_leaves, "no opt_state leaf carries the data axis"
    leaf = max(sharded_leaves, key=lambda l: l.size)
    shard = leaf.addressable_shards[0].data
    assert shard.size == leaf.size // 8

    # params stayed replicated (ZeRO-1 shards only optimizer state)
    p = jax.tree.leaves(z_state.params)[0]
    assert all(s is None for s in tuple(p.sharding.spec) or (None,))


def test_zero1_spec_picks_first_divisible_axis(mesh8):
    tree = {"a": jnp.zeros((16, 3)), "b": jnp.zeros((3, 24)),
            "c": jnp.zeros(()), "d": jnp.zeros((5,)),
            "count": jnp.zeros((), jnp.int32)}
    sh = zero1_shardings(tree, mesh8)
    assert list(sh["a"].spec) == ["data"]
    assert list(sh["b"].spec) == [None, "data"]
    assert list(sh["c"].spec) == []
    assert list(sh["d"].spec) == []


def test_fsdp_matches_replicated_and_shards_params(mesh8):
    from surya_tpu.parallel.zero import apply_fsdp

    cfg, model, tx, state0, batch = _setup(mesh8)
    key = jax.random.key(1)
    with mesh8:
        sharded = shard_batch(mesh8, batch)

        base_state = replicate(mesh8, state0)
        base_step = make_train_step(model, tx, cfg)
        for _ in range(2):
            base_state, base_m = base_step(base_state, sharded, key)

        f_state = replicate(mesh8, state0)
        f_state, shardings = apply_fsdp(f_state, mesh8)
        f_step = make_train_step(model, tx, cfg, mesh=mesh8,
                                 state_shardings=shardings)
        for _ in range(2):
            f_state, f_m = f_step(f_state, sharded, key)

    np.testing.assert_allclose(float(base_m["loss"]), float(f_m["loss"]),
                               rtol=1e-5)
    # Adam divides by sqrt(v)+eps: for near-zero-gradient elements the
    # reduce-scatter's different summation order (vs the replicated
    # all-reduce) turns ~1e-7 rounding into visible update differences,
    # so the adamw A/B gets a mechanism-appropriate tolerance; exact
    # scheduling equality is pinned by the SGD test below.
    for a, b in zip(jax.tree.leaves(base_state.params),
                    jax.tree.leaves(f_state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-3, rtol=1e-3)
    # params themselves are sharded 1/8 per device under FSDP
    big = [l for l in jax.tree.leaves(f_state.params)
           if hasattr(l, "sharding") and "data" in tuple(l.sharding.spec)]
    assert big, "no FSDP-sharded params"
    leaf = max(big, key=lambda l: l.size)
    assert leaf.addressable_shards[0].data.size == leaf.size // 8


def test_fsdp_sgd_is_exact(mesh8):
    """With SGD (updates linear in grads — no epsilon amplification)
    the FSDP step matches the replicated step to float tolerance,
    pinning the sharded schedule itself as numerically faithful."""
    import optax

    from surya_tpu.parallel.zero import apply_fsdp

    cfg, model, _, state0, batch = _setup(mesh8)
    tx = optax.sgd(1e-2)
    state0 = state0.replace(opt_state=jax.tree.map(
        np.asarray, jax.device_get(tx.init(state0.params))))
    key = jax.random.key(1)
    with mesh8:
        sharded = shard_batch(mesh8, batch)

        base_state = replicate(mesh8, state0)
        base_step = make_train_step(model, tx, cfg)
        for _ in range(3):
            base_state, _ = base_step(base_state, sharded, key)

        f_state = replicate(mesh8, state0)
        f_state, shardings = apply_fsdp(f_state, mesh8)
        f_step = make_train_step(model, tx, cfg, mesh=mesh8,
                                 state_shardings=shardings)
        for _ in range(3):
            f_state, _ = f_step(f_state, sharded, key)

    for a, b in zip(jax.tree.leaves(base_state.params),
                    jax.tree.leaves(f_state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-5)


def test_zero1_via_train_loop(mesh8):
    """End-to-end: train_and_evaluate with train.zero1=True converges
    the same interface-wise (smoke — full numerics pinned above)."""
    from surya_tpu.data import ArrayDataSource, make_synthetic_spatial
    from surya_tpu.train import train_and_evaluate

    cfg = Config(
        model=ModelConfig(name="quadtree", mode="fusion", num_classes=4,
                          compute_dtype="float32"),
        data=DataConfig(batch_size=16),
        train=TrainConfig(lr=3e-3, epochs=2, nan_guard=False,
                          zero1=True, early_stop_patience=0),
    )
    splits = {s: make_synthetic_spatial(num_classes=4, per_class=8,
                                        image_size=64, seed=i)
              for i, s in enumerate(["train", "valid", "test"])}
    out = train_and_evaluate(cfg, ArrayDataSource(splits, 16),
                             mesh=mesh8, checkpoints=False)
    assert np.isfinite(out["test"]["loss"])
    assert out["test"]["accuracy"] >= 0.25


def test_sharded_state_checkpoint_roundtrip(mesh8, tmp_path):
    """The multi-process checkpoint path hands orbax the live SHARDED
    jax.Arrays (core/checkpoint.snapshot: device_get on non-addressable
    shards would raise on a real multi-host run). Pin the mechanics in
    one process: an FSDP-sharded state saves directly and restores to
    the same values."""
    from surya_tpu.core.checkpoint import CheckpointManager
    from surya_tpu.parallel.zero import apply_fsdp

    cfg, model, tx, state0, batch = _setup(mesh8)
    with mesh8:
        f_state, _ = apply_fsdp(replicate(mesh8, state0), mesh8)
    # at least one leaf is genuinely sharded (not fully replicated)
    leaves = jax.tree.leaves(f_state.params)
    assert any(len(x.sharding.device_set) > 1
               and not x.sharding.is_fully_replicated for x in leaves)

    mgr = CheckpointManager(str(tmp_path / "ck"))
    mgr.save(0, f_state)  # sharded device arrays, no host gather
    mgr.wait()
    from surya_tpu.core.checkpoint import host_copy

    expected = host_copy(f_state)  # single-process: all addressable
    restored = mgr.restore(0, template=expected)
    mgr.close()
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(
            np.asarray(a), np.asarray(jax.device_get(b))),
        expected, restored)
