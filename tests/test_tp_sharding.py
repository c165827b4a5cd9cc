"""Tensor-parallel partitioning rule + dp×tp train step on the fake mesh."""

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from surya_tpu.core.mesh import MeshSpec, create_mesh, replicate, shard_batch
from surya_tpu.parallel.sharding import (
    count_sharded,
    param_partition_spec,
    partition_params,
)


def test_partition_rule():
    big = np.zeros((5376, 2688), np.float32)     # classifier fc1
    small = np.zeros((47, 94), np.float32)
    conv = np.zeros((3, 3, 256, 128), np.float32)
    bias = np.zeros((128,), np.float32)
    assert param_partition_spec(None, big, 2) == P(None, "model")
    assert param_partition_spec(None, small, 2) == P()      # too small
    assert param_partition_spec(None, conv, 2) == P(
        None, None, None, "model")                          # big enough
    assert param_partition_spec(None, bias, 2) == P()       # 1-D
    assert param_partition_spec(None, big, 1) == P()        # no model axis


def test_dp2_tp2_sp2_train_step():
    from surya_tpu.core.config import Config, DataConfig, ModelConfig, TrainConfig
    from surya_tpu.core.prng import PRNG
    from surya_tpu.models import get_model

    mesh = create_mesh(MeshSpec(data=2, model=2, seq=2))
    cfg = Config(model=ModelConfig(name="quadtree", num_classes=8,
                                   compute_dtype="float32",
                                   use_pallas=False),
                 data=DataConfig(batch_size=8, image_size=64),
                 train=TrainConfig(lr=1e-3, seed=0))
    model = get_model(cfg.model)
    rng = np.random.default_rng(0)
    batch = (rng.normal(size=(8, 64, 64, 3)).astype(np.float32),
             rng.normal(size=(8, 47)).astype(np.float32),
             rng.integers(0, 8, 8).astype(np.int32))
    from surya_tpu.train.steps import create_train_state, make_train_step
    with mesh:
        state, tx = create_train_state(model, cfg, PRNG(0).named(0, "i"),
                                       batch)
        state = replicate(mesh, state)
        n_tp, n_total = count_sharded(state.params, mesh)
        assert n_tp > 0
        state = state.replace(params=partition_params(state.params, mesh))
        step = make_train_step(model, tx, cfg)
        state, m = step(state, shard_batch(mesh, batch),
                        PRNG(0).named(0, "d"))
        assert np.isfinite(float(jax.device_get(m["loss"])))


def test_bn_stats_are_global_across_mesh():
    """BN batch statistics under the sharded step must equal the
    single-device statistics for the same global batch (the 'synced BN
    for free' claim in train/steps.py)."""
    import jax.numpy as jnp

    from surya_tpu.core.config import Config, DataConfig, ModelConfig, TrainConfig
    from surya_tpu.core.mesh import single_device_mesh
    from surya_tpu.core.prng import PRNG
    from surya_tpu.models import get_model
    from surya_tpu.train.steps import create_train_state, make_train_step

    cfg = Config(model=ModelConfig(name="standard_resnet", num_classes=4,
                                   compute_dtype="float32"),
                 data=DataConfig(batch_size=8),
                 train=TrainConfig(lr=0.0, seed=0, nan_guard=False))
    model = get_model(cfg.model)
    rng = np.random.default_rng(0)
    batch = (rng.normal(size=(8, 32, 32, 3)).astype(np.float32),
             rng.normal(size=(8, 47)).astype(np.float32),
             rng.integers(0, 4, 8).astype(np.int32))

    stats = {}
    for label, mesh in [("mesh8", create_mesh(MeshSpec(data=8))),
                        ("mesh1", single_device_mesh())]:
        with mesh:
            state, tx = create_train_state(model, cfg,
                                           PRNG(0).named(0, "i"), batch)
            state = replicate(mesh, state)
            step = make_train_step(model, tx, cfg)
            new_state, _ = step(state, shard_batch(mesh, batch),
                                PRNG(0).named(0, "d"))
            stats[label] = jax.device_get(new_state.batch_stats)
    for a, b in zip(jax.tree.leaves(stats["mesh8"]),
                    jax.tree.leaves(stats["mesh1"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
