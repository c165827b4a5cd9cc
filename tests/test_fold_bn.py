"""BN-folding exactness: ResNet(fold_bn=True) on fold_resnet_params
output must match the unfolded trunk's inference forward exactly.

The fold is the standard deployment transform (BN inference affine →
conv kernel scale + bias). Performance on TPU is measured separately
(scripts/tpu_bnfold_probe.py, BENCH_NOTES); this pins correctness on
non-trivial running statistics for both block types.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from surya_tpu.models.backbones.resnet import (
    BasicBlock,
    Bottleneck,
    ResNet,
    fold_resnet_params,
)


def _randomize(variables, seed=0):
    """Non-trivial BN stats/affines so the fold actually does work."""
    rng = np.random.default_rng(seed)

    def rand_like(path, leaf):
        name = path[-1].key
        a = np.asarray(leaf)
        if name == "var":
            return jnp.asarray(rng.uniform(0.2, 3.0, a.shape), a.dtype)
        if name in ("mean", "bias", "scale"):
            return jnp.asarray(rng.normal(0, 0.5, a.shape), a.dtype)
        return leaf

    return jax.tree_util.tree_map_with_path(rand_like, variables)


@pytest.mark.parametrize("block,sizes", [(BasicBlock, (2, 2, 2, 2)),
                                         (Bottleneck, (1, 1, 1, 1))])
def test_fold_bn_exact(block, sizes):
    model = ResNet(block=block, stage_sizes=sizes, dtype=jnp.float32)
    x = jnp.asarray(np.random.default_rng(1).normal(
        0, 1, (2, 64, 64, 3)).astype(np.float32))
    variables = _randomize(model.init(jax.random.PRNGKey(0), x))

    want = model.apply(variables, x, train=False)["out"]

    folded = fold_resnet_params(variables["params"],
                                variables["batch_stats"])
    fm = ResNet(block=block, stage_sizes=sizes, dtype=jnp.float32,
                fold_bn=True)
    got = fm.apply({"params": folded}, x, train=False)["out"]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)

    # param tree is conv-only (biases added, BN gone)
    flat = jax.tree_util.tree_leaves_with_path(folded)
    names = {p[-1].key for p, _ in flat}
    assert names == {"kernel", "bias"}


def test_fold_bn_train_mode_rejected():
    fm = ResNet(dtype=jnp.float32, fold_bn=True)
    x = jnp.zeros((1, 32, 32, 3))
    with pytest.raises(ValueError, match="inference-only"):
        fm.init(jax.random.PRNGKey(0), x, train=True)
