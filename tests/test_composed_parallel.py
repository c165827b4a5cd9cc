"""Composed parallelism: pp2 x tp2 x dp2 + ZeRO-1 in ONE program.

Round-2 review: the dryrun exercised axes pairwise, never composed —
"which is where sharding-annotation schemes usually break". It did: the
first composed run exposed two real bugs this file pins the fixes for:

1. ``parallel/pipeline.py`` ran with ``check_vma=False``; the input-
   microbatch cotangent is only nonzero on pipe rank 0 but its spec
   claimed replication, so XLA's unchecked choice was compile-dependent
   — correct for a bare value_and_grad, exactly (pipe*model)x too large
   for the patch-embed kernel once an optimizer update was compiled
   into the same program. Fixed with check_vma=True + pvary.
2. ZeRO-1 output shardings on a multi-axis mesh let GSPMD mark a conv
   kernel grad partial-sum over unrelated axes (same 4x error without
   any pipeline involved); ``train/steps.make_train_step`` now pins
   grads to the param shardings (``pin_grads``).

The composed program: FACT with its 4 fusion layers pipelined over
'pipe' (2 stages, GPipe), TP param sharding over 'model' (auto axis
inside the shard_map body — partial-manual shard_map), batch over
'data', Adam moments ZeRO-1-sharded over 'data'. Exactness vs the
single-device stack: loss and grads < 1e-5.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from surya_tpu.models.temporal.fact import FactModel, fact_apply_pipelined
from surya_tpu.parallel.zero import zero1_shardings


@pytest.fixture(scope="module")
def setup():
    devices = jax.devices()[:8]
    mesh = Mesh(np.array(devices).reshape(2, 2, 2),
                ("pipe", "model", "data"))
    rng = np.random.default_rng(0)
    b = 8
    model = FactModel(num_classes=8, seq_len=2, num_features=47,
                      embed_dim=32, num_layers=4, num_heads=4,
                      vit_depth=1, vit_heads=2, dtype=jnp.float32,
                      dropout=0.0, freeze_backbone=False)
    imgs = jnp.asarray(rng.normal(size=(b, 2, 32, 32, 3)), jnp.float32)
    nums = jnp.asarray(rng.normal(size=(b, 2, 47)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, 8, b), jnp.int32)
    variables = model.init({"params": jax.random.key(1)}, imgs, nums,
                           train=False)
    tx = optax.adamw(1e-3, weight_decay=1e-4)
    return mesh, model, variables["params"], tx, imgs, nums, labels


def _tp_spec(v):
    """Shard the last axis over 'model' for matmul-sized leaves
    (the parallel/sharding.py rule at a test-sized threshold)."""
    shape = np.shape(v)
    spec = [None] * len(shape)
    if len(shape) >= 2 and v.size >= 1024 and shape[-1] % 2 == 0:
        spec[-1] = "model"
    return P(*spec)


def test_pp2_tp2_dp2_zero1_matches_single_device(setup):
    mesh, model, params, tx, imgs, nums, labels = setup

    # ---- single-device reference: loss, grads, one adamw step -------
    def ref_loss(p):
        logits = model.apply({"params": p}, imgs, nums, train=False)
        return optax.softmax_cross_entropy_with_integer_labels(
            logits, labels).mean()

    rloss, rgrads = jax.jit(jax.value_and_grad(ref_loss))(params)

    # ---- composed placement -----------------------------------------
    pp = jax.tree.map(
        lambda x: jax.device_put(x, NamedSharding(mesh, _tp_spec(x))),
        params)
    n_tp = sum(1 for leaf in jax.tree.leaves(pp)
               if "model" in jax.tree.leaves(
                   tuple(getattr(leaf.sharding, "spec", None) or ())))
    assert n_tp > 0, "no param actually TP-sharded"
    psh = jax.tree.map(lambda x: x.sharding, pp)
    osh = zero1_shardings(tx.init(params), mesh)
    opt0 = jax.device_put(tx.init(pp), osh)
    data_sh = NamedSharding(mesh, P("data"))
    ii, nn_, ll = (jax.device_put(a, data_sh)
                   for a in (imgs, nums, labels))

    def pp_loss(p):
        logits = fact_apply_pipelined(
            model, {"params": p}, ii, nn_, mesh, num_microbatches=4,
            batch_spec=P("data"),
            manual_axes=frozenset({"pipe", "data"}))
        return optax.softmax_cross_entropy_with_integer_labels(
            logits, ll).mean()

    def train_step(p, o):
        loss, grads = jax.value_and_grad(pp_loss)(p)
        grads = jax.lax.with_sharding_constraint(grads, psh)
        upd, new_o = tx.update(grads, o, p)
        return optax.apply_updates(p, upd), new_o, loss, grads

    rep = NamedSharding(mesh, P())
    with jax.sharding.set_mesh(mesh):
        step = jax.jit(train_step, out_shardings=(psh, osh, rep, psh))
        new_params, new_opt, loss, grads = step(pp, opt0)

    # exactness vs the single-device stack
    assert abs(float(loss) - float(rloss)) < 1e-6
    gerr = max(jax.tree.leaves(jax.tree.map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))),
        jax.device_get(grads), jax.device_get(rgrads))))
    assert gerr < 1e-5, f"composed grads diverge: {gerr}"

    # the parallelism is real: zero1 moments over 'data', TP over 'model'
    zleaves = [l for l in jax.tree.leaves(new_opt)
               if getattr(l.sharding, "spec", None)
               and "data" in jax.tree.leaves(tuple(l.sharding.spec))]
    assert zleaves, "no zero1-sharded moment leaves"
    for leaf in jax.tree.leaves(new_params):
        assert np.all(np.isfinite(np.asarray(jax.device_get(leaf))))
