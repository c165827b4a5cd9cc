"""ZeRO-1 optimizer-state sharding over the data axis.

The reference trains on one GPU (SURVEY §2.5 — `cuda:0` at every entry
point), so no optimizer-state partitioning exists there; this is a
beyond-reference scaling feature. ZeRO stage 1 (Rajbhandari et al.,
"ZeRO: Memory Optimizations Toward Training Trillion Parameter
Models") keeps only a 1/N shard of the Adam moments on each
data-parallel rank. The TPU-native formulation is pure annotation — no
manual reduce-scatter/all-gather code:

- each optimizer-state leaf is placed with a ``NamedSharding`` that
  splits its first axis divisible by the data-parallel size over
  ``'data'`` (first match wins, pinned by test);
- the train step is jitted with matching ``out_shardings`` (see
  ``train/steps.make_train_step``), and GSPMD derives the ZeRO dance:
  gradients reduce-scatter into the moment update (local to the
  shard), updates all-gather into the replicated parameter apply.

Per-chip memory saved: (N-1)/N of the f32 Adam mu/nu — 2× params bytes
— which is what bounds batch size once activations are rematerialized.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _leaf_spec(shape: tuple, n: int) -> P:
    """Split the first axis with size divisible by n; replicate if none."""
    for d, size in enumerate(shape):
        if size >= n and size % n == 0:
            return P(*([None] * d + ["data"]))
    return P()


def zero1_shardings(tree, mesh: Mesh):
    """NamedSharding pytree for an optimizer state: array leaves split
    over the 'data' axis where divisible, scalars/indivisible replicated."""
    n = mesh.shape["data"]

    def place(leaf):
        shape = tuple(getattr(leaf, "shape", ()) or ())
        return NamedSharding(mesh, _leaf_spec(shape, n))

    return jax.tree.map(place, tree)


def zero1_state_shardings(state, mesh: Mesh):
    """TrainState-shaped sharding pytree: params/batch_stats/step KEEP
    their current placement (ZeRO-1 shards ONLY optimizer state — this
    lets it compose with TP column-sharded params), opt_state split
    over 'data'."""
    rep = NamedSharding(mesh, P())

    def keep(leaf):
        sh = getattr(leaf, "sharding", None)
        return sh if isinstance(sh, jax.sharding.Sharding) else rep

    return state.replace(
        step=keep(state.step),
        params=jax.tree.map(keep, state.params),
        batch_stats=jax.tree.map(keep, state.batch_stats),
        opt_state=zero1_shardings(state.opt_state, mesh))


def apply_zero1(state, mesh: Mesh):
    """Re-place a (replicated) TrainState with sharded optimizer state.
    Returns (state, shardings) — pass the shardings to make_train_step
    so the step's outputs stay sharded (donation-compatible)."""
    shardings = zero1_state_shardings(state, mesh)
    return jax.device_put(state, shardings), shardings


def fsdp_state_shardings(state, mesh: Mesh):
    """FSDP (ZeRO-3-style) shardings: params, batch_stats AND optimizer
    state all split over 'data' on their first divisible axis.

    With GSPMD this is, again, pure annotation: each layer's weights
    all-gather just-in-time for its matmul in forward/backward and the
    full tensor is discarded afterwards, gradients reduce-scatter, and
    the optimizer update runs on the local 1/N shard. Per-chip steady
    state: (params + moments + stats) / N — the JAX-native equivalent
    of torch FSDP without any wrapper modules."""
    return state.replace(
        step=NamedSharding(mesh, P()),
        params=zero1_shardings(state.params, mesh),
        batch_stats=zero1_shardings(state.batch_stats, mesh),
        opt_state=zero1_shardings(state.opt_state, mesh))


def apply_fsdp(state, mesh: Mesh):
    """Re-place a TrainState fully sharded (see fsdp_state_shardings)."""
    shardings = fsdp_state_shardings(state, mesh)
    return jax.device_put(state, shardings), shardings
