"""Pipeline parallelism: GPipe microbatch schedule over a mesh axis.

The reference trains everything on one ``cuda:0`` (e.g.
``VIT/fact_train.py``); pipeline parallelism has no counterpart there.
This module adds the TPU-native version for the one model family whose
trunk is a homogeneous layer stack — FACT's 4 identical post-LN
encoder layers (``VIT/fact_model.py:50-58``). CNN families have
shape-heterogeneous stages (112²x64 → 7²x512), which SPMD pipelining
over a mesh axis cannot express without per-stage padding waste; they
scale via data/tensor parallelism instead (parallel/sharding.py).

Formulation (the standard JAX/TPU pattern — see jax-ml.github.io
scaling-book ch. "pipelining"): the L layers' parameter trees are
stacked on a leading axis and sharded over the mesh's ``pipe`` axis, so
each of the S stages holds L/S layers. Inside ``shard_map`` a
``lax.scan`` runs M + S - 1 ticks; per tick every stage applies its
layers to its current activation and hands the result to the next stage
with ``lax.ppermute`` (activations ride ICI, no host involvement).
Stage 0 ingests microbatch t at tick t; stage S-1 emits microbatch
t-(S-1); a masked ``psum`` replicates the collected outputs. The whole
schedule is differentiable — ``jax.grad`` of the scan yields the
reverse pipeline (backward ppermutes run in the opposite direction)
with no hand-written backward pass, which is how the 1F1B-style
backward emerges from the functional formulation.

Bubble fraction is (S-1)/(M+S-1) — pick num_microbatches >> stages.
Outputs of every tick are stacked by the scan (GPipe-style activation
stashing); pair with ``jax.checkpoint`` around ``layer_fn`` for
longer stacks.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

try:  # jax ≥ 0.6 exposes shard_map at top level
    from jax import shard_map
except ImportError:  # pragma: no cover - older jax spells the
    # replication-check kwarg check_rep, so translate our check_vma
    from jax.experimental.shard_map import shard_map as _legacy_shard_map

    def shard_map(*args, check_vma=True, **kwargs):
        return _legacy_shard_map(*args, check_rep=check_vma, **kwargs)


def _pvary(x, axis_name: str):
    """Mark x as varying over axis_name (vma system). jax ≥ 0.9 spells
    this lax.pcast(to='varying'); older versions lax.pvary."""
    try:
        return lax.pcast(x, axis_name, to="varying")
    except (AttributeError, TypeError):  # pragma: no cover
        return lax.pvary(x, (axis_name,))


def stack_layer_params(params: dict, names: list[str]):
    """Stack the per-layer subtrees ``params[name]`` on a new leading
    axis (layer major). The flax param tree keeps per-layer names
    (fusion0..fusion3) for checkpoint/torch-import stability; the
    pipeline consumes the stacked view."""
    return jax.tree.map(lambda *xs: jnp.stack(xs),
                        *[params[n] for n in names])


def pipeline_apply(layer_fn: Callable[..., jnp.ndarray],
                   stacked_params: Any,
                   x: jnp.ndarray,
                   mesh: Mesh,
                   *,
                   pipe_axis: str = "pipe",
                   num_microbatches: int | None = None,
                   batch_spec: P = P(),
                   rng: jax.Array | None = None,
                   manual_axes: frozenset[str] | None = None) -> jnp.ndarray:
    """Run x through L stacked layers pipelined over ``pipe_axis``.

    ``layer_fn(layer_params, x)`` (or ``(layer_params, x, key)`` when
    ``rng`` is given — for dropout) applies ONE layer and must be shape
    preserving. ``stacked_params`` leading dim L must divide by the
    pipe axis size S. ``x`` is (B, ...); B must divide by
    ``num_microbatches`` (default S). ``batch_spec`` optionally shards
    the batch dim of x over other mesh axes (e.g. P('data')) to compose
    PP x DP on one mesh. With ``rng``, each (layer, microbatch) pair
    folds a distinct key, so dropout masks are independent across both
    (the mask assignment differs from a sequential-apply run — same
    distribution, different draw).

    ``manual_axes`` (default: all mesh axes) restricts which axes the
    shard_map body sees as manual collectives axes; the rest stay under
    GSPMD ("partial-auto" shard_map). Passing
    ``frozenset({pipe_axis, 'data'})`` on a ('pipe','model','data') mesh
    leaves 'model' to GSPMD, so layer weights whose last axis is sharded
    over 'model' get tensor-parallel matmuls INSIDE each pipeline stage —
    the PP x TP x DP composition (in_specs describe only the manual
    axes; auto-axis shardings ride through from the operands).
    """
    s = mesh.shape[pipe_axis]
    m = num_microbatches or s
    b = x.shape[0]
    if b % m:
        raise ValueError(f"batch {b} not divisible by microbatches {m}")
    lcount = jax.tree.leaves(stacked_params)[0].shape[0]
    if lcount % s:
        raise ValueError(f"{lcount} layers not divisible by {s} stages")
    per_stage = lcount // s

    mb = x.reshape((m, b // m) + x.shape[1:])

    in_specs = (jax.tree.map(lambda _: P(pipe_axis), stacked_params),
                P(None, *batch_spec))
    out_spec = P(None, *batch_spec)

    batch_axes = [a for axes in batch_spec if axes is not None
                  for a in ((axes,) if isinstance(axes, str) else axes)]

    def run(local_params, mbs):
        stage = lax.axis_index(pipe_axis)
        ticks = m + s - 1
        # align varying-axes: params (varying over pipe) meet activations
        # that additionally vary over the batch axes
        for a in batch_axes:
            local_params = jax.tree.map(lambda x: _pvary(x, a),
                                        local_params)
            stage = _pvary(stage, a)

        def tick(carry, t):
            act = carry
            # stage 0 ingests microbatch t (clamped; invalid ticks are
            # masked out at collection). The pvary marks feed as varying
            # over the pipe axis (it is consumed under a stage mask), so
            # the shard_map transpose inserts the psum that makes the
            # input cotangent well-defined — with check_vma=False XLA's
            # replication assumption on d_mbs was unchecked and a
            # compile-dependent 4x gradient error appeared when this
            # composed with an optimizer update (round-3 fix).
            feed = _pvary(lax.dynamic_index_in_dim(
                mbs, jnp.minimum(t, m - 1), 0, keepdims=False), pipe_axis)
            act = jnp.where(stage == 0, feed, act)

            # apply this stage's L/S layers
            def one_layer(a, p_i):
                p, i = p_i
                if rng is None:
                    return layer_fn(p, a), None
                # distinct key per (global layer, microbatch)
                k = jax.random.fold_in(rng, stage * per_stage + i)
                k = jax.random.fold_in(k, t - stage)
                return layer_fn(p, a, k), None

            act, _ = lax.scan(one_layer, act,
                              (local_params, jnp.arange(per_stage)))

            # hand activation to the next stage (ring; stage S-1 -> 0
            # wraps but stage 0 overwrites with the next microbatch)
            out = act
            act = lax.ppermute(act, pipe_axis,
                               [(i, (i + 1) % s) for i in range(s)])
            return act, out

        init = _pvary(jnp.zeros_like(mbs[0]), pipe_axis)
        _, outs = lax.scan(tick, init, jnp.arange(ticks))

        # stage S-1's outputs at ticks S-1 .. S-1+M-1 are microbatches
        # 0..M-1; masked psum replicates them everywhere
        picked = outs[s - 1:s - 1 + m]
        picked = jnp.where(stage == s - 1, picked,
                           jnp.zeros_like(picked))
        return lax.psum(picked, pipe_axis)

    kwargs = {}
    if manual_axes is not None:
        kwargs["axis_names"] = frozenset(manual_axes)
    outs = shard_map(run, mesh=mesh, in_specs=in_specs,
                     out_specs=out_spec, check_vma=True, **kwargs)(
                         stacked_params, mb)
    return outs.reshape((b,) + x.shape[1:])
