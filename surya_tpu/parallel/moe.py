"""Mixture-of-Experts FFN with expert parallelism (EP).

The reference has no MoE (SURVEY §2.5: "Expert parallel — no"); this is
the beyond-parity member of the parallelism suite, completing the
dp/tp/pp/sp/ep set. The design is the standard TPU dense-dispatch MoE
(GShard/Switch style — einsum dispatch with a capacity limit, not
sparse gather/scatter, so everything stays MXU-shaped):

- a router scores tokens in f32; top-k experts per token, gate values
  renormalized over the chosen k;
- tokens are placed into per-expert capacity slots by a priority
  cumsum; overflow tokens are DROPPED from the MoE output (their
  combine weight is zero — the encoder's residual connection carries
  them through unchanged, the classic Switch behavior);
- dispatch/combine are (tokens, experts, capacity) one-hot einsums, so
  expert compute is three batched matmuls over the expert dim;
- the Switch load-balancing auxiliary loss (num_experts · Σ_e f_e·P_e,
  =1 at perfect balance) is sown into the ``losses`` collection scaled
  by ``aux_loss_weight``; the train step adds every sown loss to the
  objective (train/steps.py).

Expert parallelism is a sharding annotation, not hand-written
communication: the (E, capacity, d) dispatch tensors and the (E, ...)
expert weights carry ``with_sharding_constraint(P(expert_axis))`` and
XLA inserts the all-to-alls over ICI. On a 1-device mesh (or
``mesh=None``) the same program runs unsharded — tests pin the two
paths equal.
"""

from __future__ import annotations

import math
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P


def top_k_dispatch(probs: jnp.ndarray, k: int, capacity: int):
    """Route each token to its top-k experts with capacity limits.

    probs: (N, E) router probabilities (f32). Returns
    (dispatch, combine, aux): dispatch (N, E, C) 0/1, combine (N, E, C)
    gate-weighted, aux the Switch load-balance scalar. Priority is
    gate order (k=0 choices fill slots before k=1) then token order —
    deterministic, matching the einsum-MoE convention.
    """
    n, e = probs.shape
    gate_vals, gate_idx = jax.lax.top_k(probs, k)
    gate_vals = gate_vals / jnp.sum(gate_vals, -1, keepdims=True)

    counts = jnp.zeros((e,), jnp.int32)
    dispatch = jnp.zeros((n, e, capacity), probs.dtype)
    combine = jnp.zeros((n, e, capacity), probs.dtype)
    for kk in range(k):
        oh = jax.nn.one_hot(gate_idx[:, kk], e, dtype=jnp.int32)
        pos = jnp.cumsum(oh, axis=0) - 1 + counts[None, :]
        counts = counts + jnp.sum(oh, axis=0)
        within = ((pos < capacity) & (oh > 0)).astype(probs.dtype)
        d_k = jax.nn.one_hot(jnp.clip(pos, 0, capacity - 1), capacity,
                             dtype=probs.dtype) * within[..., None]
        dispatch = dispatch + d_k
        combine = combine + d_k * gate_vals[:, kk][:, None, None]

    # Switch aux loss on the top-1 assignment: E * Σ_e f_e * P_e
    top1 = jax.nn.one_hot(gate_idx[:, 0], e, dtype=probs.dtype)
    f = jnp.mean(top1, axis=0)
    p = jnp.mean(probs, axis=0)
    aux = e * jnp.sum(f * p)
    return dispatch, combine, aux


class MoEFFN(nn.Module):
    """Drop-in MoE replacement for a d→ff→d ReLU FFN.

    With ``mesh`` (a Mesh whose ``expert_axis`` exists), expert weights
    and per-expert activations are sharded over that axis — EP. The
    auxiliary loss is sown into ``losses`` (collect with
    ``mutable=['losses']``; train/steps.py adds it to the objective).
    """

    num_experts: int = 4
    ff_dim: int = 3072
    top_k: int = 2
    capacity_factor: float = 2.0
    aux_loss_weight: float = 0.01
    dropout: float = 0.0
    dtype: Any = jnp.bfloat16
    mesh: Any = None
    expert_axis: str = "expert"

    def _constrain(self, x, *spec):
        if self.mesh is not None and self.mesh.shape.get(
                self.expert_axis, 1) > 1:
            return jax.lax.with_sharding_constraint(
                x, NamedSharding(self.mesh, P(*spec)))
        return x

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, t, d = x.shape
        e, ff = self.num_experts, self.ff_dim
        if self.top_k > e:
            raise ValueError(f"top_k={self.top_k} > num_experts={e}")
        if (self.mesh is not None
                and e % self.mesh.shape.get(self.expert_axis, 1)):
            raise ValueError(
                f"num_experts={e} not divisible by mesh axis "
                f"{self.expert_axis!r}="
                f"{self.mesh.shape[self.expert_axis]}")
        n = b * t
        capacity = int(math.ceil(
            self.top_k * n / e * self.capacity_factor))

        tokens = x.reshape(n, d)

        router = self.param("router", nn.initializers.normal(0.02),
                            (d, e), jnp.float32)
        probs = jax.nn.softmax(
            tokens.astype(jnp.float32) @ router, axis=-1)
        dispatch, combine, aux = top_k_dispatch(probs, self.top_k,
                                                capacity)
        self.sow("losses", "moe_aux",
                 aux * self.aux_loss_weight,
                 reduce_fn=lambda a, b: a + b, init_fn=lambda: 0.0)

        # expert weights carry the expert-axis constraint too: without
        # it GSPMD keeps them replicated and EP saves no weight memory
        w1 = self._constrain(
            self.param("w1", nn.initializers.lecun_normal(),
                       (e, d, ff), jnp.float32), self.expert_axis)
        b1 = self._constrain(
            self.param("b1", nn.initializers.zeros, (e, ff),
                       jnp.float32), self.expert_axis)
        w2 = self._constrain(
            self.param("w2", nn.initializers.lecun_normal(),
                       (e, ff, d), jnp.float32), self.expert_axis)
        b2 = self._constrain(
            self.param("b2", nn.initializers.zeros, (e, d),
                       jnp.float32), self.expert_axis)

        cd = self.dtype
        xin = jnp.einsum("nec,nd->ecd", dispatch.astype(cd),
                         tokens.astype(cd))
        xin = self._constrain(xin, self.expert_axis)
        h = jnp.einsum("ecd,edf->ecf", xin, w1.astype(cd))
        h = nn.relu(h + b1.astype(cd)[:, None])
        h = self._constrain(h, self.expert_axis)
        if self.dropout and train:
            h = nn.Dropout(self.dropout, deterministic=False)(h)
        out_e = jnp.einsum("ecf,efd->ecd", h, w2.astype(cd))
        out_e = out_e + b2.astype(cd)[:, None]
        out_e = self._constrain(out_e, self.expert_axis)
        out = jnp.einsum("nec,ecd->nd", combine.astype(cd), out_e)
        return out.reshape(b, t, d)


def expert_shardings(params, mesh, expert_axis: str = "expert"):
    """NamedSharding tree placing MoE expert tensors (leaves under an
    ``MoEFFN`` scope — named ``moe`` in FactModel — with a leading E
    dim: w1/b1/w2/b2) over the expert axis, everything else
    replicated. ``jax.device_put(params, expert_shardings(...))``
    before training gives true 1/ep-per-chip expert weight memory; the
    in-module constraints then keep them sharded through the step."""
    import jax.tree_util as jtu

    expert_leaves = {"w1", "b1", "w2", "b2"}

    def spec(path, leaf):
        keys = [p.key for p in path if hasattr(p, "key")]
        # w1/b1/w2/b2 are MoEFFN-specific names (flax Dense uses
        # kernel/bias), so the leaf name alone identifies expert params
        if keys and keys[-1] in expert_leaves:
            return NamedSharding(mesh, P(expert_axis))
        return NamedSharding(mesh, P())

    return jtu.tree_map_with_path(spec, params)
