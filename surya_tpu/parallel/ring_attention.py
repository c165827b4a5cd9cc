"""Ring attention: sequence/context parallelism over the ('seq',) mesh axis.

The reference has no sequence parallelism (max 2T+1 = 9 fusion tokens,
``VIT/fact_model.py:86``), so this is the framework's demonstrated CP
capability per SURVEY §5.7: the FACT-style fusion attention written over
a ('data','seq') mesh with shard_map — each device holds a T/n slice of
Q/K/V; K/V blocks rotate around the ring via ``jax.lax.ppermute`` while
a flash-style online-softmax accumulator keeps the numerics exact. The
result is bit-comparable (up to fp reassociation) with full attention,
at O(T/n) activation memory per device and compute/comm overlap on ICI.

Supported (hardened beyond the round-1 demo):
- token counts NOT divisible by the seq-axis size (internal padding; the
  pad keys are masked with a large-negative additive bias and pad query
  rows are sliced away — large-negative, not -inf, keeps the backward
  NaN-free);
- an additive attention bias / boolean mask (broadcastable to
  (B, H, Tq, Tk)) — enables causal and padded-batch attention. The bias
  rows are sharded with Q; the columns stay replicated and each ring
  step slices the block that matches the K/V block currently held
  (origin device = (my_index - step) mod ring_size);
- attention-weight dropout on the ring path, matching flax semantics
  (dropout on the softmax-normalized weights, inverted scaling): the
  per-(row-block, col-block) masks derive from ``fold_in``s of the
  dropout rng so every device draws consistent masks; the softmax
  denominator is accumulated UNdropped, as in
  ``flax.linen.dot_product_attention``.

Layout: (B, T, H, D) with T sharded over 'seq'. Bidirectional (encoder)
attention by default — matching the reference's fusion transformer.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:  # jax ≥ 0.6 exposes shard_map at top level
    from jax import shard_map
except ImportError:  # pragma: no cover - older jax spells the
    # replication-check kwarg check_rep, so translate our check_vma
    from jax.experimental.shard_map import shard_map as _legacy_shard_map

    def shard_map(*args, check_vma=True, **kwargs):
        return _legacy_shard_map(*args, check_rep=check_vma, **kwargs)

NEG = jnp.float32(-1e9)  # finite "-inf": keeps grads NaN-free


def _ring_attention_local(q, k, v, bias, dropout_rng, axis_name: str,
                          axis_size: int, scale: float,
                          dropout_rate: float, broadcast_dropout: bool):
    """Per-device body: local Q attends to every K/V block as the blocks
    rotate around the ring. Online-softmax accumulation in float32.

    ``bias`` is (B|1, H|1, Tq_local, Tk_global) additive, or None. At
    ring step s the K/V block held here originated on device
    (idx - s) mod n, i.e. global columns [src·tk, (src+1)·tk).
    """
    qf = q.astype(jnp.float32)
    b, tq, h, d = qf.shape
    tk = k.shape[1]
    idx = jax.lax.axis_index(axis_name)

    m = jnp.full((b, h, tq), -jnp.inf, jnp.float32)       # running max
    l = jnp.zeros((b, h, tq), jnp.float32)                # running denom
    acc = jnp.zeros((b, h, tq, d), jnp.float32)

    perm = [(i, (i + 1) % axis_size) for i in range(axis_size)]
    for step in range(axis_size):
        src = (idx - step) % axis_size
        kf = k.astype(jnp.float32)
        vf = v.astype(jnp.float32)
        # scores: (B, H, Tq, Tk)
        s = jnp.einsum("bqhd,bkhd->bhqk", qf, kf) * scale
        if bias is not None:
            bcols = jax.lax.dynamic_slice_in_dim(bias, src * tk, tk,
                                                 axis=3)
            s = s + bcols.astype(jnp.float32)
        m_new = jnp.maximum(m, s.max(axis=-1))
        p = jnp.exp(s - m_new[..., None])
        corr = jnp.exp(m - m_new)
        l = l * corr + p.sum(axis=-1)                     # UNdropped denom
        if dropout_rate > 0.0:
            # consistent per-(row-block, col-block) mask on every device
            rng = jax.random.fold_in(jax.random.fold_in(
                dropout_rng, idx), src)
            # flax broadcast_dropout shares the mask over batch AND
            # heads (dropout_shape (1, 1, q, kv) in linen attention)
            shape = (1, 1, tq, tk) if broadcast_dropout else \
                (b, h, tq, tk)
            keep = jax.random.bernoulli(rng, 1.0 - dropout_rate, shape)
            p = jnp.where(keep, p / (1.0 - dropout_rate), 0.0)
        acc = acc * corr[..., None] + jnp.einsum("bhqk,bkhd->bhqd", p, vf)
        m = m_new
        # rotate K/V to the next device (overlaps with the next step's
        # compute under XLA's async collective scheduling)
        k = jax.lax.ppermute(k, axis_name, perm)
        v = jax.lax.ppermute(v, axis_name, perm)

    out = acc / l[..., None]
    return out.transpose(0, 2, 1, 3).astype(q.dtype)      # (B, Tq, H, D)


def ring_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                   mesh: Mesh, seq_axis: str = "seq",
                   bias: jnp.ndarray | None = None,
                   mask: jnp.ndarray | None = None,
                   dropout_rate: float = 0.0, dropout_rng=None,
                   broadcast_dropout: bool = True) -> jnp.ndarray:
    """(B, T, H, D) q/k/v with T sharded over ``seq_axis`` → attention
    output, same sharding.

    - ``T`` need not divide the axis size: inputs are padded internally,
      pad keys masked, pad query rows sliced off.
    - ``bias`` additive and/or ``mask`` boolean (True = attend), both
      broadcastable to (B, H, T, T).
    - ``dropout_rate``/``dropout_rng``: attention-weight dropout (flax
      semantics). Works for axis size 1 (degenerates to plain flash
      attention).
    """
    axis_size = mesh.shape[seq_axis]
    scale = 1.0 / (q.shape[-1] ** 0.5)
    b, t, h, d = q.shape
    pad = (-t) % axis_size
    tp = t + pad

    if mask is not None:
        mbias = jnp.where(mask, 0.0, NEG).astype(jnp.float32)
        bias = mbias if bias is None else bias + mbias
    if pad and bias is None:
        bias = jnp.zeros((1, 1, t, t), jnp.float32)
    if bias is not None:
        bias = jnp.broadcast_to(
            bias.astype(jnp.float32),
            (bias.shape[0], bias.shape[1], t, t))
        # pad: rows (pad queries) with 0s — sliced away below; columns
        # (pad keys) with NEG so no real query attends to them.
        bias = jnp.pad(bias, ((0, 0), (0, 0), (0, pad), (0, pad)),
                       constant_values=0.0)
        if pad:
            bias = bias.at[:, :, :, t:].set(NEG)
    if pad:
        zpad = ((0, 0), (0, pad), (0, 0), (0, 0))
        q = jnp.pad(q, zpad)
        k = jnp.pad(k, zpad)
        v = jnp.pad(v, zpad)

    if dropout_rate > 0.0 and dropout_rng is None:
        raise ValueError("dropout_rate > 0 requires dropout_rng")

    spec = P(None, seq_axis, None, None)
    in_specs = [spec, spec, spec,
                None if bias is None else P(None, None, seq_axis, None),
                None if dropout_rng is None else P()]

    fn = shard_map(
        partial(_ring_attention_local, axis_name=seq_axis,
                axis_size=axis_size, scale=scale,
                dropout_rate=dropout_rate,
                broadcast_dropout=broadcast_dropout),
        mesh=mesh, in_specs=tuple(in_specs), out_specs=spec,
        check_vma=False)
    out = fn(q, k, v, bias, dropout_rng)
    return out[:, :t] if pad else out


def make_flax_attention_fn(mesh: Mesh, seq_axis: str = "seq"):
    """Adapter for ``flax.linen.MultiHeadDotProductAttention(
    attention_fn=...)``: runs ring attention over the mesh's seq axis,
    so a model's attention becomes sequence-parallel WITHOUT changing
    its parameter structure (used by FactModel when a CP mesh is given).
    Honors flax's bias/mask and attention-dropout arguments.
    """

    def attention_fn(query, key, value, bias=None, mask=None,
                     broadcast_dropout=True, dropout_rng=None,
                     dropout_rate=0.0, deterministic=False, **_ignored):
        rate = 0.0 if deterministic else dropout_rate
        return ring_attention(query, key, value, mesh,
                              seq_axis=seq_axis, bias=bias, mask=mask,
                              dropout_rate=rate, dropout_rng=dropout_rng,
                              broadcast_dropout=broadcast_dropout)

    return attention_fn


def full_attention_reference(q, k, v, bias=None, mask=None):
    """Unsharded oracle for tests: plain softmax attention, f32."""
    scale = 1.0 / (q.shape[-1] ** 0.5)
    s = jnp.einsum("bqhd,bkhd->bhqk", q.astype(jnp.float32),
                   k.astype(jnp.float32)) * scale
    if mask is not None:
        s = jnp.where(mask, s, NEG)
    if bias is not None:
        s = s + bias.astype(jnp.float32)
    p = jax.nn.softmax(s, axis=-1)
    out = jnp.einsum("bhqk,bkhd->bhqd", p, v.astype(jnp.float32))
    return out.transpose(0, 2, 1, 3).astype(q.dtype)


def shard_qkv(mesh: Mesh, x, seq_axis: str = "seq"):
    """Device-put a (B,T,H,D) array with T sharded over the seq axis.
    Tolerates T not divisible by the axis (replicates in that case —
    ring_attention re-pads internally)."""
    if x.shape[1] % mesh.shape[seq_axis]:
        return jax.device_put(x, NamedSharding(mesh, P()))
    return jax.device_put(
        x, NamedSharding(mesh, P(None, seq_axis, None, None)))
