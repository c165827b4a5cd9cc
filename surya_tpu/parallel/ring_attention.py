"""Ring attention: sequence/context parallelism over the ('seq',) mesh axis.

The reference has no sequence parallelism (max 2T+1 = 9 fusion tokens,
``VIT/fact_model.py:86``), so this is the framework's demonstrated CP
capability per SURVEY §5.7: the FACT-style fusion attention written over
a ('data','seq') mesh with shard_map — each device holds a T/n slice of
Q/K/V; K/V blocks rotate around the ring via ``jax.lax.ppermute`` while
a flash-style online-softmax accumulator keeps the numerics exact. The
result is bit-comparable (up to fp reassociation) with full attention,
at O(T/n) activation memory per device and compute/comm overlap on ICI.

Layout: (B, T, H, D) with T sharded over 'seq'. Bidirectional (encoder)
attention — matching the reference's fusion transformer; no causal mask.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:  # jax ≥ 0.6 exposes shard_map at top level
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map


def _ring_attention_local(q, k, v, axis_name: str, axis_size: int,
                          scale: float):
    """Per-device body: local Q attends to every K/V block as the blocks
    rotate around the ring. Online-softmax accumulation in float32."""
    qf = q.astype(jnp.float32)
    b, tq, h, d = qf.shape

    m = jnp.full((b, h, tq), -jnp.inf, jnp.float32)       # running max
    l = jnp.zeros((b, h, tq), jnp.float32)                # running denom
    acc = jnp.zeros((b, h, tq, d), jnp.float32)

    perm = [(i, (i + 1) % axis_size) for i in range(axis_size)]
    for _ in range(axis_size):
        kf = k.astype(jnp.float32)
        vf = v.astype(jnp.float32)
        # scores: (B, H, Tq, Tk)
        s = jnp.einsum("bqhd,bkhd->bhqk", qf, kf) * scale
        m_new = jnp.maximum(m, s.max(axis=-1))
        p = jnp.exp(s - m_new[..., None])
        corr = jnp.exp(m - m_new)
        l = l * corr + p.sum(axis=-1)
        acc = acc * corr[..., None] + jnp.einsum("bhqk,bkhd->bhqd", p, vf)
        m = m_new
        # rotate K/V to the next device (overlaps with the next step's
        # compute under XLA's async collective scheduling)
        k = jax.lax.ppermute(k, axis_name, perm)
        v = jax.lax.ppermute(v, axis_name, perm)

    out = acc / l[..., None]
    return out.transpose(0, 2, 1, 3).astype(q.dtype)      # (B, Tq, H, D)


def ring_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                   mesh: Mesh, seq_axis: str = "seq") -> jnp.ndarray:
    """(B, T, H, D) q/k/v with T sharded over ``seq_axis`` → attention
    output, same sharding. Works for axis size 1 (degenerates to plain
    attention)."""
    axis_size = mesh.shape[seq_axis]
    scale = 1.0 / (q.shape[-1] ** 0.5)

    spec = P(None, seq_axis, None, None)
    fn = shard_map(
        partial(_ring_attention_local, axis_name=seq_axis,
                axis_size=axis_size, scale=scale),
        mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
        check_vma=False)
    return fn(q, k, v)


def make_flax_attention_fn(mesh: Mesh, seq_axis: str = "seq"):
    """Adapter for ``flax.linen.MultiHeadDotProductAttention(
    attention_fn=...)``: runs ring attention over the mesh's seq axis,
    so a model's attention becomes sequence-parallel WITHOUT changing
    its parameter structure (used by FactModel when a CP mesh is given).

    Attention-weight dropout is not applied on the ring path (output
    dropout still is) — documented CP simplification.
    """

    def attention_fn(query, key, value, bias=None, mask=None,
                     **_ignored):
        if bias is not None or mask is not None:
            raise NotImplementedError(
                "ring attention path supports bias/mask-free "
                "(bidirectional encoder) attention")
        return ring_attention(query, key, value, mesh,
                              seq_axis=seq_axis)

    return attention_fn


def full_attention_reference(q, k, v):
    """Unsharded oracle for tests: plain softmax attention, f32."""
    scale = 1.0 / (q.shape[-1] ** 0.5)
    s = jnp.einsum("bqhd,bkhd->bhqk", q.astype(jnp.float32),
                   k.astype(jnp.float32)) * scale
    p = jax.nn.softmax(s, axis=-1)
    out = jnp.einsum("bhqk,bkhd->bhqd", p, v.astype(jnp.float32))
    return out.transpose(0, 2, 1, 3).astype(q.dtype)


def shard_qkv(mesh: Mesh, x, seq_axis: str = "seq"):
    """Device-put a (B,T,H,D) array with T sharded over the seq axis."""
    return jax.device_put(
        x, NamedSharding(mesh, P(None, seq_axis, None, None)))
