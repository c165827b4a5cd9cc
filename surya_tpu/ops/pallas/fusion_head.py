"""Pallas TPU kernel: fused fusion-classifier head (train-capable).

The second Pallas target from the BASELINE north star ("quadrant-gather
+ fusion MLP"): the QuadtreeCNN head computes
``Dense(in→hidden) → ReLU → Dropout → Dense(hidden→classes)`` on the
fused (B, 5376) feature vector (``Quadtree_from scratch/
models.py:266-271``). XLA runs this as two matmuls with an HBM
round-trip of the (B, 2688) hidden activations; this kernel keeps the
hidden activations in VMEM: one grid step runs fc1 + bias + ReLU +
dropout + fc2 without touching HBM in between.

Dropout runs IN-KERNEL via the TPU hardware PRNG (``pltpu.prng_seed`` +
``prng_random_bits``), seeded per batch block, so the train path is
fully fused too. The backward saves the post-dropout hidden activation
``h`` as its residual: because ``h > 0`` iff (pre-activation > 0 AND the
unit was kept), the single gate ``(h > 0) * 1/(1-rate)`` is exactly the
combined ReLU+dropout derivative — no mask needs to be stored and no
forward work is recomputed. The backward itself is three plain XLA
matmuls (the inherent ones).

On non-TPU backends the op falls back to a lax formulation using
``jax.random`` dropout — the same distribution, a different stream than
the TPU hardware PRNG (documented; dropout masks are never
checkpoint-relevant).

Wired into ``models.common.FusionClassifier`` behind ``use_pallas``;
equivalence pinned by tests/test_pallas_fusion_head.py.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from surya_tpu.ops.pallas import on_tpu


def _dropout_threshold(rate: float) -> int:
    """uint32 threshold t: keep iff bits >= t, so P(drop) = rate."""
    return min(int(round(rate * 2 ** 32)), 2 ** 32 - 1)


def _fusion_head_kernel(seed_ref, x_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                        o_ref, h_ref=None, *, rate: float):
    """h_ref is None on the pure-inference path — no backward will read
    the activations, so skip the (B, hidden) HBM write entirely."""
    x = x_ref[:]
    h = jnp.dot(x, w1_ref[:], preferred_element_type=jnp.float32)
    h = jnp.maximum(h + b1_ref[:].astype(jnp.float32), 0.0)
    if rate > 0.0:
        pltpu.prng_seed(seed_ref[0, 0] + pl.program_id(0))
        bits = pltpu.prng_random_bits(h.shape).astype(jnp.uint32)
        keep = bits >= jnp.uint32(_dropout_threshold(rate))
        h = jnp.where(keep, h * (1.0 / (1.0 - rate)), 0.0)
    if h_ref is not None:
        h_ref[:] = h.astype(h_ref.dtype)
    out = jnp.dot(h.astype(x.dtype), w2_ref[:],
                  preferred_element_type=jnp.float32)
    o_ref[:] = out + b2_ref[:].astype(jnp.float32)


def _lax_forward(x, w1, b1, w2, b2, seed, rate: float):
    """Non-TPU fallback: same math, jax.random dropout stream."""
    h = jax.nn.relu(x @ w1.astype(x.dtype) + b1.astype(x.dtype))
    h = h.astype(jnp.float32)
    if rate > 0.0:
        key = jax.random.fold_in(jax.random.key(0), seed[0, 0])
        keep = jax.random.bernoulli(key, 1.0 - rate, h.shape)
        h = jnp.where(keep, h / (1.0 - rate), 0.0)
    h = h.astype(x.dtype)
    out = (h @ w2.astype(x.dtype)).astype(jnp.float32) + b2.astype(
        jnp.float32)
    return out, h


def _lax_reference(x, w1, b1, w2, b2):
    """Deterministic (no-dropout) oracle for the equivalence tests."""
    h = jax.nn.relu(x @ w1.astype(x.dtype) + b1.astype(x.dtype))
    return (h @ w2.astype(x.dtype)
            + b2.astype(x.dtype)).astype(jnp.float32)


@partial(jax.jit, static_argnames=("rate", "block_b", "with_act"))
def _fusion_head_impl(x, w1, b1, w2, b2, seed, rate: float = 0.0,
                      block_b: int = 128, with_act: bool = True):
    """Returns (logits_f32 (B, C), h (B, hidden) in x.dtype) — or
    (logits, None) when ``with_act=False`` (inference: the hidden
    activations stay in VMEM, no HBM write)."""
    b, d_in = x.shape
    hidden = w1.shape[1]
    classes = w2.shape[1]
    pad_b = (-b) % block_b
    if pad_b:
        x = jnp.concatenate(
            [x, jnp.zeros((pad_b, d_in), x.dtype)], axis=0)
    bp = x.shape[0]
    # pad the tiny class dim to the 128-lane tile
    pad_c = (-classes) % 128
    if pad_c:
        w2 = jnp.concatenate(
            [w2, jnp.zeros((hidden, pad_c), w2.dtype)], axis=1)
        b2 = jnp.concatenate([b2, jnp.zeros((pad_c,), b2.dtype)])
    cp = classes + pad_c

    act_out_specs = [pl.BlockSpec((block_b, hidden), lambda i: (i, 0),
                                  memory_space=pltpu.VMEM)]
    act_out_shape = [jax.ShapeDtypeStruct((bp, hidden), x.dtype)]
    res = pl.pallas_call(
        partial(_fusion_head_kernel, rate=rate),
        grid=(bp // block_b,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((block_b, d_in), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d_in, hidden), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hidden), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hidden, cp), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cp), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((block_b, cp), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ] + (act_out_specs if with_act else []),
        out_shape=[
            jax.ShapeDtypeStruct((bp, cp), jnp.float32),
        ] + (act_out_shape if with_act else []),
        cost_estimate=pl.CostEstimate(
            flops=2 * bp * hidden * (d_in + cp),
            bytes_accessed=2 * (bp * d_in + d_in * hidden
                                + hidden * cp + bp * cp
                                + (bp * hidden if with_act else 0)),
            transcendentals=0,
        ),
    )(seed, x, w1.astype(x.dtype), b1.reshape(1, hidden),
      w2.astype(x.dtype), b2.reshape(1, cp))
    if with_act:
        out, h = res
        return out[:b, :classes], h[:b]
    return res[0][:b, :classes], None


def fusion_head(x, w1, b1, w2, b2, *, rate: float = 0.0, seed=None):
    """(B, D) @ (D, H) + b1 → ReLU → dropout(rate) → @ (H, C) + b2,
    VMEM-fused on TPU (in-kernel hardware-PRNG dropout); lax fallback
    elsewhere. ``seed``: int32 scalar array (required when rate > 0)."""
    if seed is None:
        if rate > 0.0:
            raise ValueError("fusion_head: rate > 0 requires a seed")
        seed = jnp.zeros((1, 1), jnp.int32)
    else:
        seed = jnp.asarray(seed, jnp.int32).reshape(1, 1)
    return _fusion_head_vjp(float(rate), x, w1, b1, w2, b2, seed)


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def _fusion_head_vjp(rate, x, w1, b1, w2, b2, seed):
    if not on_tpu():
        return _lax_forward(x, w1, b1, w2, b2, seed, rate)[0]
    # inference primal: no backward will consume h — skip its HBM write
    return _fusion_head_impl(x, w1, b1, w2, b2, seed, rate=rate,
                             with_act=False)[0]


def _fwd(rate, x, w1, b1, w2, b2, seed):
    if on_tpu():
        out, h = _fusion_head_impl(x, w1, b1, w2, b2, seed, rate=rate)
    else:
        out, h = _lax_forward(x, w1, b1, w2, b2, seed, rate)
    # zero-size dtype carriers: bias cotangents must match the PRIMAL
    # bias dtypes, not the kernels' (they can differ in mixed imports)
    return out, (x, w1, w2, h, jnp.zeros((0,), b1.dtype),
                 jnp.zeros((0,), b2.dtype))


def _bwd(rate, res, g):
    x, w1, w2, h, b1_proto, b2_proto = res
    scale = 1.0 / (1.0 - rate) if rate > 0.0 else 1.0
    g16 = g.astype(x.dtype)
    # fc2 backward
    g_w2 = jnp.einsum("bh,bc->hc", h, g16,
                      preferred_element_type=jnp.float32).astype(w2.dtype)
    g_b2 = jnp.sum(g, axis=0)
    g_h = g16 @ w2.astype(x.dtype).T
    # combined ReLU+dropout gate: h>0 iff (pre>0 and kept); dh/dpre=scale
    g_pre = jnp.where(h > 0, g_h * jnp.asarray(scale, g_h.dtype),
                      jnp.zeros_like(g_h))
    # fc1 backward
    g_w1 = jnp.einsum("bd,bh->dh", x, g_pre,
                      preferred_element_type=jnp.float32).astype(w1.dtype)
    g_b1 = jnp.sum(g_pre.astype(jnp.float32), axis=0)
    g_x = g_pre @ w1.astype(x.dtype).T
    return (g_x.astype(x.dtype), g_w1, g_b1.astype(b1_proto.dtype),
            g_w2, g_b2.astype(b2_proto.dtype),
            jnp.zeros((1, 1), jnp.int32))


_fusion_head_vjp.defvjp(_fwd, _bwd)
