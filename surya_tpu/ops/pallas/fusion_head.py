"""Pallas TPU kernel: fused fusion-classifier head.

The second Pallas target from the BASELINE north star ("quadrant-gather
+ fusion MLP"): the QuadtreeCNN head computes
``Dense(in→hidden) → ReLU → Dense(hidden→classes)`` on the fused
(B, 5376) feature vector (``Quadtree_from scratch/models.py:266-271``).
XLA runs this as two matmuls with an HBM round-trip of the (B, 2688)
hidden activations; this kernel keeps the hidden activations in VMEM:
one grid step processes a batch block through both matmuls + bias +
ReLU without touching HBM in between.

Dropout is a no-op at inference; at train time the wrapper is used with
dropout handled outside (the reference applies dropout between ReLU and
fc2 — the training path keeps the lax formulation, which also provides
this kernel's VJP).

Equivalence pinned by tests/test_pallas_fusion_head.py.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _fusion_head_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref):
    x = x_ref[:]
    h = jnp.dot(x, w1_ref[:], preferred_element_type=jnp.float32)
    h = jnp.maximum(h + b1_ref[:].astype(jnp.float32), 0.0)
    out = jnp.dot(h.astype(x.dtype), w2_ref[:],
                  preferred_element_type=jnp.float32)
    o_ref[:] = out + b2_ref[:].astype(jnp.float32)


def _lax_reference(x, w1, b1, w2, b2):
    h = jax.nn.relu(x @ w1.astype(x.dtype) + b1.astype(x.dtype))
    return (h @ w2.astype(x.dtype)
            + b2.astype(x.dtype)).astype(jnp.float32)


def _on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except RuntimeError:  # pragma: no cover
        return False


@partial(jax.jit, static_argnames=("block_b",))
def _fusion_head_impl(x, w1, b1, w2, b2, block_b: int = 128):
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

    out = pl.pallas_call(
        _fusion_head_kernel,
        grid=(bp // block_b,),
        in_specs=[
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
        out_specs=pl.BlockSpec((block_b, cp), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bp, cp), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * bp * hidden * (d_in + cp),
            bytes_accessed=2 * (bp * d_in + d_in * hidden
                                + hidden * cp + bp * cp),
            transcendentals=0,
        ),
    )(x, w1.astype(x.dtype), b1.reshape(1, hidden),
      w2.astype(x.dtype), b2.reshape(1, cp))
    return out[:b, :classes]


@jax.custom_vjp
def fusion_head(x, w1, b1, w2, b2):
    """(B, D) @ (D, H) + b1 → ReLU → @ (H, C) + b2, VMEM-fused on TPU;
    lax fallback elsewhere. Gradients via the lax formulation."""
    if not _on_tpu():
        return _lax_reference(x, w1, b1, w2, b2)
    return _fusion_head_impl(x, w1, b1, w2, b2)


def _fwd(x, w1, b1, w2, b2):
    return fusion_head(x, w1, b1, w2, b2), (x, w1, b1, w2, b2)


def _bwd(res, g):
    _, vjp = jax.vjp(_lax_reference, *res)
    return vjp(g)


fusion_head.defvjp(_fwd, _bwd)
