"""Pallas TPU kernels: fused train-mode BatchNorm statistics + ReLU
normalize for the ResNet stem map (round-3 VERDICT item 5).

Round-2 profiling (BENCH_NOTES "Where the train step time goes") put the
stem at ≈9% MFU, bound by the BN passes over the (B,112,112,64) conv
output, and the maxpool study measured XLA's *elementwise* codegen on
maps of this class at 4-10× below HBM roofline. The conv itself is left
to XLA (it schedules convs well — layers2-4 at ~58% MFU); these kernels
replace only the HBM-bound BN train forward:

- ``K1 (stats)``: one roofline read pass producing per-channel
  Σx / Σx² partials, accumulated in an f32 VMEM scratch across the
  sequential grid (written once at the last step);
- ``K2 (affine+ReLU)``: one read+write pass computing
  ``relu(x·a + b)`` with the BN affine pre-folded into (a, b) on host
  side of the graph (a = γ/√(σ²+ε), b = β − μ·a) — a single FMA per
  element in f32 (bf16 compute hits the "Invalid relayout …i1" compare
  wall; see CLAUDE.md).

Mosaic-friendly layout: the NHWC map is viewed as an (N, C) row matrix
and lane-packed to (N/2, 2C) so C=64 fills the 128 lanes; channel
partials fold their two lane-halves in XLA (tiny). Bodies are 2D
throughout.

Equivalence with flax BN(train)+ReLU is pinned by
tests/test_pallas_stem_bn.py (interpret mode) and on hardware by
scripts/tpu_stem_fusion_probe.py, which also records the A/B timing
that decides whether this path ships (BENCH_NOTES).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# rows per grid step for the packed (N/2, 128) view; 4096×128 bf16 =
# 1 MB block — safely inside scoped VMEM with double buffering
_BLOCK_ROWS = 4096


def _pad_rows(x2, block):
    """Zero-pad rows to a block multiple (zeros are stats-neutral; the
    affine pass slices the pad back off)."""
    n2 = x2.shape[0]
    rem = n2 % block
    if rem == 0:
        return x2, n2
    pad = block - rem
    return jnp.pad(x2, ((0, pad), (0, 0))), n2


def _stats_kernel(x_ref, o_ref, acc_ref):
    """Accumulate per-lane Σx and Σx² (f32) across the sequential grid."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    x = x_ref[...].astype(jnp.float32)
    acc_ref[0, :] += jnp.sum(x, axis=0)
    acc_ref[1, :] += jnp.sum(x * x, axis=0)

    @pl.when(i == pl.num_programs(0) - 1)
    def _write():
        o_ref[...] = acc_ref[...]


def _affine_relu_kernel(x_ref, a_ref, b_ref, o_ref):
    """o = relu(x·a + b), f32 compute, per-lane (1, 128) a/b."""
    x = x_ref[...].astype(jnp.float32)
    y = x * a_ref[...].astype(jnp.float32) + b_ref[...].astype(
        jnp.float32)
    o_ref[...] = jnp.maximum(y, 0.0).astype(o_ref.dtype)


def _packed_view(x):
    """NHWC (B,H,W,C) → (N/2, 2C) lane-packed rows (C=64 → 128 lanes)."""
    b, h, w, c = x.shape
    n = b * h * w
    if (n % 2) or (2 * c) % 128:
        raise ValueError(f"unsupported shape {x.shape}")
    return x.reshape(n // 2, 2 * c)


def channel_stats(x):
    """Per-channel (Σx, Σx²) of an NHWC map via the K1 pass.

    Returns two (C,) f32 vectors.
    """
    c = x.shape[-1]
    x2, _ = _pad_rows(_packed_view(x), _BLOCK_ROWS)
    grid = x2.shape[0] // _BLOCK_ROWS
    out = pl.pallas_call(
        _stats_kernel,
        grid=(grid,),
        in_specs=[pl.BlockSpec((_BLOCK_ROWS, 2 * c),
                               lambda i: (i, 0))],
        out_specs=pl.BlockSpec((2, 2 * c), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((2, 2 * c), jnp.float32),
        scratch_shapes=[pltpu.VMEM((2, 2 * c), jnp.float32)],
    )(x2)
    sums = out[0, :c] + out[0, c:]
    sumsq = out[1, :c] + out[1, c:]
    return sums, sumsq


def affine_relu(x, a, b):
    """relu(x·a + b) with per-channel (C,) a/b via the K2 pass."""
    c = x.shape[-1]
    x2, n2 = _pad_rows(_packed_view(x), _BLOCK_ROWS)
    a2 = jnp.tile(a.astype(jnp.float32), 2).reshape(1, 2 * c)
    b2 = jnp.tile(b.astype(jnp.float32), 2).reshape(1, 2 * c)
    grid = x2.shape[0] // _BLOCK_ROWS
    y = pl.pallas_call(
        _affine_relu_kernel,
        grid=(grid,),
        in_specs=[pl.BlockSpec((_BLOCK_ROWS, 2 * c), lambda i: (i, 0)),
                  pl.BlockSpec((1, 2 * c), lambda i: (0, 0)),
                  pl.BlockSpec((1, 2 * c), lambda i: (0, 0))],
        out_specs=pl.BlockSpec((_BLOCK_ROWS, 2 * c), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct(x2.shape, x.dtype),
    )(x2, a2, b2)
    return y[:n2].reshape(x.shape)


def fused_bn_relu_train(x, scale, bias, eps: float = 1e-5):
    """Train-mode BN + ReLU on an NHWC map via K1 + K2.

    Returns (y, batch_mean, batch_var) — biased variance, exactly what
    flax BN normalizes with in train mode; the running-stats momentum
    update stays in XLA (a (C,)-sized op). Forward-only: wrap in
    ``jax.custom_vjp`` against the XLA backward if it ever ships on the
    training path (the A/B probe measures forward cost only).
    """
    n = x.shape[0] * x.shape[1] * x.shape[2]
    sums, sumsq = channel_stats(x)
    mean = sums / n
    var = jnp.maximum(sumsq / n - mean * mean, 0.0)
    inv = scale.astype(jnp.float32) * jax.lax.rsqrt(var + eps)
    a = inv
    b = bias.astype(jnp.float32) - mean * inv
    return affine_relu(x, a, b), mean, var


def reference_bn_relu_train(x, scale, bias, eps: float = 1e-5):
    """Pure-XLA oracle with identical math (for tests and the A/B)."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=(0, 1, 2))
    var = jnp.mean(xf * xf, axis=(0, 1, 2)) - mean * mean
    inv = scale.astype(jnp.float32) * jax.lax.rsqrt(var + eps)
    y = jnp.maximum(xf * inv + (bias.astype(jnp.float32) - mean * inv),
                    0.0)
    return y.astype(x.dtype), mean, var
