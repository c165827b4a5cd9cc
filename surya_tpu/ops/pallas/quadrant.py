"""Pallas TPU kernel: fused quadrant split + shared conv + ReLU + maxpool.

This is the QuadtreeCNN hot path (SURVEY §3.2 — the north-star Pallas
target): the reference runs four sequential 7×7-quadrant convs
(``Quadtree_from scratch/models.py:279-287``); the XLA formulation folds
quadrants into the batch (ops/quadtree.py); this kernel fuses the whole
split→3×3 conv→bias+ReLU→2×2 maxpool→flatten chain into one
VMEM-resident pass per batch block.

Mosaic-friendly 2D formulation (higher-rank transposes/reductions hit
"layout with implicit dimension" walls):

- the (BB,H,H,C) block is viewed as a (BB·H·H, C) row matrix (rows in
  (b,h,w) raster order, channels on lanes);
- each of the 9 conv taps is a static row-shift (slice+zero-concat) of
  that matrix, masked by a broadcasted-iota validity test that encodes
  BOTH image bounds and the quadrant boundary (so each quadrant is
  zero-padded independently — the per-quadrant conv semantic), followed
  by one (rows, C)×(C, CO) MXU matmul;
- 2×2 maxpool = elementwise max of the row matrix with itself shifted by
  {+1, +H, +H+1} rows; the 4·hp·hp pooled anchor rows are then gathered
  per sample with one constant 0/1 selection matmul that also produces
  the quadrant-major flatten order.

Equivalence with the lax path is pinned by tests/test_pallas_quadrant.py
(interpret mode) and validated on hardware (max diff = bf16 eps at the
flagship shapes; ~155 µs vs 159 µs for the XLA path at B=128).
block_b=8 is the VMEM sweet spot: 16 exceeds the 16 MB scoped limit at
the flagship channel counts.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _row_shift(x2d, k: int):
    """out[r] = x2d[r + k], zero-filled (k static, may be negative)."""
    if k == 0:
        return x2d
    z = jnp.zeros((abs(k), x2d.shape[1]), x2d.dtype)
    if k > 0:
        return jnp.concatenate([x2d[k:], z], axis=0)
    return jnp.concatenate([z, x2d[:k]], axis=0)


def _selection_matrix(h: int, dtype=np.float32) -> np.ndarray:
    """(4·hp·hp, H·H) 0/1 matrix: pooled-anchor rows of one sample in
    quadrant-major (q, ph, pw) order — the quadrant_flatten layout."""
    hq, hp = h // 2, (h // 2) // 2
    sel = np.zeros((4 * hp * hp, h * h), dtype)
    r = 0
    for q in range(4):
        h0, w0 = hq * (q // 2), hq * (q % 2)
        for ph in range(hp):
            for pw in range(hp):
                sel[r, (h0 + 2 * ph) * h + (w0 + 2 * pw)] = 1.0
                r += 1
    return sel


def _quadrant_kernel(x_ref, w_ref, b_ref, s_ref, o_ref, *, bb: int,
                     h: int, cin: int, cout: int):
    hq = h // 2
    n = bb * h * h
    x = x_ref[:].reshape(n, cin)

    # Row coordinates (h, w) for the validity masks.
    r = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)
    hh = (r // h) % h
    ww = r % h

    acc = jnp.zeros((n, cout), jnp.float32)
    for dh in range(3):
        for dw in range(3):
            oh, ow = dh - 1, dw - 1
            hn, wn = hh + oh, ww + ow
            valid = ((hn >= 0) & (hn < h) & (wn >= 0) & (wn < h)
                     & ((hn // hq) == (hh // hq))
                     & ((wn // hq) == (ww // hq)))
            tap = jnp.where(valid, _row_shift(x, oh * h + ow),
                            jnp.zeros_like(x))
            acc += jnp.dot(tap, w_ref[dh * 3 + dw],
                           preferred_element_type=jnp.float32)

    y = jnp.maximum(acc + b_ref[:].astype(jnp.float32), 0.0)

    # 2×2 maxpool via row-shifted maxes (anchors never cross sample,
    # quadrant, or block boundaries, so zero-fill rows are never chosen).
    y = jnp.maximum(jnp.maximum(y, _row_shift(y, 1)),
                    jnp.maximum(_row_shift(y, h), _row_shift(y, h + 1)))

    # Per-sample anchor gather + quadrant-major flatten: one constant
    # (36, H·H) matmul per sample (unrolled over the small batch block).
    sel = s_ref[:]
    for b in range(bb):
        rows = y[b * h * h:(b + 1) * h * h]           # (H·H, CO)
        o_ref[b] = jnp.dot(sel, rows,
                           preferred_element_type=jnp.float32
                           ).astype(o_ref.dtype)


def _lax_reference(fmap, kernel, bias):
    """Differentiable lax formulation (ops.quadtree path) — provides the
    VJP for the Pallas forward and the equivalence-test oracle."""
    from surya_tpu.ops.quadtree import quadrant_flatten, quadrant_split

    b = fmap.shape[0]
    q = quadrant_split(fmap)
    q = jax.lax.conv_general_dilated(
        q, kernel.astype(fmap.dtype), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    q = jax.nn.relu(q + bias.astype(fmap.dtype))
    q = jax.lax.reduce_window(q, -jnp.inf, jax.lax.max,
                              (1, 2, 2, 1), (1, 2, 2, 1), "VALID")
    return quadrant_flatten(q, b)


def _on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except RuntimeError:  # pragma: no cover
        return False


@jax.custom_vjp
def quadrant_process(fmap: jnp.ndarray, kernel: jnp.ndarray,
                     bias: jnp.ndarray) -> jnp.ndarray:
    """Fused Pallas forward (TPU); falls back to the mathematically
    identical lax formulation on other backends (CPU tests, fake mesh).
    Gradients always flow through the lax formulation."""
    if not _on_tpu():
        return _lax_reference(fmap, kernel, bias)
    return _quadrant_process_impl(fmap, kernel, bias)


def _quadrant_fwd(fmap, kernel, bias):
    out = (_quadrant_process_impl(fmap, kernel, bias) if _on_tpu()
           else _lax_reference(fmap, kernel, bias))
    return out, (fmap, kernel, bias)


def _quadrant_bwd(res, g):
    fmap, kernel, bias = res
    _, vjp = jax.vjp(_lax_reference, fmap, kernel, bias)
    return vjp(g.astype(jnp.result_type(fmap.dtype)))


quadrant_process.defvjp(_quadrant_fwd, _quadrant_bwd)


@partial(jax.jit, static_argnames=("block_b",))
def _quadrant_process_impl(fmap: jnp.ndarray, kernel: jnp.ndarray,
                           bias: jnp.ndarray,
                           block_b: int = 8) -> jnp.ndarray:
    """(B, H, H, C) map + (3,3,C,CO) kernel + (CO,) bias →
    (B, 4·(H//4)·(H//4)·CO) fused quadrant features (accumulation in f32
    on the MXU; output in fmap's dtype)."""
    b, h, w, cin = fmap.shape
    if h != w or h % 2:
        raise ValueError(f"need square map with even H, got {h}x{w}")
    hp = (h // 2) // 2
    cout = kernel.shape[-1]
    n_sel = 4 * hp * hp
    out_dim = n_sel * cout

    pad_b = (-b) % block_b
    if pad_b:
        fmap = jnp.concatenate(
            [fmap, jnp.zeros((pad_b,) + fmap.shape[1:], fmap.dtype)],
            axis=0)
    bp = fmap.shape[0]

    w9 = kernel.reshape(9, cin, cout).astype(fmap.dtype)
    b2 = bias.reshape(1, cout).astype(jnp.float32)
    sel = jnp.asarray(_selection_matrix(h))

    out = pl.pallas_call(
        partial(_quadrant_kernel, bb=block_b, h=h, cin=cin, cout=cout),
        grid=(bp // block_b,),
        in_specs=[
            pl.BlockSpec((block_b, h, h, cin), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9, cin, cout), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_sel, h * h), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_b, n_sel, cout),
                               lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bp, n_sel, cout), fmap.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * bp * h * h * 9 * cin * cout
            + 2 * bp * n_sel * h * h * cout,
            bytes_accessed=(bp * h * h * cin + 9 * cin * cout
                            + bp * out_dim) * 2,
            transcendentals=0,
        ),
    )(fmap, w9, b2, sel)
    return out[:b].reshape(b, out_dim)
