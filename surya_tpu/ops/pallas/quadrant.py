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
(interpret mode) and on hardware by scripts/tpu_kernel_checks.py (fwd
and grads to 1e-7 relL2 at f32/HIGHEST; in bf16 the two independently
rounded forwards flip ReLU/pool masks at near-ties → few-percent grad
L2 noise, inherent, documented there). block_b: 8 is the fwd-only VMEM
sweet spot; the training path emits the pre-pool activation residual
(+2·bb·H·H·CO scoped bytes) and uses 4 to stay under the 16 MB scoped
limit at flagship shapes (BS 256 OOMs at 8).

Measured end-to-end vs the lax path (BENCH_NOTES.md, BS 256, v5e):
lax wins — train 8,135 vs 7,503 img/s, infer 27,545 vs 25,810 — so
``ModelConfig.use_pallas`` defaults False; this kernel remains the
native-tier option for shapes XLA schedules poorly.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from surya_tpu.ops.pallas import on_tpu


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


def _quadrant_kernel(x_ref, w_ref, b_ref, s_ref, o_ref, a_ref=None, *,
                     bb: int, h: int, cin: int, cout: int):
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

    # Post-ReLU pre-pool activation in full-map layout — the backward
    # residual (pool-vjp + ReLU mask), so the VJP never re-runs the conv.
    # Elided on the pure-inference path (a_ref=None → no extra HBM write).
    if a_ref is not None:
        a_ref[:] = y.reshape(bb, h, h, cout).astype(a_ref.dtype)

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


def _conv(q, kernel):
    return jax.lax.conv_general_dilated(
        q, kernel, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _pool_flatten(act, b):
    from surya_tpu.ops.quadtree import quadrant_flatten

    p = jax.lax.reduce_window(act, -jnp.inf, jax.lax.max,
                              (1, 2, 2, 1), (1, 2, 2, 1), "VALID")
    return quadrant_flatten(p, b)


def _lax_forward(fmap, kernel, bias):
    """Differentiable lax formulation (ops.quadtree path) — the non-TPU
    fallback and the equivalence-test oracle. Returns (out, act) where
    act is the post-ReLU pre-pool activation (the backward residual)."""
    from surya_tpu.ops.quadtree import quadrant_split

    b = fmap.shape[0]
    q = quadrant_split(fmap)
    act = jax.nn.relu(_conv(q, kernel.astype(fmap.dtype))
                      + bias.astype(fmap.dtype))
    return _pool_flatten(act, b), act


def _lax_reference(fmap, kernel, bias):
    return _lax_forward(fmap, kernel, bias)[0]


@jax.custom_vjp
def quadrant_process(fmap: jnp.ndarray, kernel: jnp.ndarray,
                     bias: jnp.ndarray) -> jnp.ndarray:
    """Fused Pallas forward (TPU); falls back to the mathematically
    identical lax formulation on other backends (CPU tests, fake mesh).
    The backward consumes the saved pre-pool activation — pool-vjp +
    ReLU mask + the two transposed convs — so the forward conv is never
    recomputed (round-1 issue: the old VJP re-ran the whole lax forward)."""
    if not on_tpu():
        return _lax_reference(fmap, kernel, bias)
    return _quadrant_process_impl(fmap, kernel, bias)


def _quadrant_fwd(fmap, kernel, bias):
    if on_tpu():
        from surya_tpu.ops.quadtree import quadrant_split

        out, act_full = _quadrant_process_impl(fmap, kernel, bias,
                                               with_act=True)
        act = quadrant_split(act_full)      # (4B, hq, hq, CO)
    else:
        out, act = _lax_forward(fmap, kernel, bias)
    return out, (fmap, kernel, bias, act)


def _quadrant_bwd(res, g):
    fmap, kernel, bias, act = res
    b = fmap.shape[0]
    from surya_tpu.ops.quadtree import quadrant_merge, quadrant_split

    # Maxpool + flatten VJP (elementwise re-run of the pool, no conv).
    _, pool_vjp = jax.vjp(lambda a: _pool_flatten(a, b), act)
    g_act, = pool_vjp(g.astype(act.dtype))
    g_pre = jnp.where(act > 0, g_act, jnp.zeros_like(g_act))

    # The two inherent backward convs, via linear transposition (conv is
    # bilinear, so neither transpose needs the primal output).
    quads = quadrant_split(fmap)
    kd = kernel.astype(fmap.dtype)
    g_quads, = jax.linear_transpose(lambda q: _conv(q, kd), quads)(g_pre)
    g_kernel, = jax.linear_transpose(lambda k: _conv(quads, k), kd)(g_pre)
    g_bias = jnp.sum(g_pre.astype(jnp.float32), axis=(0, 1, 2))
    return (quadrant_merge(g_quads, b).astype(fmap.dtype),
            g_kernel.astype(kernel.dtype), g_bias.astype(bias.dtype))


quadrant_process.defvjp(_quadrant_fwd, _quadrant_bwd)


@partial(jax.jit, static_argnames=("block_b", "with_act"))
def _quadrant_process_impl(fmap: jnp.ndarray, kernel: jnp.ndarray,
                           bias: jnp.ndarray,
                           block_b: int | None = None,
                           with_act: bool = False):
    """(B, H, H, C) map + (3,3,C,CO) kernel + (CO,) bias →
    (B, 4·(H//4)·(H//4)·CO) fused quadrant features (accumulation in f32
    on the MXU; output in fmap's dtype). ``with_act=True`` additionally
    returns the post-ReLU pre-pool activation (B, H, H, CO) in full-map
    layout — the training-path backward residual."""
    b, h, w, cin = fmap.shape
    if h != w or h % 2:
        raise ValueError(f"need square map with even H, got {h}x{w}")
    if block_b is None:
        # 8 is the VMEM sweet spot for the fwd-only kernel; the act
        # output (training residual) adds ~2×(bb·H·H·CO) to the scoped
        # budget and OOMs at 8 with flagship shapes — use 4 there.
        block_b = 4 if with_act else 8
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

    out_specs = [pl.BlockSpec((block_b, n_sel, cout), lambda i: (i, 0, 0),
                              memory_space=pltpu.VMEM)]
    out_shape = [jax.ShapeDtypeStruct((bp, n_sel, cout), fmap.dtype)]
    if with_act:
        out_specs.append(pl.BlockSpec((block_b, h, h, cout),
                                      lambda i: (i, 0, 0, 0),
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((bp, h, h, cout), fmap.dtype))

    res = pl.pallas_call(
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
        out_specs=out_specs,
        out_shape=out_shape,
        cost_estimate=pl.CostEstimate(
            flops=2 * bp * h * h * 9 * cin * cout
            + 2 * bp * n_sel * h * h * cout,
            bytes_accessed=(bp * h * h * cin + 9 * cin * cout
                            + bp * out_dim
                            + (bp * h * h * cout if with_act else 0)) * 2,
            transcendentals=0,
        ),
    )(fmap, w9, b2, sel)
    out = res[0][:b].reshape(b, out_dim)
    if with_act:
        return out, res[1][:b]
    return out
