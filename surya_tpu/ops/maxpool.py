"""Max pooling VJP reference — exact SelectAndScatter semantics.

XLA lowers the gradient of ``reduce_window(max)`` to
``SelectAndScatter``, which looks slow on TPU in isolation:
micro-profiled at BS 256 on the stem's 112x112x64 map (v5e), maxpool
fwd+grad runs at 24.0k img/s while avgpool fwd+grad on the SAME map
runs at 54.0k — the select/scatter backward alone costs ~7 ms/step,
~20% of the flagship's whole train step (scripts/tpu_stem_profile.py).

Six alternative formulations were built and measured against it
(BENCH_NOTES.md "Negative result: maxpool backward"): three XLA-level
rewrites (strided slice+interior-pad, contiguous blocked views,
packed value+index argmax routing) and three Pallas kernels (hit-mask,
streaming claims, offsets-on-grid). All verified bit-exact; all ran
SLOWER than SelectAndScatter on this toolchain — XLA's elementwise
codegen runs far below roofline on these maps and Mosaic's scoped-VMEM
stack allocator does not reuse slots across ops, capping kernel size.
The models therefore keep ``flax.linen.max_pool`` (its S&S backward is
the measured optimum), and this module stays as:

- the executable SPECIFICATION of max-pool gradient semantics: the
  running ``claimed`` mask reproduces SelectAndScatter's exact
  first-match-in-row-major-window-order tie rule (same rule as torch's
  MaxPool2d backward — ``Quadtree_from scratch/models.py`` pools via
  nn.MaxPool2d), which tests/test_ops_maxpool.py pins bit-for-bit,
  ties included, in 2-D and 3-D;
- the starting point if a later toolchain fixes either blocker.

Forward is plain ``reduce_window(max)`` (bit-equal to flax max_pool);
backward is slice/compare/pad arithmetic:

  for each window offset (in row-major order over the window):
      x_sub   = strided slice of (-inf padded) x at that offset
      winner  = (x_sub == y) & not claimed-by-an-earlier-offset
      grad_x += interior-padded (winner * g)
"""

from __future__ import annotations

import itertools
from functools import partial
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import lax

PadSeq = Tuple[Tuple[int, int], ...]


def _canon(window, strides, padding):
    window = tuple(int(k) for k in window)
    strides = tuple(int(s) for s in strides)
    padding = tuple((int(lo), int(hi)) for lo, hi in padding)
    if not len(window) == len(strides) == len(padding):
        raise ValueError("window/strides/padding rank mismatch")
    return window, strides, padding


def _reduce_max(x, window, strides, padding):
    init = (-jnp.inf if jnp.issubdtype(x.dtype, jnp.floating)
            else jnp.iinfo(x.dtype).min)
    return lax.reduce_window(
        x, init, lax.max,
        (1, *window, 1), (1, *strides, 1),
        ((0, 0), *padding, (0, 0)))


@partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def max_pool(x: jnp.ndarray, window: Sequence[int] = (2, 2),
             strides: Sequence[int] = (2, 2),
             padding: PadSeq = ((0, 0), (0, 0))) -> jnp.ndarray:
    """(B, *spatial, C) max pool, forward-identical to flax max_pool."""
    window, strides, padding = _canon(window, strides, padding)
    return _reduce_max(x, window, strides, padding)


def _fwd(x, window, strides, padding):
    y = max_pool(x, window, strides, padding)
    return y, (x, y)


def _bwd(window, strides, padding, res, g):
    window, strides, padding = _canon(window, strides, padding)
    x, y = res
    nd = len(window)
    spatial = x.shape[1:1 + nd]
    out = y.shape[1:1 + nd]

    neg = jnp.asarray(-jnp.inf, x.dtype)
    # pad low by `lo` and high so that every offset's strided slice
    # covers the full output grid
    pads = [(lo, max((o - 1) * s + k - (n + lo), 0))
            for (lo, _hi), o, s, k, n
            in zip(padding, out, strides, window, spatial)]
    xp = jnp.pad(x, ((0, 0), *pads, (0, 0)), constant_values=neg)
    pshape = xp.shape[1:1 + nd]

    g = g.astype(x.dtype)
    claimed = jnp.zeros(y.shape, jnp.bool_)
    gxp = jnp.zeros(xp.shape, x.dtype)
    zero = jnp.zeros((), x.dtype)
    for offs in itertools.product(*[range(k) for k in window]):
        lim = [d + (o - 1) * s + 1
               for d, o, s in zip(offs, out, strides)]
        x_sub = lax.slice(
            xp, (0, *offs, 0),
            (xp.shape[0], *lim, xp.shape[-1]),
            (1, *strides, 1))
        hit = x_sub == y
        take = hit & ~claimed
        claimed = claimed | hit
        # place take*g back at this offset's x positions: interior
        # padding (stride-1) + low offset
        contrib = lax.pad(
            jnp.where(take, g, zero), zero,
            ((0, 0, 0),
             *((d, p - l, s - 1)
               for d, l, p, s in zip(offs, lim, pshape, strides)),
             (0, 0, 0)))
        gxp = gxp + contrib
    return (lax.slice(
        gxp, (0, *(lo for lo, _ in pads), 0),
        (gxp.shape[0], *(lo + n for (lo, _), n in zip(pads, spatial)),
         gxp.shape[-1])),)


max_pool.defvjp(_fwd, _bwd)
