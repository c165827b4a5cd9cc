"""Quadrant split/merge ops for hierarchical quadtree models.

The reference splits a 14×14 NCHW feature map into four 7×7 quadrants with
four Python slice expressions and runs a shared conv on each sequentially
(``Quadtree_from scratch/models.py:279-287``). On TPU that is the wrong
shape: four small convs serialize and under-fill the MXU. Here the split is
a single reshape/transpose that folds the 4 quadrants into the batch axis,
so ONE conv call processes all quadrants — XLA lowers this to a zero-copy
relayout fused with the following convolution.

It also fixes the reference's latent zero-width-slice bug for odd widths
(``models.py:182,196`` uses ``[..., w:]`` instead of ``[..., mid_w:]``):
this formulation requires even H/W and asserts it, which holds for every
map the models produce (28, 14).

Layout is NHWC throughout (TPU-native).
"""

from __future__ import annotations

import jax.numpy as jnp


def quadrant_split(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, C) → (B*4, H/2, W/2, C) with quadrant-major batch order.

    Output batch index = b*4 + q where q enumerates quadrants in raster
    order: 0=top-left, 1=top-right, 2=bottom-left, 3=bottom-right —
    matching the reference's q1..q4 (``models.py:279-282``).
    """
    b, h, w, c = x.shape
    if h % 2 or w % 2:
        raise ValueError(f"quadrant_split needs even H,W; got {h}x{w}")
    hh, hw = h // 2, w // 2
    x = x.reshape(b, 2, hh, 2, hw, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # (B, 2, 2, hh, hw, C)
    return x.reshape(b * 4, hh, hw, c)


def quadrant_merge(x: jnp.ndarray, batch: int) -> jnp.ndarray:
    """Inverse of :func:`quadrant_split`: (B*4, h, w, C) → (B, 2h, 2w, C)."""
    b4, h, w, c = x.shape
    if b4 != batch * 4:
        raise ValueError(f"expected batch*4={batch * 4}, got {b4}")
    x = x.reshape(batch, 2, 2, h, w, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(batch, 2 * h, 2 * w, c)


def quadrant_flatten(x: jnp.ndarray, batch: int) -> jnp.ndarray:
    """(B*4, h, w, C) → (B, 4*h*w*C): per-sample concat of quadrant features.

    Concatenation order is q0..q3 then flattened HWC per quadrant, matching
    the reference's ``torch.cat([q1_f, q2_f, q3_f, q4_f], dim=1)`` up to
    the NCHW→NHWC within-quadrant permutation (a fixed permutation of the
    classifier's input features — irrelevant to learning, handled by the
    weight importer when loading torch checkpoints).
    """
    b4 = x.shape[0]
    if b4 != batch * 4:
        raise ValueError(f"expected batch*4={batch * 4}, got {b4}")
    return x.reshape(batch, -1)
