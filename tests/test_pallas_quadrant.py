"""Pallas quadrant kernel vs the lax reference path (SURVEY §4c).

Runs in pallas interpret mode on CPU (the same kernel compiles for TPU;
bench.py exercises the compiled path on hardware).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from surya_tpu.ops.quadtree import quadrant_flatten, quadrant_split


def _lax_reference(fmap, kernel, bias):
    b = fmap.shape[0]
    quads = quadrant_split(fmap)
    q = jax.lax.conv_general_dilated(
        quads, kernel, window_strides=(1, 1), padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    q = jax.nn.relu(q + bias)
    q = jax.lax.reduce_window(q, -jnp.inf, jax.lax.max,
                              (1, 2, 2, 1), (1, 2, 2, 1), "VALID")
    return quadrant_flatten(q, b)


@pytest.mark.parametrize("b,h,cin,cout", [(4, 14, 256, 128),
                                          (3, 28, 32, 16),
                                          (8, 8, 16, 8)])
def test_matches_lax_path(b, h, cin, cout):
    from surya_tpu.ops.pallas.quadrant import _quadrant_process_impl

    rng = np.random.default_rng(0)
    fmap = jnp.asarray(rng.normal(size=(b, h, h, cin)), jnp.float32)
    kernel = jnp.asarray(rng.normal(size=(3, 3, cin, cout)) * 0.05,
                         jnp.float32)
    bias = jnp.asarray(rng.normal(size=(cout,)), jnp.float32)

    want = _lax_reference(fmap, kernel, bias)
    # exercise the ACTUAL kernel in interpret mode (quadrant_process
    # would take its lax fallback on the CPU backend)
    with pltpu.force_tpu_interpret_mode():
        got = _quadrant_process_impl(fmap, kernel, bias)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_zero_padding_at_quadrant_borders():
    """Conv must zero-pad each QUADRANT independently (not see across the
    quadrant boundary) — the semantic the reference's per-quadrant conv
    has and a full-map conv would violate."""
    from surya_tpu.ops.pallas.quadrant import _quadrant_process_impl

    # all-ones map: a cross-boundary leak would change border sums.
    fmap = jnp.ones((1, 8, 8, 4), jnp.float32)
    kernel = jnp.ones((3, 3, 4, 4), jnp.float32)
    bias = jnp.zeros((4,), jnp.float32)
    want = _lax_reference(fmap, kernel, bias)
    with pltpu.force_tpu_interpret_mode():
        got = _quadrant_process_impl(fmap, kernel, bias)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_with_act_output_matches_prepool_activation():
    """with_act=True returns the post-ReLU pre-pool map the backward
    consumes; it must equal the lax path's activation merged to full-map
    layout, and the pooled output must be unchanged."""
    from surya_tpu.ops.pallas.quadrant import _quadrant_process_impl
    from surya_tpu.ops.quadtree import quadrant_merge, quadrant_split

    rng = np.random.default_rng(7)
    fmap = jnp.asarray(rng.normal(size=(3, 8, 8, 16)), jnp.float32)
    kernel = jnp.asarray(rng.normal(size=(3, 3, 16, 8)) * 0.1, jnp.float32)
    bias = jnp.asarray(rng.normal(size=(8,)), jnp.float32)

    quads = quadrant_split(fmap)
    act_want = jax.nn.relu(jax.lax.conv_general_dilated(
        quads, kernel, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + bias)
    with pltpu.force_tpu_interpret_mode():
        out, act = _quadrant_process_impl(fmap, kernel, bias, with_act=True)
    np.testing.assert_allclose(np.asarray(act),
                               np.asarray(quadrant_merge(act_want, 3)),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(_lax_reference(fmap, kernel, bias)),
                               rtol=1e-4, atol=1e-4)


def test_pallas_fwd_grad_matches_lax(monkeypatch):
    """Force the Pallas forward (interpret mode) so the residual-saving
    backward runs against kernel-produced activations."""
    import surya_tpu.ops.pallas.quadrant as qmod

    monkeypatch.setattr(qmod, "on_tpu", lambda: True)
    rng = np.random.default_rng(5)
    fmap = jnp.asarray(rng.normal(size=(2, 8, 8, 16)), jnp.float32)
    kernel = jnp.asarray(rng.normal(size=(3, 3, 16, 8)) * 0.1, jnp.float32)
    bias = jnp.asarray(rng.normal(size=(8,)), jnp.float32)

    def loss_p(f, k, b):
        with pltpu.force_tpu_interpret_mode():
            return jnp.sum(qmod.quadrant_process(f, k, b) ** 2)

    def loss_l(f, k, b):
        return jnp.sum(_lax_reference(f, k, b) ** 2)

    gp = jax.grad(loss_p, argnums=(0, 1, 2))(fmap, kernel, bias)
    gl = jax.grad(loss_l, argnums=(0, 1, 2))(fmap, kernel, bias)
    for a, b in zip(gp, gl):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_pallas_grad_matches_lax():
    from surya_tpu.ops.pallas.quadrant import quadrant_process

    rng = np.random.default_rng(3)
    fmap = jnp.asarray(rng.normal(size=(2, 8, 8, 16)), jnp.float32)
    kernel = jnp.asarray(rng.normal(size=(3, 3, 16, 8)) * 0.1, jnp.float32)
    bias = jnp.asarray(rng.normal(size=(8,)), jnp.float32)

    def loss_p(f, k, b):
        with pltpu.force_tpu_interpret_mode():
            return jnp.sum(quadrant_process(f, k, b) ** 2)

    def loss_l(f, k, b):
        return jnp.sum(_lax_reference(f, k, b) ** 2)

    gp = jax.grad(loss_p, argnums=(0, 1, 2))(fmap, kernel, bias)
    gl = jax.grad(loss_l, argnums=(0, 1, 2))(fmap, kernel, bias)
    for a, b in zip(gp, gl):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)
