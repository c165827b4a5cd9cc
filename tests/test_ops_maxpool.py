"""Fast-backward max pool vs XLA's reduce_window/SelectAndScatter.

The custom VJP in ops/maxpool.py must be bit-identical to XLA's own
max-pool gradient — including the first-match-in-window-order tie rule
— since it replaces nn.max_pool inside every backbone stem.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from surya_tpu.ops.maxpool import max_pool

CASES_2D = [
    # (window, strides, padding) — resnet/densenet stem, vgg, quadrant
    ((3, 3), (2, 2), ((1, 1), (1, 1))),
    ((2, 2), (2, 2), ((0, 0), (0, 0))),
    ((3, 3), (1, 1), ((1, 1), (1, 1))),
    ((2, 2), (2, 2), ((1, 0), (0, 1))),  # asymmetric padding
]


def _ref_pool(x, window, strides, padding):
    return nn.max_pool(x, window, strides=strides, padding=padding)


@pytest.mark.parametrize("window,strides,padding", CASES_2D)
@pytest.mark.parametrize("shape", [(2, 13, 11, 3), (1, 8, 8, 4)])
def test_forward_matches_flax(window, strides, padding, shape):
    x = jnp.asarray(np.random.default_rng(0).normal(size=shape),
                    jnp.float32)
    got = max_pool(x, window, strides, padding)
    want = _ref_pool(x, window, strides, padding)
    assert got.shape == want.shape
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


@pytest.mark.parametrize("window,strides,padding", CASES_2D)
def test_grad_matches_xla_random(window, strides, padding):
    x = jnp.asarray(np.random.default_rng(1).normal(size=(2, 13, 11, 3)),
                    jnp.float32)

    def loss_fast(x):
        return jnp.sum(max_pool(x, window, strides, padding) ** 2)

    def loss_ref(x):
        return jnp.sum(_ref_pool(x, window, strides, padding) ** 2)

    gf = jax.jit(jax.grad(loss_fast))(x)
    gr = jax.jit(jax.grad(loss_ref))(x)
    np.testing.assert_array_equal(np.asarray(gf), np.asarray(gr))


@pytest.mark.parametrize("window,strides,padding", CASES_2D)
def test_grad_matches_xla_ties(window, strides, padding):
    """Quantized input => many exact ties inside windows; the custom
    backward must route grad to the SAME winner XLA picks."""
    rng = np.random.default_rng(2)
    x = jnp.asarray(
        rng.integers(-2, 3, size=(3, 12, 12, 2)).astype(np.float32))
    # integer cotangents: sums of winners are exact in f32, so any
    # difference is a ROUTING difference, not accumulation order
    g = jnp.asarray(rng.integers(-4, 5, size=_ref_pool(
        x, window, strides, padding).shape).astype(np.float32))

    def pool_fast(x):
        return max_pool(x, window, strides, padding)

    def pool_ref(x):
        return _ref_pool(x, window, strides, padding)

    _, vf = jax.vjp(pool_fast, x)
    _, vr = jax.vjp(pool_ref, x)
    np.testing.assert_array_equal(np.asarray(vf(g)[0]),
                                  np.asarray(vr(g)[0]))


def test_grad_ties_all_equal_window():
    """Whole windows of identical values (post-ReLU zeros pattern)."""
    x = jnp.zeros((1, 8, 8, 1), jnp.float32)
    w, s, p = (3, 3), (2, 2), ((1, 1), (1, 1))
    g = jnp.ones(_ref_pool(x, w, s, p).shape, jnp.float32)
    _, vf = jax.vjp(lambda x: max_pool(x, w, s, p), x)
    _, vr = jax.vjp(lambda x: _ref_pool(x, w, s, p), x)
    np.testing.assert_array_equal(np.asarray(vf(g)[0]),
                                  np.asarray(vr(g)[0]))


def test_bfloat16_grad_matches():
    """bf16 activations (the stem's compute dtype) — quantization makes
    ties common; still bit-identical to XLA."""
    x = jnp.asarray(np.random.default_rng(3).normal(size=(2, 16, 16, 8)),
                    jnp.bfloat16)
    w, s, p = (3, 3), (2, 2), ((1, 1), (1, 1))
    # small-integer cotangents sum exactly in bf16 (see routing note in
    # test_grad_matches_xla_ties)
    g = jnp.asarray(np.random.default_rng(4).integers(
        -4, 5, size=_ref_pool(x, w, s, p).shape).astype(np.float32),
        jnp.bfloat16)
    _, vf = jax.vjp(lambda x: max_pool(x, w, s, p), x)
    _, vr = jax.vjp(lambda x: _ref_pool(x, w, s, p), x)
    np.testing.assert_array_equal(
        np.asarray(vf(g)[0], np.float32), np.asarray(vr(g)[0], np.float32))


def test_3d_video_pool():
    """NDHWC 3-D pooling (models/temporal/conv3d.py windows)."""
    x = jnp.asarray(np.random.default_rng(5).normal(size=(2, 4, 8, 8, 3)),
                    jnp.float32)
    for w in [(1, 2, 2), (2, 2, 2)]:
        got = max_pool(x, w, w, ((0, 0),) * 3)
        want = nn.max_pool(x, w, strides=w)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

        def lf(x, w=w):
            return jnp.sum(max_pool(x, w, w, ((0, 0),) * 3) ** 3)

        def lr(x, w=w):
            return jnp.sum(nn.max_pool(x, w, strides=w) ** 3)

        np.testing.assert_array_equal(
            np.asarray(jax.grad(lf)(x)), np.asarray(jax.grad(lr)(x)))


def test_second_order_not_needed_but_jit_vmap_ok():
    """The pool composes under jit+vmap (used at 4x batch quadrants)."""
    x = jnp.asarray(np.random.default_rng(6).normal(size=(4, 2, 8, 8, 2)),
                    jnp.float32)
    f = jax.jit(jax.vmap(
        lambda x: max_pool(x, (2, 2), (2, 2), ((0, 0), (0, 0)))))
    want = jnp.stack([nn.max_pool(xi, (2, 2), strides=(2, 2))
                      for xi in x])
    np.testing.assert_array_equal(np.asarray(f(x)), np.asarray(want))
