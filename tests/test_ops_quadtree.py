"""quadrant_split/merge vs the reference's explicit-slice semantics."""

import jax.numpy as jnp
import numpy as np
import pytest

from surya_tpu.ops.quadtree import quadrant_flatten, quadrant_merge, quadrant_split


def _naive_quadrants(x):
    """The reference's four slices (models.py:279-282), NHWC."""
    h, w = x.shape[1] // 2, x.shape[2] // 2
    q1 = x[:, :h, :w]   # top-left
    q2 = x[:, :h, w:]   # top-right
    q3 = x[:, h:, :w]   # bottom-left
    q4 = x[:, h:, w:]   # bottom-right
    return [q1, q2, q3, q4]


@pytest.mark.parametrize("shape", [(2, 14, 14, 256), (3, 28, 28, 8),
                                   (1, 4, 4, 5)])
def test_split_matches_naive_slices(shape):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    got = quadrant_split(x)
    want = _naive_quadrants(x)
    b = shape[0]
    for q in range(4):
        np.testing.assert_array_equal(got[q::4][:b] if False else
                                      got.reshape(b, 4, *got.shape[1:])[:, q],
                                      want[q])


def test_merge_roundtrip():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 14, 14, 16)).astype(np.float32))
    np.testing.assert_array_equal(quadrant_merge(quadrant_split(x), 2), x)


def test_double_split_is_16_subquadrants():
    x = jnp.arange(2 * 28 * 28 * 3, dtype=jnp.float32).reshape(2, 28, 28, 3)
    l1 = quadrant_split(x)       # (8, 14, 14, 3)
    l2 = quadrant_split(l1)      # (32, 7, 7, 3)
    assert l2.shape == (32, 7, 7, 3)
    # Sub-quadrant 0 of quadrant 0 of sample 0 == x[0, :7, :7].
    np.testing.assert_array_equal(l2[0], x[0, :7, :7])
    # Last sub-quadrant of last quadrant == bottom-right 7x7.
    np.testing.assert_array_equal(l2[-1], x[-1, 21:, 21:])


def test_flatten_shape_and_order():
    x = jnp.arange(1 * 4 * 4 * 2, dtype=jnp.float32).reshape(1, 4, 4, 2)
    q = quadrant_split(x)
    flat = quadrant_flatten(q, 1)
    assert flat.shape == (1, 4 * 2 * 2 * 2)
    np.testing.assert_array_equal(flat[0, :8], q[0].reshape(-1))


def test_odd_size_rejected():
    with pytest.raises(ValueError):
        quadrant_split(jnp.zeros((1, 7, 7, 3)))
