"""On-hardware Pallas kernel checks (the ones interpret mode can't run).

jax 0.9.0's pallas interpreter stubs ``prng_random_bits`` to zeros
(interpret_pallas_call.py:1183), so the in-kernel-dropout semantics of
ops/pallas/fusion_head.py are validated here on the real chip. Also
re-runs the quadrant kernel fwd/bwd equivalence compiled (not
interpreted). Run: ``python scripts/tpu_kernel_checks.py`` on a TPU
host; results are recorded in BENCH_NOTES.md.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp


def check_fusion_dropout_semantics():
    from surya_tpu.ops.pallas.fusion_head import _fusion_head_impl

    rng = np.random.default_rng(2)
    b, d, h, c = 64, 256, 512, 8
    x = jnp.asarray(rng.normal(size=(b, d)) * 0.1, jnp.float32)
    w1 = jnp.asarray(rng.normal(size=(d, h)) * 0.02, jnp.float32)
    b1 = jnp.ones((h,), jnp.float32)
    w2 = jnp.asarray(rng.normal(size=(h, c)) * 0.02, jnp.float32)
    b2 = jnp.asarray(rng.normal(size=(c,)), jnp.float32)
    rate = 0.5
    seed = jnp.full((1, 1), 1234, jnp.int32)
    got, hidden = _fusion_head_impl(x, w1, b1, w2, b2, seed, rate=rate)
    hidden = np.asarray(hidden)
    relu = np.asarray(jax.nn.relu(x @ w1 + b1))
    pos = relu > 0
    frac = ((hidden == 0) & pos).sum() / pos.sum()
    assert 0.4 < frac < 0.6, f"drop fraction {frac}"
    kept = hidden > 0
    np.testing.assert_allclose(hidden[kept], relu[kept] / (1 - rate),
                               rtol=1e-3)
    # default-precision f32 matmul on the MXU rounds at ~1e-3 rel
    np.testing.assert_allclose(
        np.asarray(got), hidden @ np.asarray(w2) + np.asarray(b2),
        rtol=5e-3, atol=5e-3)
    # determinism: same seed → same mask; different seed → different
    _, h_same = _fusion_head_impl(x, w1, b1, w2, b2, seed, rate=rate)
    np.testing.assert_array_equal(hidden, np.asarray(h_same))
    _, h_diff = _fusion_head_impl(
        x, w1, b1, w2, b2, jnp.full((1, 1), 99, jnp.int32), rate=rate)
    assert not np.array_equal(hidden, np.asarray(h_diff))
    print(f"fusion_head dropout: ok (drop frac {frac:.3f})")


def check_fusion_dropout_grads():
    from surya_tpu.ops.pallas.fusion_head import (
        _fusion_head_impl,
        fusion_head,
    )

    rng = np.random.default_rng(3)
    b, d, h, c = 8, 64, 32, 8
    x = jnp.asarray(rng.normal(size=(b, d)) * 0.1, jnp.float32)
    w1 = jnp.asarray(rng.normal(size=(d, h)) * 0.1, jnp.float32)
    b1 = jnp.asarray(rng.normal(size=(h,)), jnp.float32)
    w2 = jnp.asarray(rng.normal(size=(h, c)) * 0.1, jnp.float32)
    b2 = jnp.asarray(rng.normal(size=(c,)), jnp.float32)
    rate = 0.5
    seed = jnp.full((1, 1), 7, jnp.int32)
    _, hidden = _fusion_head_impl(x, w1, b1, w2, b2, seed, rate=rate)
    mask = jnp.asarray(np.asarray(hidden) > 0, jnp.float32)

    def loss_p(*a):
        return jnp.sum(fusion_head(*a, rate=rate, seed=7) ** 2)

    def loss_l(x, w1, b1, w2, b2):
        hh = jax.nn.relu(x @ w1 + b1) * mask / (1 - rate)
        return jnp.sum((hh @ w2 + b2) ** 2)

    gp = jax.grad(loss_p, argnums=tuple(range(5)))(x, w1, b1, w2, b2)
    gl = jax.grad(loss_l, argnums=tuple(range(5)))(x, w1, b1, w2, b2)
    for a, b_ in zip(gp, gl):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-3, atol=1e-3)
    print("fusion_head dropout grads: ok")


def check_quadrant_compiled():
    """Compiled (non-interpret) fwd/bwd equivalence vs the lax path.

    Run in f32 at HIGHEST matmul precision so both forwards agree to
    float error — then any backward mismatch is a math bug. (In bf16 the
    two forwards round independently, flipping ReLU/maxpool masks at
    near-ties, which perturbs grads by a few percent L2 — measured
    kernel relL2 0.031 at bf16 vs 1e-7 at f32/HIGHEST; inherent to any
    pair of non-bit-identical forwards, not a kernel defect.)"""
    from surya_tpu.ops.pallas.quadrant import (
        _lax_reference,
        quadrant_process,
    )

    rng = np.random.default_rng(0)
    fmap = jnp.asarray(rng.normal(size=(16, 14, 14, 256)), jnp.float32)
    kernel = jnp.asarray(rng.normal(size=(3, 3, 256, 128)) * 0.05,
                         jnp.float32)
    bias = jnp.asarray(rng.normal(size=(128,)), jnp.float32)

    with jax.default_matmul_precision("highest"):
        got = quadrant_process(fmap, kernel, bias)
        want = _lax_reference(fmap, kernel, bias)
        err = float(jnp.max(jnp.abs(got - want)) / jnp.max(jnp.abs(want)))
        assert err < 1e-5, f"fwd rel err {err}"

        def loss_p(f, k, b):
            return jnp.sum(quadrant_process(f, k, b) ** 2)

        def loss_l(f, k, b):
            return jnp.sum(_lax_reference(f, k, b) ** 2)

        gp = jax.grad(loss_p, argnums=(0, 1, 2))(fmap, kernel, bias)
        gl = jax.grad(loss_l, argnums=(0, 1, 2))(fmap, kernel, bias)
    for a, b_ in zip(gp, gl):
        rel = float(jnp.linalg.norm((a - b_).astype(jnp.float32))
                    / (jnp.linalg.norm(b_.astype(jnp.float32)) + 1e-9))
        assert rel < 1e-5, f"grad relL2 {rel}"
    print(f"quadrant kernel compiled fwd/bwd: ok (fwd rel err {err:.2e})")


if __name__ == "__main__":
    assert jax.default_backend() == "tpu", jax.default_backend()
    check_quadrant_compiled()
    check_fusion_dropout_semantics()
    check_fusion_dropout_grads()
    print("all TPU kernel checks passed")
