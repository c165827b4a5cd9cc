"""Stem forward fusion A/B on real TPU (round-3 VERDICT item 5).

Measures the train-mode stem FORWARD (conv7x7/s2 → BN(train) → ReLU,
pool left native) three ways at the flagship shape (BS 256, 224²):

  xla       : the stock path (XLA conv + flax-style BN math + relu)
  pallas_bn : XLA conv + ops/pallas/stem_bn kernels (K1 stats pass,
              K2 folded-affine+ReLU pass)
  kernels   : the K1/K2 passes alone on a precomputed conv map — the
              isolated BN cost each side pays

plus full-stem (with maxpool) variants. Fused fori_loop + device_get,
best-of-3 (bench.py methodology). Equivalence is asserted on-device
before timing. Result goes to BENCH_NOTES (win → wire behind a flag;
loss → the seventh documented negative result).

Run: python scripts/tpu_stem_fusion_probe.py [steps] [bs]
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def timed(fn, *args, steps):
    # device_get the SCALAR accumulator (last leaf), never the big
    # carry array: a 411 MB device_get through the axon tunnel costs
    # ~50 s and would swamp the measurement entirely.
    import jax

    out = fn(*args)
    jax.device_get(jax.tree.leaves(out)[-1])
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.device_get(jax.tree.leaves(out)[-1])
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    import jax
    import jax.numpy as jnp

    from surya_tpu.ops.pallas.stem_bn import (
        affine_relu,
        channel_stats,
        fused_bn_relu_train,
        reference_bn_relu_train,
    )

    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    bs = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    print(f"device={jax.devices()[0].platform} bs={bs} steps={steps}",
          flush=True)

    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.normal(size=(bs, 224, 224, 3)),
                         jnp.bfloat16)
    kernel = jnp.asarray(rng.normal(size=(7, 7, 3, 64)) * 0.1,
                         jnp.float32)
    scale = jnp.asarray(rng.uniform(0.5, 2.0, 64), jnp.float32)
    bias = jnp.asarray(rng.normal(size=64), jnp.float32)

    def conv(x):
        return jax.lax.conv_general_dilated(
            x, kernel.astype(jnp.bfloat16), (2, 2),
            ((3, 3), (3, 3)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    def stem_xla(x):
        y, mean, var = reference_bn_relu_train(conv(x), scale, bias)
        return y, mean

    def stem_pallas(x):
        y, mean, var = fused_bn_relu_train(conv(x), scale, bias)
        return y, mean

    # equivalence on device first
    y1, m1 = jax.jit(stem_xla)(images)
    y2, m2 = jax.jit(stem_pallas)(images)
    err = float(jnp.max(jnp.abs(y1.astype(jnp.float32)
                                - y2.astype(jnp.float32))))
    merr = float(jnp.max(jnp.abs(m1 - m2)))
    print(f"on-device equivalence: max |y| err {err:.3e}, "
          f"mean err {merr:.3e}", flush=True)
    assert err < 0.05 and merr < 1e-2, "fused path diverges"

    def fused_loop(stem):
        @jax.jit
        def run(x, acc):
            def step(_, carry):
                xx, a = carry
                y, mean = stem(xx + (a * 1e-18).astype(xx.dtype))
                # consume the FULL map: without this XLA dead-codes the
                # affine+ReLU write on either side and the A/B is void
                return xx, a + jnp.sum(mean) + jnp.sum(
                    y.astype(jnp.float32))
            return jax.lax.fori_loop(0, steps, step, (x, acc))
        return run

    results = {}
    for name, stem in (("xla", stem_xla), ("pallas_bn", stem_pallas)):
        secs = timed(fused_loop(stem), images, jnp.float32(0),
                     steps=steps)
        results[f"stem_fwd_{name}"] = {
            "seconds": secs, "ms_per_step": 1e3 * secs / steps,
            "img_per_sec": bs * steps / secs}
        print(f"stem fwd {name}: {1e3 * secs / steps:.2f} ms/step "
              f"({bs * steps / secs:,.0f} img/s)", flush=True)

    # isolated BN cost on a fixed conv map (what each side pays per map)
    cmap = jax.jit(conv)(images)

    def bn_xla(x, acc):
        y, mean, _ = reference_bn_relu_train(
            x + (acc * 1e-18).astype(x.dtype), scale, bias)
        return x, acc + jnp.sum(mean) + jnp.sum(
            y.astype(jnp.float32))

    def bn_pallas(x, acc):
        y, mean, _ = fused_bn_relu_train(
            x + (acc * 1e-18).astype(x.dtype), scale, bias)
        return x, acc + jnp.sum(mean) + jnp.sum(
            y.astype(jnp.float32))

    for name, body in (("xla", bn_xla), ("pallas", bn_pallas)):
        @jax.jit
        def run(x, acc, body=body):
            def step(_, c):
                return body(*c)
            return jax.lax.fori_loop(0, steps, step, (x, acc))
        secs = timed(run, cmap, jnp.float32(0), steps=steps)
        results[f"bn_only_{name}"] = {
            "seconds": secs, "ms_per_step": 1e3 * secs / steps}
        print(f"bn+relu only {name}: {1e3 * secs / steps:.2f} ms/step",
              flush=True)

    # roofline context: map bytes r+w at 819 GB/s
    map_bytes = int(np.prod(cmap.shape)) * 2
    results["roofline_ms"] = {
        "stats_read_plus_affine_rw": 1e3 * 3 * map_bytes / 819e9,
        "map_mb": map_bytes / 1e6}
    print(f"roofline (3 map passes): "
          f"{results['roofline_ms']['stats_read_plus_affine_rw']:.2f} ms",
          flush=True)

    os.makedirs("runs/temporal_profile", exist_ok=True)
    with open("runs/temporal_profile/stem_fusion_probe.json", "w") as f:
        json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
