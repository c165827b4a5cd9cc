"""Does BN-folding actually buy anything on TPU? A/B on the real chip.

`fold_resnet_params` (models/backbones/resnet.py) is the standard
deployment transform: inference BatchNorm is a per-channel affine, so
it folds into the preceding conv's kernel+bias and the normalize op
vanishes from the graph. On GPUs/CPUs this is a reliable win; on TPU
XLA already fuses the affine into the conv's output tile, so the fold
may be a no-op for speed. This probe answers that empirically:
ResNet-18 trunk inference, bf16, unfolded (train=False, batch_stats)
vs folded (fold_bn=True), same fused-fori_loop + device_get clock as
bench.py, best-of-3.

Exactness of the fold is pinned by tests/test_fold_bn.py; this script
is only about speed. Results → BENCH_NOTES.md.

Run: python scripts/tpu_bnfold_probe.py [steps] [bs]
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from surya_tpu.models.backbones.resnet import (
        fold_resnet_params, make_resnet)

    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    bs = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    print(f"device={jax.devices()[0].platform} bs={bs} steps={steps}")

    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.normal(size=(bs, 224, 224, 3)), jnp.bfloat16)

    model = make_resnet("resnet18")
    variables = model.init(jax.random.PRNGKey(0), img)
    folded_model = make_resnet("resnet18", fold_bn=True)
    folded = fold_resnet_params(variables["params"],
                                variables["batch_stats"])

    def fused(apply_fn, params):
        @jax.jit
        def run(x, acc):
            def step(_, carry):
                xx, a = carry
                out = apply_fn(params, xx + a * 1e-20)["out"]
                return xx, a + jnp.sum(out.astype(jnp.float32)) * 1e-6
            return jax.lax.fori_loop(0, steps, step, (x, acc))
        return run

    def bench(name, apply_fn, params):
        run = fused(apply_fn, params)
        best = float("inf")
        for _ in range(4):  # first = compile warmup
            t0 = time.perf_counter()
            _, acc = run(img, jnp.float32(0))
            jax.device_get(acc)
            dt = time.perf_counter() - t0
            best = min(best, dt)
        ips = bs * steps / best
        print(f"{name:10s}: {best:7.3f} s  ({ips:9.1f} img/s)")
        return ips

    unfolded = bench(
        "unfolded",
        lambda p, x: model.apply(p, x, train=False), variables)
    fold = bench(
        "folded",
        lambda p, x: folded_model.apply({"params": p}, x, train=False),
        folded)
    print(json.dumps({"bs": bs, "steps": steps,
                      "unfolded_ips": unfolded, "folded_ips": fold,
                      "speedup": fold / unfolded}))


if __name__ == "__main__":
    main()
