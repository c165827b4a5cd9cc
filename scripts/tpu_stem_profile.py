"""Micro-profile of the ResNet stem's sub-ops on real TPU.

Round-1 ablation (scripts/tpu_profile_step.py) showed stem fwd+bwd is
~0.105 s of the 0.333 s train step at BS 256 (~31%) at ~9% MFU. This
drills one level deeper: times each stem sub-op (conv7x7/s2, BN, ReLU,
maxpool3x3/s2) forward-only and forward+param-grad, isolating which
pass is the bandwidth hog, so the optimization (Pallas fused stem /
pool-backward rewrite / s2d) targets the real culprit.

Same fused-fori_loop + device_get clock as bench.py (the only honest
timing through the axon tunnel — BENCH_NOTES.md).

Run: python scripts/tpu_stem_profile.py [steps] [bs]
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def timed(fn, *args, steps):
    import jax

    out = fn(*args)
    jax.device_get(jax.tree.leaves(out)[0])
    t0 = time.perf_counter()
    out = fn(*args)
    jax.device_get(jax.tree.leaves(out)[0])
    return time.perf_counter() - t0


def main():
    import flax.linen as nn
    import jax
    import jax.numpy as jnp

    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    bs = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    print(f"device={jax.devices()[0].platform} bs={bs} steps={steps}")

    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.normal(size=(bs, 224, 224, 3)), jnp.bfloat16)
    # the post-conv map the BN/pool passes traverse
    mid = jnp.asarray(rng.normal(size=(bs, 112, 112, 64)), jnp.bfloat16)

    conv = nn.Conv(64, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
                   use_bias=False, dtype=jnp.bfloat16,
                   param_dtype=jnp.float32)
    bn = nn.BatchNorm(use_running_average=False, momentum=0.9,
                      epsilon=1e-5, dtype=jnp.bfloat16,
                      param_dtype=jnp.float32)
    cparams = conv.init(jax.random.PRNGKey(0), img)
    bparams = bn.init(jax.random.PRNGKey(0), mid)

    def fused(body):
        @jax.jit
        def run(*args):
            def step(_, carry):
                return body(*carry)
            return jax.lax.fori_loop(0, steps, step, args)
        return run

    results = {}

    def probe(name, loss_fn, params, x):
        """Time forward-only and forward+param-grad variants."""
        def f_body(p, xx, acc):
            return p, xx, acc + loss_fn(p, xx + acc * 1e-20)

        def g_body(p, xx, acc):
            loss, grads = jax.value_and_grad(loss_fn)(
                p, xx + acc * 1e-20)
            gsum = sum(jnp.sum(jnp.abs(g).astype(jnp.float32))
                       for g in jax.tree.leaves(grads))
            return p, xx, acc + loss + gsum * 1e-20

        tf = timed(fused(f_body), params, x, jnp.float32(0), steps=steps)
        tg = timed(fused(g_body), params, x, jnp.float32(0), steps=steps)
        results[name] = {"fwd": tf, "fwd+grad": tg}
        print(f"{name:24s}: fwd {tf:7.3f} s   fwd+grad {tg:7.3f} s  "
              f"({bs * steps / tg:9.1f} img/s)")

    # 1. conv7x7/s2 alone (weight grad only — images carry no grad,
    #    matching the real model where the stem is the first layer)
    probe("conv7x7s2",
          lambda p, x: jnp.sum(conv.apply(p, x).astype(jnp.float32)
                               ** 2) * 1e-6,
          cparams, img)

    # 2. BN alone on the 112^2 x 64 map (train mode, stats update)
    def bn_loss(p, x):
        y, _ = bn.apply(p, x, mutable=["batch_stats"])
        return jnp.sum(y.astype(jnp.float32) ** 2) * 1e-6

    probe("bn112", bn_loss, bparams, mid)

    # 3. maxpool alone on the 112^2 x 64 map — needs an input grad to
    #    exercise SelectAndScatter; park a dummy param scale in front.
    def pool_loss(p, x):
        y = nn.max_pool(x * p["s"], (3, 3), strides=(2, 2),
                        padding=((1, 1), (1, 1)))
        return jnp.sum(y.astype(jnp.float32) ** 2) * 1e-6

    probe("maxpool112", pool_loss, {"s": jnp.float32(1)}, mid)

    # 3b. avgpool on the same map (for comparison: reduce_window grad
    #     without SelectAndScatter)
    def avg_loss(p, x):
        y = nn.avg_pool(x * p["s"], (3, 3), strides=(2, 2),
                        padding=((1, 1), (1, 1)))
        return jnp.sum(y.astype(jnp.float32) ** 2) * 1e-6

    probe("avgpool112", avg_loss, {"s": jnp.float32(1)}, mid)

    # 4. conv + bn + relu (no pool)
    def cbr_loss(p, x):
        y = conv.apply(p["c"], x)
        y, _ = bn.apply(p["b"], y, mutable=["batch_stats"])
        return jnp.sum(nn.relu(y).astype(jnp.float32) ** 2) * 1e-6

    probe("conv+bn+relu", cbr_loss, {"c": cparams, "b": bparams}, img)

    # 5. full stem
    def stem_loss(p, x):
        y = conv.apply(p["c"], x)
        y, _ = bn.apply(p["b"], y, mutable=["batch_stats"])
        y = nn.relu(y)
        y = nn.max_pool(y, (3, 3), strides=(2, 2),
                        padding=((1, 1), (1, 1)))
        return jnp.sum(y.astype(jnp.float32) ** 2) * 1e-6

    probe("stem(c+b+r+p)", stem_loss, {"c": cparams, "b": bparams}, img)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
