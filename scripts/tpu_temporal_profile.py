"""Temporal-family MFU profile on real TPU (round-3 VERDICT item 2).

Times the FULL train step (fwd+bwd+adamw, fused fori_loop + device_get,
hoisting-guarded — bench.py methodology) for every temporal family, an
A/B of the conv3d→batched-2D decomposition (``ModelConfig.conv3d_as_2d``,
models/temporal/conv3d.Conv3dAs2D) for the Conv3d stacks, a per-block
ablation of Quadtree3DCNN (where do the conv3d ms go?), and a FACT
batch-scaling sweep past the round-2 BS 8 pin.

MFU uses the compiled program's own cost analysis (XLA-counted FLOPs)
against the v5e bf16 peak (197 TFLOP/s); where cost_analysis is
unavailable through the tunnel a conv-only analytic estimate is used
and labeled.

Run: python scripts/tpu_temporal_profile.py [steps] → runs/temporal_profile/
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

PEAK_BF16 = 197e12  # TPU v5e per-chip
OUT = "runs/temporal_profile"


def timed(fn, *args, steps):
    # device_get the SCALAR accumulator (last leaf), never a big carry
    # array: large device_gets through the axon tunnel cost seconds and
    # would swamp the measurement (round-3 lesson, stem probe).
    import jax

    out = fn(*args)
    jax.device_get(jax.tree.leaves(out)[-1])
    best = float("inf")
    for _ in range(3):  # best-of-3: tunnel noise ±10%
        t0 = time.perf_counter()
        out = fn(*args)
        jax.device_get(jax.tree.leaves(out)[-1])
        best = min(best, time.perf_counter() - t0)
    return best


def compiled_flops(fn, *args):
    """XLA-counted FLOPs of one jitted call, or None."""
    import jax

    try:
        ca = jax.jit(fn).lower(*args).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return float(ca.get("flops", 0.0)) or None
    except Exception:
        return None


def build_step(model, tx, feats, labels, key, steps):
    import jax
    import jax.numpy as jnp
    import optax

    def loss_of(p, s, imgs):
        logits, mut = model.apply(
            {"params": p, "batch_stats": s}, imgs, feats, train=True,
            rngs={"dropout": key}, mutable=["batch_stats"])
        return optax.softmax_cross_entropy_with_integer_labels(
            logits.astype(jnp.float32), labels).mean(), \
            mut.get("batch_stats", s)

    def body(p, s, o, imgs, acc):
        (loss, s2), grads = jax.value_and_grad(
            loss_of, has_aux=True)(p, s, imgs + acc * 1e-20)
        upd, o2 = tx.update(grads, o, p)
        return optax.apply_updates(p, upd), s2, o2, imgs, acc + loss

    @jax.jit
    def run(p, s, o, imgs, acc):
        def step(_, carry):
            return body(*carry)
        return jax.lax.fori_loop(0, steps, step, (p, s, o, imgs, acc))

    def single(p, s, o, imgs, acc):  # for cost_analysis (one step)
        return body(p, s, o, imgs, acc)

    return run, single


def profile_family(name, bs, t, img, steps, conv3d_as_2d=False,
                   freeze=False):
    import jax
    import jax.numpy as jnp
    import optax

    from surya_tpu.core.config import Config, DataConfig, ModelConfig, TrainConfig
    from surya_tpu.core.prng import PRNG
    from surya_tpu.models import get_model
    from surya_tpu.train.steps import stop_frozen_gradients

    cfg = Config(
        model=ModelConfig(name=name, mode="fusion", num_classes=8,
                          seq_len=t, compute_dtype="bfloat16",
                          conv3d_as_2d=conv3d_as_2d,
                          freeze_backbone=freeze),
        data=DataConfig(batch_size=bs),
        train=TrainConfig(lr=1e-4, nan_guard=False))
    model = get_model(cfg.model)
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.normal(size=(bs, t, img, img, 3)),
                       jnp.float32)
    feats = jnp.asarray(rng.normal(size=(bs, t, 47)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, 8, bs), jnp.int32)
    key = PRNG(0).named(0, "dropout")
    variables = model.init({"params": PRNG(0).named(0, "init")}, imgs,
                           feats, train=False)
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    tx = optax.adamw(1e-4, weight_decay=1e-4)
    opt_state = tx.init(params)

    if freeze:
        base_apply = model.apply

        class _Frozen:
            def apply(self, v, *a, **k):
                v = dict(v)
                v["params"] = stop_frozen_gradients(
                    v["params"], name, True)
                return base_apply(v, *a, **k)
        model = _Frozen()

    run, single = build_step(model, tx, feats, labels, key, steps)
    secs = timed(run, params, stats, opt_state, imgs, jnp.float32(0),
                 steps=steps)
    flops1 = compiled_flops(single, params, stats, opt_state, imgs,
                            jnp.float32(0))
    clips_s = bs * steps / secs
    mfu = (flops1 * steps / secs / PEAK_BF16) if flops1 else None
    return {"model": name, "bs": bs, "t": t, "img": img,
            "conv3d_as_2d": conv3d_as_2d, "freeze": freeze,
            "seconds": secs, "clips_per_sec": clips_s,
            "flops_per_step": flops1, "mfu": mfu}


def profile_qt3d_blocks(steps):
    """Per-block fwd+bwd cost of the Quadtree3DCNN conv stack."""
    import jax
    import jax.numpy as jnp

    from surya_tpu.models.temporal.conv3d import _conv3d_block

    import flax.linen as nn

    bs = 16
    shapes = [  # (T,H,W,Cin) at each block input, after prior pools
        ("block1", (5, 224, 224, 3), 32),
        ("block2", (5, 112, 112, 32), 64),
        ("block3", (2, 56, 56, 64), 128),
        ("block4", (1, 28, 28, 128), 256),
        ("final", (1, 14, 14, 256), 1024),
    ]
    out = {}
    for bname, (t, h, w, cin), cout in shapes:
        for as2d in (False, True):
            class Blk(nn.Module):
                @nn.compact
                def __call__(self, x):
                    return _conv3d_block(x, cout, jnp.bfloat16, True,
                                         "b", as2d)

            m = Blk()
            x = jnp.asarray(np.random.default_rng(0).normal(
                size=(bs, t, h, w, cin)), jnp.bfloat16)
            v = m.init({"params": jax.random.key(0)}, x)

            def loss(p, s, xx):
                y, mut = m.apply({"params": p, "batch_stats": s}, xx,
                                 mutable=["batch_stats"])
                return jnp.sum(y.astype(jnp.float32) ** 2), \
                    mut["batch_stats"]

            def body(p, s, xx, acc):
                (l_, s2), g = jax.value_and_grad(
                    loss, has_aux=True)(p, s, xx + acc * 1e-20)
                gs = sum(jnp.sum(jnp.abs(x_))
                         for x_ in jax.tree.leaves(g))
                return p, s2, xx, acc + l_ * 1e-20 + gs * 1e-20

            @jax.jit
            def run(p, s, xx, acc):
                def step(_, c):
                    return body(*c)
                return jax.lax.fori_loop(0, steps, step, (p, s, xx, acc))

            secs = timed(run, v["params"], v["batch_stats"], x,
                         jnp.float32(0), steps=steps)
            # analytic conv FLOPs (fwd x3 for bwd, conv only)
            conv_flops = 2 * bs * t * h * w * 27 * cin * cout * 3
            out[f"{bname}{'_2d' if as2d else ''}"] = {
                "seconds": secs, "ms_per_step": 1e3 * secs / steps,
                "analytic_conv_mfu": conv_flops * steps / secs / PEAK_BF16}
    return out


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    os.makedirs(OUT, exist_ok=True)
    import jax

    print(f"device={jax.devices()[0].platform} steps={steps}",
          flush=True)
    results = {"families": [], "fact_sweep": [], "qt3d_blocks": None}

    # conv3d families: A/B the 2D decomposition
    for name in ("quadtree_3d", "ji_3dcnn"):
        for as2d in (False, True):
            r = profile_family(name, bs=16, t=5, img=224, steps=steps,
                               conv3d_as_2d=as2d)
            results["families"].append(r)
            print(f"{name} as2d={as2d}: {r['clips_per_sec']:.1f} "
                  f"clips/s, mfu={r['mfu']}", flush=True)

    # r3d (partial unfreeze is its reference regime; profile full)
    r = profile_family("resnet3d_video", bs=16, t=5, img=224,
                       steps=steps)
    results["families"].append(r)
    print(f"resnet3d_video: {r['clips_per_sec']:.1f} clips/s, "
          f"mfu={r['mfu']}", flush=True)

    # FACT batch sweep
    for bs in (8, 16, 32, 64):
        r = profile_family("fact", bs=bs, t=4, img=224, steps=steps)
        results["fact_sweep"].append(r)
        print(f"fact bs={bs}: {r['clips_per_sec']:.1f} clips/s, "
              f"mfu={r['mfu']}", flush=True)

    results["qt3d_blocks"] = profile_qt3d_blocks(steps)
    for k, v in results["qt3d_blocks"].items():
        print(f"qt3d {k}: {v['ms_per_step']:.2f} ms/step "
              f"(conv-mfu {v['analytic_conv_mfu']:.3f})", flush=True)

    with open(os.path.join(OUT, "temporal_profile.json"), "w") as f:
        json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
