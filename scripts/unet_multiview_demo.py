"""Train the REAL zero123plus architecture (scaled down) on the toy
multiview-grid task — conditioning carried ONLY by reference attention.

scripts/diffusion_demo.py proved the sampling machinery with a toy
denoiser conditioned by channel-concat. This demo proves the actual
mechanism zero123plus uses: a UNet2DCondition (models/diffusion/
unet_cond.py — SD2 topology, scaled down) where the conditioning image
enters *solely* through the RefOnly reference-attention path (write
pass banks the cond image's self-attention hidden states; the read
pass appends them to K/V). If holdout grids come out right, the
banked-K/V conditioning demonstrably carries image content end to end
— the property the full-size model relies on.

Task (same as diffusion_demo): six deterministic pointwise "views" of
a random smooth tile arranged in a 3×2 grid; v-prediction training
with the trailing-spacing schedule. Per-sample timesteps (the real
UNet's time embedding is per-sample, unlike TinyDenoiser's scalar).
Coordinate channels are appended to the UNet *input* (in_channels=5)
because the view transform is grid-position-dependent; the cond pass
gets the clean tile + its own coords (the z123 pipeline noises the
cond latents per step — reference_conditioned_denoiser implements
that faithfully; the toy task trains better with clean cond, noted
here as the one deviation).

Run: python scripts/unet_multiview_demo.py [STEPS] → runs/unet_multiview_demo/
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from surya_tpu.core.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
import optax  # noqa: E402

from surya_tpu.models.diffusion import (  # noqa: E402
    EulerAncestralSchedule,
    UNet2DCondition,
    UNetConfig,
    sample,
)

sys.path.insert(0, os.path.join(os.path.dirname(
    os.path.abspath(__file__))))
from diffusion_demo import TILE, ROWS, COLS, GH, GW, make_cond, grid_of  # noqa: E402,E501

BATCH = 16
CTX_DIM = 16
OUT = "runs/unet_multiview_demo"


def coords(h, w, n):
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    c = np.stack([yy / h * 2 - 1, xx / w * 2 - 1], -1)
    return np.broadcast_to(c, (n, h, w, 2))


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 2500
    os.makedirs(OUT, exist_ok=True)
    rng = np.random.default_rng(0)

    cfg = UNetConfig(in_channels=5, out_channels=3,
                     block_out_channels=(32, 64), layers_per_block=1,
                     num_heads=(4, 4), down_has_attn=(True, True),
                     cross_attention_dim=CTX_DIM, norm_num_groups=8,
                     dtype=jnp.bfloat16)
    model = UNet2DCondition(cfg)
    # a single learned-nothing null context token: cross-attention has
    # nothing image-specific to read — conditioning must flow through
    # the reference-attention banks alone
    ctx = jnp.zeros((BATCH, 1, CTX_DIM), jnp.float32)

    train_sch = EulerAncestralSchedule.create(
        50, timestep_spacing="trailing", prediction_type="v_prediction")
    sigmas = jnp.asarray(train_sch.sigmas[:-1])
    timesteps = jnp.asarray(train_sch.timesteps)

    grid_xy = jnp.asarray(coords(GH, GW, BATCH))
    tile_xy = jnp.asarray(coords(TILE, TILE, BATCH))

    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((BATCH, GH, GW, 5)),
        jnp.zeros((BATCH,)), ctx)
    tx = optax.adam(optax.cosine_decay_schedule(2e-3, steps, 0.05))
    opt = tx.init(variables["params"])

    # pre-generate a fixed pool (1-core host: keep per-step numpy off
    # the path); sampling indices on the fly
    pool_tiles = make_cond(rng, 256)
    pool_grids = np.stack([grid_of(t) for t in pool_tiles])
    pool_t = jnp.asarray(pool_tiles)
    pool_g = jnp.asarray(pool_grids)

    @jax.jit
    def train_step(params, opt, key):
        ki, kn, kt = jax.random.split(key, 3)
        idx = jax.random.randint(ki, (BATCH,), 0, pool_t.shape[0])
        x0, tiles = pool_g[idx], pool_t[idx]
        sidx = jax.random.randint(kt, (BATCH,), 0, sigmas.shape[0])
        sig = sigmas[sidx][:, None, None, None]
        t = timesteps[sidx]
        eps = jax.random.normal(kn, x0.shape, jnp.float32)
        noisy = x0 + sig * eps
        s1 = jnp.sqrt(sig ** 2 + 1.0)
        v_target = (eps - sig * x0) / s1
        cond_in = jnp.concatenate([tiles, tile_xy], -1)

        def loss_fn(p):
            _, bank = model.apply({"params": p}, cond_in, t, ctx)
            out, _ = model.apply(
                {"params": p},
                jnp.concatenate([noisy / s1, grid_xy], -1), t, ctx,
                refs=bank)
            return jnp.mean((out - v_target) ** 2)

        loss, g = jax.value_and_grad(loss_fn)(params)
        up, opt2 = tx.update(g, opt, params)
        return optax.apply_updates(params, up), opt2, loss

    params = variables["params"]
    hist = []
    key = jax.random.PRNGKey(7)
    t0 = time.perf_counter()
    for i in range(steps):
        key, k = jax.random.split(key)
        params, opt, loss = train_step(params, opt, k)
        if i % 100 == 0 or i == steps - 1:
            hist.append({"step": i, "v_mse": round(float(loss), 5)})
            print(hist[-1], flush=True)
    wall_train = time.perf_counter() - t0

    # --- holdout sampling: full ancestral trajectory, ref-attn cond
    samp_sch = EulerAncestralSchedule.create(
        24, timestep_spacing="trailing", prediction_type="v_prediction")
    test_tiles = make_cond(np.random.default_rng(777), 4)
    tt = jnp.asarray(test_tiles)
    t_xy = jnp.asarray(coords(TILE, TILE, 4))
    g_xy = jnp.asarray(coords(GH, GW, 4))
    ctx4 = jnp.zeros((4, 1, CTX_DIM), jnp.float32)

    @jax.jit
    def gen(key):
        cond_in = jnp.concatenate([tt, t_xy], -1)

        def dn(scaled, t):
            ts = jnp.broadcast_to(t, (4,))
            _, bank = model.apply({"params": params}, cond_in, ts, ctx4)
            out, _ = model.apply(
                {"params": params},
                jnp.concatenate([scaled, g_xy], -1), ts, ctx4,
                refs=bank)
            return out

        return sample(samp_sch, dn, key, (4, GH, GW, 3))

    t0 = time.perf_counter()
    grids = np.asarray(jax.device_get(gen(jax.random.PRNGKey(1))))
    wall_sample = time.perf_counter() - t0
    target = np.stack([grid_of(t) for t in test_tiles])
    mae = float(np.mean(np.abs(np.clip(grids, -1, 1) - target)))
    base = float(np.mean(np.abs(target)))

    n_params = sum(int(np.prod(p.shape))
                   for p in jax.tree.leaves(params))
    report = {"train_steps": steps, "batch": BATCH,
              "grid": [GH, GW], "backend": jax.default_backend(),
              "unet_params": n_params,
              "wall_train_s": round(wall_train, 1),
              "wall_sample_s": round(wall_sample, 2),
              "history": hist, "holdout_grid_mae": round(mae, 4),
              "predict_zero_mae": round(base, 4),
              "conditioning": "reference-attention only (null ctx)"}
    with open(os.path.join(OUT, "unet_multiview_demo.json"), "w") as f:
        json.dump(report, f, indent=1)

    try:
        from PIL import Image

        pair = np.concatenate([grids[0], target[0]], axis=1)
        Image.fromarray(
            (np.clip((pair + 1) * 127.5, 0, 255)).astype(np.uint8)
        ).save(os.path.join(OUT, "sample_grid_vs_target.png"))
    except Exception:
        pass
    print(json.dumps({k: report[k] for k in
                      ("unet_params", "holdout_grid_mae",
                       "predict_zero_mae", "wall_train_s",
                       "wall_sample_s")}))


if __name__ == "__main__":
    main()
