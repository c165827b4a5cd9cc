"""Train the diffusion scaffold to generate real (toy) multiview grids.

The reference's Zero123-Plus stage turns one clean frame into a 3×2
grid of novel views (``Zero123/batch_aug.py:20-45``). The pretrained
UNet can't be fetched here, so this demo proves the TPU-native
sampling path (models/diffusion/) produces *meaningful conditional
generations*, not just noise: TinyDenoiser is trained with
v-prediction to denoise grids whose six tiles are six deterministic
pointwise "views" of the conditioning image (identity / inverted /
channel-rolled / grayscale / darkened / brightened). After training,
``sample()``'s fused lax.scan trajectory reconstructs the correct
six-view grid for held-out conditioning images.

v-target in the karras/sigma parameterization used by the scheduler:
noisy = x0 + sigma·eps, model input = noisy/sqrt(sigma²+1), and
v = (eps − sigma·x0)/sqrt(sigma²+1)  (inverting
EulerAncestralSchedule.pred_original for x = x0 + sigma·eps).

Run: python scripts/diffusion_demo.py [STEPS] → runs/diffusion_demo/
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
    TinyDenoiser,
    sample,
)

TILE, ROWS, COLS = 16, 3, 2
GH, GW = ROWS * TILE, COLS * TILE
BATCH = 16
OUT = "runs/diffusion_demo"


def make_cond(rng: np.random.Generator, n: int) -> np.ndarray:
    """Random smooth conditioning tiles in [-1, 1]: linear gradient +
    a soft disc, per channel."""
    yy, xx = np.mgrid[0:TILE, 0:TILE].astype(np.float32) / TILE
    out = np.empty((n, TILE, TILE, 3), np.float32)
    for i in range(n):
        g = (rng.uniform(-1, 1) * yy + rng.uniform(-1, 1) * xx)[..., None]
        cy, cx, r = rng.uniform(0.2, 0.8, 2).tolist() + [rng.uniform(0.15, 0.4)]
        d = np.sqrt((yy - cy) ** 2 + (xx - cx) ** 2)
        disc = np.exp(-(d / r) ** 2)[..., None]
        out[i] = np.clip(g * rng.uniform(0.3, 1.0, 3)
                         + disc * rng.uniform(-1, 1, 3), -1, 1)
    return out


def views_of(tile: np.ndarray) -> list[np.ndarray]:
    """Six deterministic pointwise 'views' (values in [-1,1])."""
    return [tile,
            -tile,
            tile[..., [1, 2, 0]],
            np.repeat(tile.mean(-1, keepdims=True), 3, -1),
            0.5 * tile,
            np.clip(tile + 0.3, -1, 1)]


def grid_of(tile: np.ndarray) -> np.ndarray:
    vs = views_of(tile)
    rows = [np.concatenate(vs[r * COLS:(r + 1) * COLS], axis=1)
            for r in range(ROWS)]
    return np.concatenate(rows, axis=0)


def cond_full(tiles: np.ndarray) -> np.ndarray:
    """Conditioning fed to the denoiser: the clean tile tiled across
    the grid + 2 normalized coordinate channels (the per-tile view
    transforms are position-dependent, which a conv net can only
    express given positional input)."""
    n = tiles.shape[0]
    tiled = np.tile(tiles, (1, ROWS, COLS, 1))
    yy, xx = np.mgrid[0:GH, 0:GW].astype(np.float32)
    coords = np.stack([yy / GH * 2 - 1, xx / GW * 2 - 1], -1)
    return np.concatenate(
        [tiled, np.broadcast_to(coords, (n, GH, GW, 2))], -1)


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 6000
    os.makedirs(OUT, exist_ok=True)
    rng = np.random.default_rng(0)

    train_sch = EulerAncestralSchedule.create(
        50, timestep_spacing="trailing", prediction_type="v_prediction")
    sigmas = np.asarray(train_sch.sigmas[:-1])  # 50 positive sigmas
    timesteps = np.asarray(train_sch.timesteps)

    model = TinyDenoiser(features=48)
    c0 = cond_full(make_cond(rng, BATCH))
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((BATCH, GH, GW, 3)),
                           jnp.float32(0.0), jnp.asarray(c0))
    tx = optax.adam(optax.cosine_decay_schedule(2e-3, steps, 0.05))
    opt = tx.init(variables)

    @jax.jit
    def train_step(variables, opt, x0, cond, eps, idx):
        # one shared noise level per step (TinyDenoiser's t-embedding
        # is scalar); successive steps cover the sigma range
        sig = jnp.asarray(sigmas)[idx]
        t = jnp.asarray(timesteps)[idx]
        noisy = x0 + sig * eps
        s1 = jnp.sqrt(sig ** 2 + 1.0)
        v_target = (eps - sig * x0) / s1

        def loss_fn(p):
            out = model.apply(p, noisy / s1, t, cond)
            return jnp.mean((out - v_target) ** 2)

        loss, g = jax.value_and_grad(loss_fn)(variables)
        up, opt2 = tx.update(g, opt, variables)
        return optax.apply_updates(variables, up), opt2, loss

    hist = []
    t0 = time.perf_counter()
    for i in range(steps):
        tiles = make_cond(rng, BATCH)
        x0 = np.stack([grid_of(t) for t in tiles])
        cond = cond_full(tiles)
        eps = rng.normal(size=x0.shape).astype(np.float32)
        idx = np.int32(rng.integers(0, len(sigmas)))
        variables, opt, loss = train_step(
            variables, opt, jnp.asarray(x0), jnp.asarray(cond),
            jnp.asarray(eps), jnp.asarray(idx))
        if i % 50 == 0 or i == steps - 1:
            hist.append({"step": i, "v_mse": round(float(loss), 5)})
            print(hist[-1])
    wall_train = time.perf_counter() - t0

    # --- sample held-out grids through the full ancestral trajectory
    samp_sch = EulerAncestralSchedule.create(
        24, timestep_spacing="trailing", prediction_type="v_prediction")
    test_tiles = make_cond(np.random.default_rng(777), 4)
    cond = jnp.asarray(cond_full(test_tiles))

    @jax.jit
    def gen(cond, key):
        dn = lambda scaled, t: model.apply(  # noqa: E731
            variables, scaled, t, cond)
        return sample(samp_sch, dn, key, (4, GH, GW, 3))

    t0 = time.perf_counter()
    grids = np.asarray(jax.device_get(gen(cond, jax.random.PRNGKey(1))))
    wall_sample = time.perf_counter() - t0
    target = np.stack([grid_of(t) for t in test_tiles])
    mae = float(np.mean(np.abs(np.clip(grids, -1, 1) - target)))
    base = float(np.mean(np.abs(target)))  # predict-zero baseline

    report = {"train_steps": steps, "batch": BATCH,
              "grid": [GH, GW], "backend": jax.default_backend(),
              "wall_train_s": round(wall_train, 1),
              "wall_sample_s": round(wall_sample, 2),
              "history": hist, "holdout_grid_mae": round(mae, 4),
              "predict_zero_mae": round(base, 4)}
    with open(os.path.join(OUT, "diffusion_demo.json"), "w") as f:
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
                      ("holdout_grid_mae", "predict_zero_mae",
                       "wall_train_s", "wall_sample_s")}))


if __name__ == "__main__":
    main()
