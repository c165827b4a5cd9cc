"""TPU-native U²-Net background-removal tier
(surya_tpu/models/segmentation/u2net.py).

The reference's background stage runs rembg/onnxruntime on the host
(``Background_remove/batch_remove_background.py:114``); here the same
U²-Net is a first-class Flax model. These tests pin:

- torch↔flax logit parity through ``import_u2net`` (the same
  state_dict-naming contract the published ``.pth``/onnx weights use),
  including the ceil-mode pooling path (non-power-of-two input);
- the deep-supervision loss is finite and trainable;
- the rembg-semantics matting helper and its integration into
  ``augmentgen.background.process_pipeline``.
"""

import numpy as np
import pytest


def _tree_max_err(a, b):
    return float(np.max(np.abs(np.asarray(a) - np.asarray(b))))


def test_u2netp_torch_flax_equivalence():
    import torch

    from surya_tpu.models.segmentation import U2Net, import_u2net
    from tests.torch_mirrors import MirrorU2NetP, randomize_bn_stats

    torch.manual_seed(0)
    tm = MirrorU2NetP()
    randomize_bn_stats(tm, seed=1)
    tm.eval()

    variables = import_u2net(tm.state_dict(), variant="u2netp")
    model = U2Net(variant="u2netp")

    rng = np.random.default_rng(2)
    # 100x84 exercises ceil-mode pooling (odd sizes at several levels)
    x = rng.normal(size=(2, 100, 84, 3)).astype(np.float32)
    with torch.no_grad():
        touts = tm(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    fused, sides = model.apply(variables, x, train=False)

    jouts = [fused] + sides
    assert len(touts) == len(jouts) == 7
    for t, j in zip(touts, jouts):
        err = _tree_max_err(t.numpy().transpose(0, 2, 3, 1), j)
        assert err < 2e-4, err


def test_u2net_full_torch_flax_equivalence():
    """Full 'u2net' channel spec (the onnx rembg defaults to) through
    the same importer."""
    import torch

    from surya_tpu.models.segmentation import U2Net, import_u2net
    from tests.torch_mirrors import MirrorU2Net, randomize_bn_stats

    torch.manual_seed(3)
    tm = MirrorU2Net()
    randomize_bn_stats(tm, seed=4)
    tm.eval()
    variables = import_u2net(tm.state_dict(), variant="u2net")
    model = U2Net(variant="u2net")

    x = np.random.default_rng(5).normal(
        size=(1, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        touts = tm(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    fused, sides = model.apply(variables, x, train=False)
    for t, j in zip(touts, [fused] + sides, strict=True):
        err = _tree_max_err(t.numpy().transpose(0, 2, 3, 1), j)
        assert err < 5e-4, err


def test_u2net_full_variant_shapes_and_probabilities():
    import jax
    import jax.numpy as jnp

    from surya_tpu.models.segmentation import U2Net

    model = U2Net(variant="u2net")
    x = jnp.zeros((1, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    fused, sides = model.apply(variables, x, train=False)
    assert fused.shape == (1, 64, 64, 1)
    assert len(sides) == 6
    assert all(s.shape == (1, 64, 64, 1) for s in sides)
    allp = np.concatenate([np.asarray(fused)]
                          + [np.asarray(s) for s in sides])
    assert (allp >= 0).all() and (allp <= 1).all()


def test_u2net_loss_trains():
    import jax
    import jax.numpy as jnp
    import optax

    from surya_tpu.models.segmentation import U2Net, u2net_loss

    model = U2Net(variant="u2netp")
    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (2, 32, 32, 3))
    target = (jax.random.uniform(jax.random.PRNGKey(1), (2, 32, 32, 1))
              > 0.5).astype(jnp.float32)
    variables = model.init(key, x, train=False)
    params, stats = variables["params"], variables["batch_stats"]

    def loss_fn(p, s):
        (fused, sides), new = model.apply(
            {"params": p, "batch_stats": s}, x, train=True,
            mutable=["batch_stats"])
        return u2net_loss(fused, sides, target), new["batch_stats"]

    tx = optax.adam(1e-3)
    opt = tx.init(params)
    losses = []
    for _ in range(3):
        (loss, stats), g = jax.value_and_grad(
            loss_fn, has_aux=True)(params, stats)
        up, opt = tx.update(g, opt, params)
        params = optax.apply_updates(params, up)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_u2net_remove_fn_and_pipeline(tmp_path):
    """End-to-end: the TPU-native remover plugs into the reference's
    batch background-removal flow and emits RGBA PNGs."""
    from PIL import Image

    from surya_tpu.augmentgen.background import (
        process_pipeline,
        u2net_remove_fn,
    )
    from surya_tpu.data.prep.frame_renaming import rename_frames

    rng = np.random.default_rng(0)
    raw = tmp_path / "raw" / "train" / "clip_a"
    raw.mkdir(parents=True)
    for nm in ["vidA-00001_jpg.rf.x.jpg", "vidA-00002_jpg.rf.y.jpg"]:
        Image.fromarray(rng.integers(0, 255, (24, 20, 3),
                                     np.uint8)).save(raw / nm)
    renamed = str(tmp_path / "renamed")
    rename_frames(str(tmp_path / "raw"), renamed)

    import csv

    labels_csv = tmp_path / "labels.csv"
    with open(labels_csv, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["filename", "label"])
        w.writeheader()
        for nm in ["vidA-00001_jpg.rf.x.jpg", "vidA-00002_jpg.rf.y.jpg"]:
            w.writerow({"filename": nm, "label": "cobra"})

    # small model input keeps the CPU test fast; semantics identical
    remove = u2net_remove_fn(size=64)
    out = str(tmp_path / "clean")
    r = process_pipeline(renamed, [str(labels_csv)], out,
                         remove_fn=remove)
    assert r["train"]["done"] == 2
    outs = sorted((tmp_path / "clean" / "train" / "cobra").iterdir())
    assert len(outs) == 2
    with Image.open(outs[0]) as im:
        assert im.mode == "RGBA"
        a = np.asarray(im)[..., 3]
    assert a.shape == (24, 20)
    assert a.min() >= 0 and a.max() <= 255


def test_saliency_fn_jits_once_shapes():
    import jax

    from surya_tpu.models.segmentation import U2Net, saliency_fn

    model = U2Net(variant="u2netp")
    variables = model.init(jax.random.PRNGKey(0),
                           np.zeros((1, 32, 32, 3), np.float32),
                           train=False)
    fn = saliency_fn(model, variables, size=32)
    img = np.random.default_rng(0).integers(
        0, 255, (50, 40, 3), np.uint8)
    m = np.asarray(fn(img))
    assert m.shape == (50, 40)
    assert np.isfinite(m).all()
    assert m.min() >= 0.0 and m.max() <= 1.0 + 1e-6
