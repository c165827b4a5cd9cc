"""Augmentation, imputation, and disk-dataset pipeline tests."""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from surya_tpu.data.augment import (
    IMAGENET_MEAN,
    IMAGENET_STD,
    augment_batch,
    eval_preprocess,
    gaussian_blur,
    normalize,
)
from surya_tpu.data.imputation import ClassFeatureStats, compute_class_stats


# --- augment ---------------------------------------------------------------

def test_augment_shapes_and_determinism():
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.uniform(0, 1, (4, 96, 96, 3)), jnp.float32)
    k = jax.random.key(0)
    a = augment_batch(k, imgs, out_size=64)
    b = augment_batch(k, imgs, out_size=64)
    c = augment_batch(jax.random.key(1), imgs, out_size=64)
    assert a.shape == (4, 64, 64, 3)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert not np.allclose(np.asarray(a), np.asarray(c))
    assert np.all(np.isfinite(np.asarray(a)))


def test_identity_geometry_recovers_image():
    """scale_min=1, no rotation/flip/jitter/blur → resize+normalize only."""
    rng = np.random.default_rng(1)
    imgs = jnp.asarray(rng.uniform(0.2, 0.8, (2, 64, 64, 3)), jnp.float32)
    out = augment_batch(jax.random.key(0), imgs, out_size=64,
                        scale_min=1.0, hflip_prob=0.0,
                        jitter=(0.0, 0.0, 0.0, 0.0), rotation_deg=0.0,
                        blur_sigma=(1e-4, 1e-4))
    want = normalize(imgs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               atol=5e-2)


def test_hflip_deterministic():
    rng = np.random.default_rng(2)
    imgs = jnp.asarray(rng.uniform(0, 1, (2, 32, 32, 3)), jnp.float32)
    out = augment_batch(jax.random.key(0), imgs, out_size=32,
                        scale_min=1.0, hflip_prob=1.0,
                        jitter=(0.0, 0.0, 0.0, 0.0), rotation_deg=0.0,
                        blur_sigma=(1e-4, 1e-4))
    want = normalize(imgs[:, :, ::-1])
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               atol=5e-2)


def test_blur_reduces_variance():
    rng = np.random.default_rng(3)
    imgs = jnp.asarray(rng.uniform(0, 1, (2, 32, 32, 3)), jnp.float32)
    out = gaussian_blur(jax.random.key(0), imgs, sigma=(2.0, 2.0))
    assert float(jnp.var(out)) < float(jnp.var(imgs))
    # energy preserved (kernel sums to 1, edge-padded)
    assert float(jnp.mean(out)) == pytest.approx(float(jnp.mean(imgs)),
                                                 abs=5e-3)


def test_eval_preprocess_normalizes():
    imgs = jnp.ones((1, 50, 50, 3), jnp.float32) * 0.5
    out = np.asarray(eval_preprocess(imgs, out_size=32))
    want = (0.5 - np.array(IMAGENET_MEAN)) / np.array(IMAGENET_STD)
    np.testing.assert_allclose(out[0, 0, 0], want, rtol=1e-5)


# --- imputation --------------------------------------------------------------

def test_imputation_uses_own_class_mean():
    means = np.arange(6, dtype=np.float32).reshape(2, 3) * 10  # c0: 0,10,20
    stats = ClassFeatureStats(means, None, ["a", "b"])
    f = jnp.asarray([[np.nan, 1.0, np.nan], [np.nan, np.nan, 5.0]])
    labels = jnp.asarray([0, 1])
    got = np.asarray(stats.impute(f, labels))
    np.testing.assert_allclose(got, [[0, 1, 20], [30, 40, 5]])


def test_standardize():
    means = np.zeros((1, 2), np.float32)
    stds = np.asarray([[2.0, 4.0]], np.float32)
    stats = ClassFeatureStats(means, stds, ["a"])
    got = np.asarray(stats.standardize(jnp.asarray([[2.0, 4.0]]),
                                       jnp.asarray([0])))
    np.testing.assert_allclose(got, [[1.0, 1.0]], rtol=1e-4)


def test_compute_class_stats_nan_aware():
    f = np.asarray([[1.0, np.nan], [3.0, 4.0], [np.nan, 8.0]], np.float32)
    labels = np.asarray([0, 0, 1])
    means, stds = compute_class_stats(f, labels, 2)
    np.testing.assert_allclose(means[0], [2.0, 4.0])
    np.testing.assert_allclose(means[1], [0.0, 8.0])


# --- disk dataset -------------------------------------------------------------
# (the disk_dataset fixture lives in conftest.py — shared with
# tests/test_packed.py)


def test_disk_source_end_to_end(disk_dataset, mesh8):
    from surya_tpu.core.config import Config, DataConfig, ModelConfig, TrainConfig
    from surya_tpu.core.metrics import MetricsLogger
    from surya_tpu.data.dataset import DiskDataSource
    from surya_tpu.train import train_and_evaluate

    dcfg = DataConfig(data_root=disk_dataset, batch_size=8, image_size=32)
    data = DiskDataSource(dcfg, staging_size=48)
    assert data.num_classes == 2
    assert data.class_names == ["cobra", "plank"]

    imgs, feats, labels = next(iter(data.train_batches(0)))
    assert imgs.shape == (8, 48, 48, 3) and imgs.dtype == np.uint8
    assert feats.shape == (8, 47)

    # device transform: augmented train batch + imputed features
    out = data.device_transform("train", jax.random.key(0),
                                (imgs, feats, labels))
    assert out[0].shape == (8, 32, 32, 3)
    assert np.all(np.isfinite(np.asarray(out[1])))

    cfg = Config(model=ModelConfig(name="quadtree", num_classes=2,
                                   compute_dtype="float32",
                                   use_pallas=False, freeze_backbone=True),
                 data=dcfg,
                 train=TrainConfig(epochs=1, lr=1e-3, seed=0))
    summary = train_and_evaluate(cfg, data, mesh=mesh8,
                                 logger=MetricsLogger(echo=False),
                                 checkpoints=False)
    assert "test" in summary
    assert np.isfinite(summary["history"][0]["val_loss"])


def test_native_decoder_if_available(tmp_path):
    from PIL import Image

    from surya_tpu import native

    if not native.available():
        pytest.skip("no native toolchain")
    rng = np.random.default_rng(0)
    paths = []
    for i in range(4):
        p = str(tmp_path / f"i{i}.jpg")
        Image.fromarray(rng.integers(0, 255, (40, 60, 3),
                                     np.uint8)).save(p, quality=95)
        paths.append(p)
    paths.append(str(tmp_path / "missing.jpg"))
    out, ok = native.decode_batch(paths, 32)
    assert out.shape == (5, 32, 32, 3) and ok == 4
    assert out[-1].sum() == 0  # failed slot zero-filled
    # pixel sanity vs PIL (different bilinear filters: loose bound)
    with Image.open(paths[0]) as im:
        ref = np.asarray(im.convert("RGB").resize((32, 32),
                                                  Image.BILINEAR))
    assert np.mean(np.abs(ref.astype(int) - out[0].astype(int))) < 40


def test_native_decoder_dct_scaled_path(tmp_path):
    """Sources much larger than the staging size take the DCT-scaled
    decode (power-of-two scale_denom — decode.cpp) and must still land
    within the loose PIL-parity bound of the unscaled path."""
    from PIL import Image

    from surya_tpu import native

    if not native.available():
        pytest.skip("no native toolchain")
    # 512x768 -> 32 triggers scale_denom=8 (both dims /8 still >= 32)
    yy, xx = np.mgrid[0:512, 0:768]
    img = np.stack([(yy // 2) % 256, (xx // 3) % 256,
                    ((yy + xx) // 4) % 256], -1).astype(np.uint8)
    p = str(tmp_path / "big.jpg")
    Image.fromarray(img).save(p, quality=95)
    out, ok = native.decode_batch([p], 32)
    assert ok == 1 and out.shape == (1, 32, 32, 3)
    with Image.open(p) as im:
        ref = np.asarray(im.convert("RGB").resize((32, 32),
                                                  Image.BILINEAR))
    assert np.mean(np.abs(ref.astype(int) - out[0].astype(int))) < 40


def test_disk_loader_surfaces_worker_errors(disk_dataset):
    """A corrupt .npy must raise in the consumer, not deadlock."""
    from surya_tpu.core.config import DataConfig
    from surya_tpu.data.dataset import DiskDataSource

    src = DiskDataSource(DataConfig(data_root=disk_dataset, batch_size=4,
                                    image_size=32), staging_size=48)
    # corrupt one feature file
    bad = src.index["train"][1][0]
    with open(bad, "wb") as f:
        f.write(b"not-a-npy")
    with pytest.raises(Exception):
        for _ in src._batches("train", np.arange(4), 4):
            pass


def test_split_class_mismatch_raises(disk_dataset):
    """A split whose class dirs differ from train's must fail loudly —
    labels index the split's OWN sorted dirs, so a missing class dir
    silently shifts every later label (review regression)."""
    import shutil

    from surya_tpu.core.config import DataConfig
    from surya_tpu.data.dataset import DiskDataSource

    shutil.rmtree(os.path.join(disk_dataset, "test", "cobra"))
    with pytest.raises(ValueError, match="class dirs"):
        DiskDataSource(DataConfig(data_root=disk_dataset, batch_size=4),
                       use_native=False)


def test_stats_aligned_to_reorders_and_raises():
    from surya_tpu.data.imputation import ClassFeatureStats

    means = np.array([[1.0, 2.0], [3.0, 4.0]], np.float32)
    stats = ClassFeatureStats(means, None, ["a", "b"],
                              feature_names=["f0", "f1"])
    flipped = stats.aligned_to(["b", "a"])
    np.testing.assert_array_equal(np.asarray(flipped.means),
                                  means[[1, 0]])
    assert stats.aligned_to(["a", "b"]) is stats  # no-op fast path
    with pytest.raises(ValueError, match="missing"):
        stats.aligned_to(["a", "c"])


def test_native_decode_failure_falls_back_to_pil_error(disk_dataset):
    """A corrupt JPEG must raise with the file's name (PIL fallback),
    not silently train on a zero-filled black frame (review
    regression: the native n_ok count was discarded)."""
    from surya_tpu import native
    from surya_tpu.core.config import DataConfig
    from surya_tpu.data.dataset import DiskDataSource

    if not native.available():
        pytest.skip("no native toolchain")
    src = DiskDataSource(DataConfig(data_root=disk_dataset, batch_size=4),
                         use_native=True)
    bad = src.index["train"][0][0]
    with open(bad, "wb") as f:
        f.write(b"\xff\xd8\xff\xe0 not a real jpeg")
    with pytest.raises(Exception):
        src._load_batch("train", np.arange(4))
