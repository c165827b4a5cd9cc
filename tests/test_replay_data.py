"""Tests for the reference-replay dataset generators (data/replay.py).

The replay campaign's evidence rests on the generator's structural
claims: cue disjointness (image ↔ q, features ↔ b), the calibrated
numeric-bit Bayes gap, flip-safety of the spatial cue, and the
zero-positional-leak property of the temporal windows.
"""

import numpy as np
import pytest

from surya_tpu.data.replay import (
    bayes_bit_error,
    make_replay_spatial,
    make_replay_temporal,
)

INFO_DIMS = np.random.default_rng(77).choice(47, size=4, replace=False)


def test_spatial_shapes_balance_determinism():
    imgs, feats, labels = make_replay_spatial(per_class=6, image_size=96,
                                              seed=3)
    assert imgs.shape == (48, 96, 96, 3) and imgs.dtype == np.uint8
    assert feats.shape == (48, 47) and feats.dtype == np.float32
    assert np.bincount(labels, minlength=8).tolist() == [6] * 8
    i2, f2, l2 = make_replay_spatial(per_class=6, image_size=96, seed=3)
    assert np.array_equal(imgs, i2) and np.array_equal(feats, f2)
    assert np.array_equal(labels, l2)


def test_feature_bit_bayes_gap():
    """Oracle linear readout of the bit lands near the analytic Bayes
    error — the ambiguity is real (not ~0) and bounded (not ~50%)."""
    _, feats, labels = make_replay_spatial(per_class=192, image_size=32,
                                           seed=11)
    pred = (feats[:, INFO_DIMS].sum(1) > 0).astype(labels.dtype)
    err = float((pred != labels % 2).mean())
    analytic = bayes_bit_error()
    assert 0.5 * analytic < err < 2.5 * analytic, (err, analytic)


def test_features_carry_no_quadrant_info():
    """Class centers over q (at fixed b) coincide: features are blind
    to the image cue by construction."""
    _, feats, labels = make_replay_spatial(per_class=96, image_size=32,
                                           seed=5)
    for b in (0, 1):
        centers = [feats[(labels % 2 == b) & (labels // 2 == q)].mean(0)
                   for q in range(4)]
        # max-|Δmean| over 47 dims × 3 pairs at n=96/unit noise: ~3σ of
        # the mean-difference (σ≈0.14) ⇒ well under the 1.55 signal
        spread = max(np.abs(c - centers[0]).max() for c in centers[1:])
        assert spread < 0.8, spread  # sampling noise only


def test_spatial_cue_survives_real_augmentation():
    """The class-determining cues (vertical half + texture frequency)
    stay recoverable through the REAL train-time augmentation pipeline
    (hflip + RandomResizedCrop(0.8-1.0) + ±10° rotation,
    data/augment.py mirroring experiment/dataloader_cnn.py:31-46) —
    the design-principle-4 claim the campaign's evidence rests on.

    High-contrast samples (amp_pow→0) isolate the geometric question
    from the designed Bayes ambiguity (invisible-patch samples)."""
    import jax
    import jax.numpy as jnp

    from surya_tpu.data.augment import augment_batch

    h = 224
    imgs, _, labels = make_replay_spatial(
        per_class=12, image_size=h, seed=7, amp_hi=0.9, amp_pow=0.01)
    n = len(labels)
    aug = np.asarray(augment_batch(
        jax.random.PRNGKey(0),
        jnp.asarray(imgs, jnp.float32) / 255.0, out_size=h))

    row_true = (labels // 2) // 2          # 0 = top half, 1 = bottom
    tex_true = (labels // 2) % 2           # 0 = fine,     1 = coarse
    row_pred = np.zeros(n, np.int32)
    grad = np.zeros(n, np.float32)
    for i in range(n):
        g = aug[i, :, :, 0]
        # localize the patch: smoothed per-row deviation profile
        dev = np.abs(g - g.mean()).mean(axis=1)
        cy = np.argmax(np.convolve(dev, np.ones(h // 4), mode="same"))
        row_pred[i] = int(cy >= h // 2)
        # texture frequency inside the located patch: fine cells have
        # far more horizontal-gradient energy than coarse cells
        y0 = int(np.clip(cy - h // 8, 0, h - h // 4))
        band = g[y0:y0 + h // 4]
        grad[i] = np.abs(np.diff(band, axis=1)).mean()

    row_acc = float((row_pred == row_true).mean())
    assert row_acc > 0.9, row_acc
    # single-threshold separability of the frequency cue post-aug
    thr = np.median(grad)
    tex_acc = float(((grad < thr).astype(np.int32) == tex_true).mean())
    tex_acc = max(tex_acc, 1 - tex_acc)
    assert tex_acc > 0.85, tex_acc


def test_temporal_shapes_and_truncation_compat():
    seqs, fseq, labels = make_replay_temporal(per_class=3, image_size=64,
                                              seq_len=5, seed=2)
    assert seqs.shape == (24, 5, 64, 64, 3) and seqs.dtype == np.uint8
    assert fseq.shape == (24, 5, 47)
    # first-4-frame truncation (cnn-lstm/fact, T=4) still contains
    # motion: consecutive frames differ
    assert (seqs[:, 0] != seqs[:, 3]).any()


def test_temporal_no_per_frame_position_leak():
    """For every frame index, the patch-center marginal distribution is
    identical (uniform over the wrap band) for up vs down windows —
    per-frame GAP features cannot carry direction."""
    h, t, pc = 96, 5, 160
    seqs, _, labels = make_replay_temporal(
        per_class=pc, image_size=h, seq_len=t, seed=13, amp_hi=0.9,
        amp_pow=0.01)  # near-constant high contrast for localization
    direction = (labels // 2) // 2
    centers = np.zeros((len(labels), t))
    for i in range(len(labels)):
        for ti in range(t):
            g = seqs[i, ti, :, :, 0].astype(np.float32)
            dev = np.abs(g - g.mean()).mean(axis=1)
            centers[i, ti] = np.argmax(np.convolve(
                dev, np.ones(h // 4), mode="same"))
    for ti in range(t):
        up = centers[direction == 0, ti]
        down = centers[direction == 1, ti]
        # same band, same mean to within a few pixels
        assert abs(up.mean() - down.mean()) < 0.08 * h, (
            ti, up.mean(), down.mean())


@pytest.mark.parametrize("direction", [0, 1])
def test_temporal_motion_direction_encoded(direction):
    """Frame-to-frame displacement sign matches the class direction
    (modulo the single wrap jump per window)."""
    h = 96
    seqs, _, labels = make_replay_temporal(
        per_class=12, image_size=h, seq_len=5, seed=17, amp_hi=0.9,
        amp_pow=0.01)
    sel = np.where(((labels // 2) // 2) == direction)[0][:8]
    for i in sel:
        cys = []
        for ti in range(5):
            g = seqs[i, ti, :, :, 0].astype(np.float32)
            dev = np.abs(g - g.mean()).mean(axis=1)
            cys.append(int(np.argmax(np.convolve(
                dev, np.ones(h // 4), mode="same"))))
        deltas = np.diff(cys)
        moved = deltas[np.abs(deltas) < h // 3]  # drop the wrap jump
        if len(moved):
            sign = -1 if direction == 0 else 1
            assert (np.sign(moved) == sign).mean() > 0.7, (cys, deltas)
