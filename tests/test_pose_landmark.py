"""TPU-native pose-landmark model (models/pose) + synthetic generator.

Covers the MediaPipe-replacement tier: soft-argmax decode exactness,
forward contract, on-device synthetic rendering, train-to-improvement,
and the LandmarkExtractor protocol drop-in (the same duck type
``data/prep/still_image_dataset.py:39-85`` defines for MediaPipe).
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from surya_tpu.data import synthetic_pose as sp
from surya_tpu.features import extract_features_47
from surya_tpu.models.pose import (
    PoseLandmarkNet,
    landmark_loss,
    load_pose_params,
    neural_landmark_extractor,
    pck,
    save_pose_params,
    soft_argmax_2d,
)


def test_soft_argmax_exact_on_one_hot():
    h, w = 12, 16
    heat = np.full((1, h, w, 2), -1e9, np.float32)
    heat[0, 3, 5, 0] = 0.0   # landmark 0 at row 3, col 5
    heat[0, 9, 1, 1] = 0.0   # landmark 1 at row 9, col 1
    xy = np.asarray(soft_argmax_2d(jnp.asarray(heat))[0])
    np.testing.assert_allclose(xy[0], [(5 + 0.5) / w, (3 + 0.5) / h],
                               atol=1e-6)
    np.testing.assert_allclose(xy[1], [(1 + 0.5) / w, (9 + 0.5) / h],
                               atol=1e-6)


def test_forward_contract():
    model = PoseLandmarkNet(width=16)
    imgs = jnp.zeros((2, 64, 64, 3), jnp.float32)
    out = model.apply(
        model.init(jax.random.PRNGKey(0), imgs), imgs)
    lm = out["landmarks"]
    assert lm.shape == (2, 33, 4) and lm.dtype == jnp.float32
    assert out["heatmaps"].shape == (2, 16, 16, 33)  # stride 4
    xy, z, vis = lm[..., :2], lm[..., 2], lm[..., 3]
    assert bool(jnp.all((xy >= 0) & (xy <= 1)))
    assert bool(jnp.all((z >= -0.5) & (z <= 0.5)))
    assert bool(jnp.all((vis >= 0) & (vis <= 1)))
    assert bool(jnp.all(jnp.isfinite(lm)))


def test_renderer_lights_up_joints():
    xy = jnp.asarray(sp.TEMPLATE_XY)
    z = jnp.zeros((33,))
    img = np.asarray(sp.render_pose(xy, z, image_size=64))
    assert img.shape == (64, 64, 3)
    assert img.min() >= 0.0 and img.max() <= 1.0
    # intensity at each in-frame joint pixel should dominate background
    total = img.sum(-1)
    px = np.clip((sp.TEMPLATE_XY * 64).astype(int), 0, 63)
    joint_vals = total[px[:, 1], px[:, 0]]
    assert joint_vals.mean() > 5 * total.mean()
    # left/right colour coding: left wrist (idx 15) lands in channel 0,
    # right wrist (16) in channel 1
    lw, rw = px[15], px[16]
    assert img[lw[1], lw[0], 0] > img[lw[1], lw[0], 1]
    assert img[rw[1], rw[0], 1] > img[rw[1], rw[0], 0]


def test_pose_batch_jit_matches_eager():
    key = jax.random.PRNGKey(7)
    eager = sp.make_pose_batch(key, 3, image_size=64)
    jitted = jax.jit(
        lambda k: sp.make_pose_batch(k, 3, image_size=64))(key)
    for a, b in zip(eager, jitted):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5)
    imgs, xy, z, vis = eager
    assert imgs.shape == (3, 64, 64, 3)
    assert xy.shape == (3, 33, 2) and z.shape == (3, 33)
    assert bool(jnp.all((vis >= 0) & (vis <= 1)))


def test_augment_defaults_are_identity():
    """occlude_p=mirror_p=0 must reproduce the unaugmented batch
    bit-for-bit (same key splits, augment branch not traced)."""
    key = jax.random.PRNGKey(3)
    base = sp.make_pose_batch(key, 4, image_size=64)
    same = sp.make_pose_batch(key, 4, image_size=64,
                              occlude_p=0.0, mirror_p=0.0)
    for a, b in zip(base, same):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_augment_occlusion_blacks_a_patch_targets_unchanged():
    """occlude_p=1: every image gains an axis-aligned zero patch of
    side S/4..S/2; landmark/z/vis targets are untouched (the net must
    infer occluded joints from kinematic context)."""
    key = jax.random.PRNGKey(11)
    imgs0, xy0, z0, vis0 = sp.make_pose_batch(key, 4, image_size=64)
    imgs1, xy1, z1, vis1 = sp.make_pose_batch(key, 4, image_size=64,
                                              occlude_p=1.0)
    np.testing.assert_array_equal(np.asarray(xy1), np.asarray(xy0))
    np.testing.assert_array_equal(np.asarray(z1), np.asarray(z0))
    np.testing.assert_array_equal(np.asarray(vis1), np.asarray(vis0))
    diff = np.asarray(imgs0) != np.asarray(imgs1)
    for i in range(4):
        changed = np.argwhere(diff[i].any(axis=-1))
        assert changed.size, "no patch applied"
        (y0, x0), (y1, x1) = changed.min(0), changed.max(0)
        # Patch interior (where base was nonzero) must be exactly 0.
        assert np.all(np.asarray(imgs1)[i][diff[i]] == 0.0)
        # Changed pixels fit a square of side <= S/2 (may be clipped).
        assert y1 - y0 < 32 and x1 - x0 < 32


def test_augment_mirror_flips_image_and_x_targets():
    key = jax.random.PRNGKey(13)
    imgs0, xy0, z0, vis0 = sp.make_pose_batch(key, 4, image_size=64)
    imgs1, xy1, z1, vis1 = sp.make_pose_batch(key, 4, image_size=64,
                                              mirror_p=1.0)
    np.testing.assert_array_equal(np.asarray(imgs1),
                                  np.asarray(imgs0)[:, :, ::-1, :])
    np.testing.assert_allclose(np.asarray(xy1)[..., 0],
                               1.0 - np.asarray(xy0)[..., 0], atol=1e-7)
    np.testing.assert_array_equal(np.asarray(xy1)[..., 1],
                                  np.asarray(xy0)[..., 1])
    np.testing.assert_array_equal(np.asarray(z1), np.asarray(z0))
    np.testing.assert_array_equal(np.asarray(vis1), np.asarray(vis0))


def test_augment_probabilities_gate_per_sample():
    """At p=0.5 over a biggish batch, some samples are augmented and
    some are not (both gates are per-sample Bernoulli)."""
    key = jax.random.PRNGKey(17)
    imgs0, *_ = sp.make_pose_batch(key, 16, image_size=32)
    imgs1, *_ = sp.make_pose_batch(key, 16, image_size=32,
                                   occlude_p=0.5)
    per_sample_changed = (
        (np.asarray(imgs0) != np.asarray(imgs1)).any(axis=(1, 2, 3)))
    assert 0 < per_sample_changed.sum() < 16


def test_train_overfit_improves():
    """~60 Adam steps on 16 fixed synthetic figures: loss and PCK must
    both move decisively (SURVEY §4e tiny-train pattern)."""
    model = PoseLandmarkNet(width=16)
    imgs, xy, z, vis = jax.tree.map(
        jnp.asarray, sp.make_pose_batch(jax.random.PRNGKey(0), 16,
                                        image_size=64))
    params = model.init(jax.random.PRNGKey(1), imgs)["params"]
    tx = optax.adam(3e-3)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt):
        def loss_fn(p):
            out = model.apply({"params": p}, imgs)
            total, _ = landmark_loss(out, xy, z, vis)
            return total, out
        (loss, out), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt = tx.update(grads, opt)
        return optax.apply_updates(params, updates), opt, loss, out

    params0 = params
    first_loss = None
    for _ in range(60):
        params, opt, loss, out = step(params, opt)
        if first_loss is None:
            first_loss = float(loss)
    final_loss = float(loss)
    assert final_loss < 0.5 * first_loss, (first_loss, final_loss)

    def pck_of(p):
        out = model.apply({"params": p}, imgs)
        return float(pck(out["landmarks"][..., :2], xy, vis,
                         threshold=0.15))

    assert pck_of(params) > pck_of(params0) + 0.2


def test_neural_extractor_protocol(tmp_path):
    from PIL import Image

    model = PoseLandmarkNet(width=16)
    imgs = jnp.zeros((1, 64, 64, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), imgs)["params"]

    # round-trip the single-file artifact
    ckpt = str(tmp_path / "pose.msgpack")
    save_pose_params(ckpt, params)
    restored = load_pose_params(ckpt, model=model, image_size=64)
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(
        np.asarray(a), np.asarray(b)), params, restored)

    ext = neural_landmark_extractor(restored, model=model, image_size=64,
                                    detection_threshold=-1.0)

    # path-based call (still-image prep contract)
    rng = np.random.default_rng(0)
    path = str(tmp_path / "frame.png")
    Image.fromarray(rng.integers(0, 255, (50, 70, 3), np.uint8)).save(path)
    lm, detected = ext(path)
    assert lm.shape == (33, 4) and lm.dtype == np.float32
    assert isinstance(detected, bool) and detected

    # in-memory BGR call (video-loop contract)
    lm2, d2 = ext.process_array(rng.integers(0, 255, (48, 48, 3),
                                             np.uint8))
    assert lm2.shape == (33, 4) and d2

    # unreadable path → MediaPipe-style zeros + not-detected
    lm3, d3 = ext(str(tmp_path / "missing.png"))
    assert not d3 and not lm3.any()

    # landmarks feed the 47-feature program end to end; guard-protected
    # features (normalized distances, variance ratio) may be NaN for a
    # degenerate random-init pose — that IS the reference contract
    # (``1_prepare_still_image_dataset.py:33-113`` emits NaN on failed
    # guards) — but visibilities and angles must be finite.
    feats = np.asarray(extract_features_47(jnp.asarray(lm)))
    assert feats.shape == (47,)
    assert np.isfinite(feats[:41]).all()


def test_self_describing_artifact(tmp_path):
    """A non-default-geometry checkpoint loads with NO out-of-band
    config: ``load_pose_extractor(path)`` rebuilds the right width and
    resizes to the training image_size from the artifact's own
    metadata. Legacy flat dumps (pre-format-1) still load, width
    inferred from the stem kernel."""
    import flax.serialization

    from surya_tpu.models.pose import load_pose_extractor

    model = PoseLandmarkNet(width=16)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 96, 96, 3), jnp.float32))["params"]

    ckpt = str(tmp_path / "pose16.msgpack")
    save_pose_params(ckpt, params, image_size=96)
    ext = load_pose_extractor(ckpt, detection_threshold=-1.0)
    rng = np.random.default_rng(0)
    lm, detected = ext.process_array(
        rng.integers(0, 255, (40, 60, 3), np.uint8))
    assert lm.shape == (33, 4) and detected

    # geometry travels with the file, not the loader call
    restored = load_pose_params(ckpt)
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(
        np.asarray(a), np.asarray(b)), params, restored)

    # legacy flat artifact (what round-2 runs before the format existed
    # wrote): width still inferred, image_size falls back to 256
    legacy = str(tmp_path / "legacy.msgpack")
    with open(legacy, "wb") as f:
        f.write(flax.serialization.to_bytes(params))
    restored2 = load_pose_params(legacy, image_size=96)
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(
        np.asarray(a), np.asarray(b)), params, restored2)


def test_process_batch_matches_single():
    """The batched video path (one device dispatch per batch, padded to
    a power of two) agrees with per-frame process_array, mixed frame
    sizes included; empty input → empty output."""
    model = PoseLandmarkNet(width=16)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 64, 64, 3), jnp.float32))["params"]
    ext = neural_landmark_extractor(params, model=model, image_size=64,
                                    detection_threshold=-1.0)
    rng = np.random.default_rng(0)
    frames = [rng.integers(0, 255, (h, w, 3), np.uint8)
              for h, w in ((48, 48), (50, 70), (64, 64), (40, 60),
                           (48, 48))]                    # 5 → pads to 8
    batched = ext.process_batch(frames)
    assert len(batched) == 5
    for frame, (lm_b, det_b) in zip(frames, batched):
        lm_s, det_s = ext.process_array(frame)
        assert det_b == det_s
        np.testing.assert_allclose(lm_b, lm_s, atol=2e-2)
    assert ext.process_batch([]) == []


def test_width_must_divide_group_count():
    with pytest.raises(ValueError, match="divisible by 8"):
        PoseLandmarkNet(width=12).init(
            jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3), jnp.float32))


def test_joint_channel_chirality():
    """Side channels follow the MediaPipe topology: 1-3 are ALL left
    eye, 4-6 all right eye (the odd/even rule only starts at the ears)
    — regression for the mis-sided eye-center blobs."""
    jc = sp.JOINT_CHANNEL
    assert jc[0] == 2                                    # nose: torso ch
    assert (jc[1:4] == 0).all() and (jc[4:7] == 1).all()  # eyes
    # ears/mouth/shoulders…: odd = left, even = right
    assert all(jc[i] == (0 if i % 2 else 1) for i in range(7, 33))
    # bones agree with their joints' sides
    for (a, b), ch in zip(sp.BONES, sp.BONE_CHANNEL):
        if ch in (0, 1):
            assert jc[a] == ch or jc[b] == ch


def test_still_image_prep_mediapipe_free(tmp_path):
    """L1 prep end to end with the neural extractor: the full
    pixels→landmarks→47-features→flat-dataset path with zero external
    pose dependencies (reference requires MediaPipe,
    ``1_prepare_still_image_dataset.py:30``)."""
    import csv
    import json
    import os

    from PIL import Image

    from surya_tpu.data.prep.frame_renaming import rename_frames
    from surya_tpu.data.prep.still_image_dataset import (
        prepare_still_image_dataset,
    )

    rng = np.random.default_rng(0)
    raw = tmp_path / "raw"
    names = [f"vid_mp4-{i:05d}_jpg.rf.h{i}.jpg" for i in (1, 2, 3)]
    d = raw / "train" / "video_clip_001"
    d.mkdir(parents=True)
    for nm in names:
        Image.fromarray(rng.integers(0, 255, (32, 32, 3),
                                     np.uint8)).save(d / nm)
    renamed = str(tmp_path / "renamed")
    rename_frames(str(raw), renamed)

    label_csv = tmp_path / "labels.csv"
    with open(label_csv, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["filename", "label"])
        w.writeheader()
        for i, nm in enumerate(names):
            w.writerow({"filename": nm,
                        "label": "cobra" if i % 2 == 0 else "plank"})

    model = PoseLandmarkNet(width=16)
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 64, 64, 3), jnp.float32))["params"]
    ext = neural_landmark_extractor(params, model=model, image_size=64,
                                    detection_threshold=-1.0)

    out = str(tmp_path / "flat")
    counts = prepare_still_image_dataset(renamed, out, [str(label_csv)],
                                         extractor=ext)
    assert counts["train"] == 3
    cobra = os.path.join(out, "train", "cobra")
    imgs = [f for f in os.listdir(cobra) if f.endswith(".jpg")]
    assert len(imgs) == 2
    vec = np.load(os.path.join(cobra, imgs[0][:-4] + ".npy"))
    assert vec.shape == (47,) and np.isfinite(vec[:41]).all()
    with open(os.path.join(out, "class_feature_means.json")) as f:
        assert set(json.load(f)) == {"cobra", "plank"}


def test_video_inference_with_neural_extractor(tmp_path):
    """Live-video path (infer/video.py) with the neural landmark net:
    the complete pixels→landmarks→47-features→classifier→overlay loop
    with no MediaPipe anywhere (cv2 only for video IO). Exercises the
    extractor's process_array fast path."""
    import os

    cv2 = pytest.importorskip("cv2")

    from surya_tpu.core.config import ModelConfig
    from surya_tpu.infer.video import run_video_inference
    from surya_tpu.models import get_model

    path = str(tmp_path / "v.mp4")
    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 5,
                        (64, 64))
    rng = np.random.default_rng(0)
    for _ in range(6):
        w.write(rng.integers(0, 255, (64, 64, 3), np.uint8))
    w.release()

    pose_model = PoseLandmarkNet(width=16)
    pose_params = pose_model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 64, 64, 3), jnp.float32))["params"]
    ext = neural_landmark_extractor(pose_params, model=pose_model,
                                    image_size=64,
                                    detection_threshold=-1.0)

    cfg = ModelConfig(name="quadtree", mode="fusion", num_classes=3,
                      compute_dtype="float32", use_pallas=False)
    clf = get_model(cfg)
    variables = clf.init({"params": jax.random.key(0)},
                         jnp.zeros((1, 64, 64, 3)), jnp.zeros((1, 47)),
                         train=False)

    out = str(tmp_path / "annot.mp4")
    recs = run_video_inference(cfg, variables, path, ["a", "b", "c"],
                               output_path=out, extractor=ext,
                               batch_size=3, image_size=64)
    assert len(recs) == 6
    assert all(r["label"] in "abc" for r in recs)
    assert os.path.getsize(out) > 0


def test_detection_threshold_gates():
    """Above-threshold mean visibility required, else zeros+False."""
    model = PoseLandmarkNet(width=16)
    imgs = jnp.zeros((1, 64, 64, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), imgs)["params"]
    ext = neural_landmark_extractor(params, model=model, image_size=64,
                                    detection_threshold=1.1)  # impossible
    lm, detected = ext.process_array(
        np.zeros((32, 32, 3), np.uint8))
    assert not detected and not lm.any()


def test_class_conditional_sampler():
    """Class-conditional pose sampling (full_workflow_demo's stage-0
    generator): same class -> tight articulation cluster, different
    classes -> separated; swing_center=None reproduces the
    unconditional sampler bit-for-bit (same RNG draw order)."""
    key = jax.random.PRNGKey(3)
    a = sp.sample_pose(key)
    b = sp.sample_pose(key, swing_center=np.zeros(8, np.float32),
                       swing_spread=1.0)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))

    centers = sp.class_swing_centers(4, seed=5)
    assert centers.shape == (4, 8)
    np.testing.assert_array_equal(centers,
                                  sp.class_swing_centers(4, seed=5))

    labels = jnp.asarray([0] * 8 + [1] * 8, jnp.int32)
    imgs, xy, z, vis = sp.make_pose_class_batch(
        jax.random.PRNGKey(0), labels, centers, image_size=32,
        swing_spread=0.1)
    assert imgs.shape == (16, 32, 32, 3)
    # Compare articulation, not placement: normalize out the global
    # similarity transform (class-independent centroid + scale jitter)
    # before measuring within/across-class distances.
    xy = np.asarray(xy)
    c = xy - xy.mean(1, keepdims=True)
    c = c / np.sqrt((c ** 2).sum(-1).mean(1))[:, None, None]
    within0 = np.mean([np.abs(c[i] - c[j]).mean()
                       for i in range(8) for j in range(i + 1, 8)])
    across = np.mean([np.abs(c[i] - c[j]).mean()
                      for i in range(8) for j in range(8, 16)])
    assert across > 1.5 * within0, (within0, across)
