"""TPU-native pose-landmark detection: the MediaPipe stand-in.

Every reference pipeline stage that consumes landmarks calls MediaPipe
Pose, an opaque host-CPU C++ graph (still-image prep
``experiment/1_prepare_still_image_dataset.py:30,222``; sequence prep
``sqn process/processing_image_sequence.py:338``; live video
``experiment/test_on_video_cnn.py:256-258``). This module makes
landmark detection a first-class TPU component in the same way
``models/segmentation/u2net.py`` did for rembg:

- ``PoseLandmarkNet``: heatmap head + differentiable soft-argmax decode
  for (x, y), a global regression head for depth z and per-landmark
  visibility — the BlazePose-style hybrid, NHWC, bf16 compute / f32
  params and heads (repo convention). GroupNorm (not BN) so the model
  is batch-size-independent and needs no mutable state: the whole
  apply is one pure function, trivially jit/pjit-able.
- ``soft_argmax_2d``: spatial softmax → coordinate expectation — the
  decode is two small matmuls, fully on-MXU, and exact for one-hot
  heatmaps (pinned by test).
- ``landmark_loss``: visibility-masked coordinate + depth regression,
  visibility BCE, and a spatial cross-entropy on the heatmaps against
  rendered gaussian targets (the aux loss that gives soft-argmax
  useful gradients when predictions start far from targets).
- ``neural_landmark_extractor``: adapts trained weights to the
  ``LandmarkExtractor`` protocol of
  ``data/prep/still_image_dataset.py:39-42`` (path → ((33,4), detected),
  plus ``process_array`` for the video loop) — a drop-in for
  ``mediapipe_extractor`` in still-image prep, sequence prep, and
  ``infer/video.py``.

Train it on the on-device synthetic generator
(``data/synthetic_pose.py``; demo artifact ``runs/pose_landmark/`` via
``scripts/pose_train_demo.py``) or any (image, 33×4) landmark dataset.
No pretrained weights ship here: MediaPipe's are not importable (TFLite
graph, different decoder), so this is a trainable replacement, not a
weight port.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax

from surya_tpu.features.landmarks import NUM_LANDMARKS


def soft_argmax_2d(heatmaps: jnp.ndarray) -> jnp.ndarray:
    """(B, h, w, K) logits → (B, K, 2) expected (x, y) in [0, 1].

    Softmax over the h·w positions, then expectation of pixel-center
    coordinates — differentiable and sub-pixel (the expectation
    interpolates between cells, so accuracy is not quantized to the
    heatmap stride).
    """
    b, h, w, k = heatmaps.shape
    probs = jax.nn.softmax(
        heatmaps.reshape(b, h * w, k).astype(jnp.float32), axis=1)
    xs = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w
    ys = (jnp.arange(h, dtype=jnp.float32) + 0.5) / h
    grid = jnp.stack(
        [jnp.tile(xs, h), jnp.repeat(ys, w)], axis=-1)  # (h*w, 2)
    return jnp.einsum("bpk,pc->bkc", probs, grid)


class PoseLandmarkNet(nn.Module):
    """Image (B,S,S,3) in [0,1] → 33 MediaPipe-convention landmarks.

    Encoder to stride 16, two-skip decoder back to stride 4 where the
    33-channel heatmap lives; z/visibility regress from the pooled
    bottleneck. S must be divisible by 16.
    """

    num_landmarks: int = NUM_LANDMARKS
    width: int = 32
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, images: jnp.ndarray) -> dict[str, jnp.ndarray]:
        if self.width % 8:
            raise ValueError(
                f"PoseLandmarkNet width must be divisible by 8 (the "
                f"GroupNorm group count), got {self.width}")

        def conv(f, name, strides=1, kernel=3):
            return nn.Conv(f, (kernel, kernel), strides=(strides, strides),
                           use_bias=False, dtype=self.dtype,
                           param_dtype=jnp.float32, name=name)

        def gn(name):
            return nn.GroupNorm(num_groups=8, dtype=self.dtype,
                                param_dtype=jnp.float32, name=name)

        w = self.width
        x = images.astype(self.dtype) - 0.5
        x = nn.relu(gn("stem_gn")(conv(w, "stem", strides=2)(x)))  # S/2

        skips = []
        for i, f in enumerate((2 * w, 4 * w, 8 * w)):       # S/4, S/8, S/16
            x = nn.relu(gn(f"down{i}_gn_a")(
                conv(f, f"down{i}_a", strides=2)(x)))
            y = nn.relu(gn(f"down{i}_gn_b")(conv(f, f"down{i}_b")(x)))
            x = x + y                                       # residual
            skips.append(x)

        bottleneck = x                                      # (B,S/16,S/16,8w)

        def up(x, skip, f, name):
            b, _, _, _ = x.shape
            x = jax.image.resize(
                x, (b, skip.shape[1], skip.shape[2], x.shape[-1]),
                method="bilinear")
            return nn.relu(gn(f"{name}_gn")(conv(f, name)(x))) + skip

        x = up(x, skips[1], 4 * w, "up0")                   # S/8
        x = up(x, skips[0], 2 * w, "up1")                   # S/4

        heatmaps = nn.Conv(
            self.num_landmarks, (1, 1), dtype=jnp.float32,
            param_dtype=jnp.float32, name="heatmap")(x.astype(jnp.float32))
        xy = soft_argmax_2d(heatmaps)                       # (B,K,2)

        g = jnp.mean(bottleneck.astype(jnp.float32), axis=(1, 2))
        g = nn.relu(nn.Dense(256, name="head_dense")(g))
        zv = nn.Dense(2 * self.num_landmarks, name="head_out")(g)
        z = 0.5 * jnp.tanh(zv[:, :self.num_landmarks])      # (B,K)
        vis_logits = zv[:, self.num_landmarks:]

        landmarks = jnp.concatenate(
            [xy, z[..., None], jax.nn.sigmoid(vis_logits)[..., None]],
            axis=-1)                                        # (B,K,4)
        return {"landmarks": landmarks, "heatmaps": heatmaps,
                "vis_logits": vis_logits}


def _gaussian_targets(xy: jnp.ndarray, h: int, w: int,
                      sigma: float = 0.02) -> jnp.ndarray:
    """(B,K,2) coords → (B, h·w, K) normalized gaussian distributions."""
    xs = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w
    ys = (jnp.arange(h, dtype=jnp.float32) + 0.5) / h
    grid = jnp.stack([jnp.tile(xs, h), jnp.repeat(ys, w)], -1)  # (hw,2)
    d2 = jnp.sum(
        (grid[None, :, None, :] - xy[:, None, :, :]) ** 2, axis=-1)
    g = jnp.exp(-d2 / (2.0 * sigma**2))
    return g / (jnp.sum(g, axis=1, keepdims=True) + 1e-8)


def landmark_loss(out: dict[str, jnp.ndarray], target_xy: jnp.ndarray,
                  target_z: jnp.ndarray, target_vis: jnp.ndarray,
                  heatmap_weight: float = 1.0) -> tuple[jnp.ndarray, dict]:
    """Visibility-masked supervision. Returns (total, parts dict).

    Coordinate/z/heatmap terms count only landmarks with target
    visibility > 0.5 (off-frame joints carry no localization signal);
    the visibility BCE is unmasked — predicting WHICH joints are
    off-frame is part of the task, mirroring MediaPipe's semantics.
    """
    lm = out["landmarks"]
    mask = (target_vis > 0.5).astype(jnp.float32)           # (B,K)
    denom = jnp.maximum(jnp.sum(mask), 1.0)

    coord = jnp.sum(
        mask * jnp.sum((lm[..., :2] - target_xy) ** 2, -1)) / denom
    zloss = jnp.sum(mask * (lm[..., 2] - target_z) ** 2) / denom
    vis_bce = jnp.mean(optax.sigmoid_binary_cross_entropy(
        out["vis_logits"], mask))

    b, h, w, k = out["heatmaps"].shape
    logp = jax.nn.log_softmax(
        out["heatmaps"].reshape(b, h * w, k).astype(jnp.float32), axis=1)
    targets = _gaussian_targets(target_xy, h, w)            # (B,hw,K)
    ce = -jnp.sum(targets * logp, axis=1)                   # (B,K)
    heat = jnp.sum(mask * ce) / denom

    total = coord + 0.5 * zloss + 0.1 * vis_bce + heatmap_weight * heat
    return total, {"coord": coord, "z": zloss, "vis_bce": vis_bce,
                   "heatmap_ce": heat}


def pck(pred_xy: jnp.ndarray, target_xy: jnp.ndarray,
        target_vis: jnp.ndarray, threshold: float = 0.1) -> jnp.ndarray:
    """PCK: fraction of visible landmarks within `threshold` (in
    normalized image units) of the target."""
    mask = (target_vis > 0.5).astype(jnp.float32)
    dist = jnp.linalg.norm(pred_xy - target_xy, axis=-1)
    hit = (dist < threshold).astype(jnp.float32)
    return jnp.sum(mask * hit) / jnp.maximum(jnp.sum(mask), 1.0)


def save_pose_params(path: str, params, image_size: int = 256) -> None:
    """Single-file msgpack artifact (flax.serialization).

    Self-describing: carries ``width`` (inferred from the stem kernel)
    and the training ``image_size`` so loaders need no out-of-band
    config to rebuild the model or size the extractor's resize.
    """
    import flax.serialization

    state = flax.serialization.to_state_dict(params)
    payload = {
        "meta": {"format": 1,
                 "width": int(np.asarray(state["stem"]["kernel"]).shape[-1]),
                 "image_size": int(image_size)},
        "params": state,
    }
    with open(path, "wb") as f:
        f.write(flax.serialization.msgpack_serialize(payload))


def _restore_artifact(path: str) -> tuple[dict, dict]:
    """Read a pose artifact → (state_dict, meta). Handles both the
    self-describing format-1 payload and legacy flat param dumps
    (meta then inferred: width from the stem kernel, image_size
    defaulted)."""
    import flax.serialization

    with open(path, "rb") as f:
        raw = flax.serialization.msgpack_restore(f.read())
    if isinstance(raw, dict) and set(raw) == {"meta", "params"}:
        return raw["params"], dict(raw["meta"])
    width = int(np.asarray(raw["stem"]["kernel"]).shape[-1])
    return raw, {"format": 0, "width": width, "image_size": 256}


def _load_artifact(path: str, model: PoseLandmarkNet | None = None,
                   image_size: int | None = None):
    """Shared restoration path → (params, model, image_size)."""
    import flax.serialization

    state, meta = _restore_artifact(path)
    model = model or PoseLandmarkNet(width=meta["width"])
    size = image_size or meta["image_size"]
    template = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, size, size, 3), jnp.float32))["params"]
    return flax.serialization.from_state_dict(template, state), model, size


def load_pose_params(path: str, model: PoseLandmarkNet | None = None,
                     image_size: int | None = None):
    """Load a ``save_pose_params`` artifact into a fresh param tree.

    ``model``/``image_size`` override the artifact's own metadata (only
    needed for legacy flat artifacts of non-default geometry)."""
    return _load_artifact(path, model, image_size)[0]


def load_pose_extractor(path: str, detection_threshold: float = 0.3,
                        image_size: int | None = None):
    """One call: artifact path → ready ``LandmarkExtractor``.

    Rebuilds the model at the artifact's own width and resizes inputs
    to its training ``image_size`` — what the ``--pose-ckpt`` CLIs use
    so a non-default-geometry checkpoint just works."""
    params, model, size = _load_artifact(path, image_size=image_size)
    return neural_landmark_extractor(
        params, model=model, image_size=size,
        detection_threshold=detection_threshold)


def neural_landmark_extractor(params, model: PoseLandmarkNet | None = None,
                              image_size: int = 256,
                              detection_threshold: float = 0.3):
    """Trained weights → a ``LandmarkExtractor`` drop-in.

    Same duck type as ``mediapipe_extractor``
    (``data/prep/still_image_dataset.py:45-85``): callable on an image
    path returning ((33,4) float32, detected: bool), with a
    ``process_array`` attribute taking an in-memory BGR uint8 frame
    (what ``infer/video.py`` feeds) and a ``process_batch`` attribute
    taking a LIST of BGR frames — one device dispatch for the whole
    batch, which matters here because (unlike host-CPU MediaPipe) each
    call is a TPU program launch and per-frame dispatch would be
    tunnel-RPC-bound. ``detected`` = mean predicted visibility above
    ``detection_threshold``, mirroring MediaPipe's no-pose → zeros
    contract (``still_image_dataset.py:71-72``).

    The jitted forward takes the weights as an ARGUMENT (not a
    closure), so the compiled program is checkpoint-independent and the
    persistent compilation cache (``core/cache.py``) hits across
    retrained ``--pose-ckpt`` files.
    """
    from PIL import Image

    model = model or PoseLandmarkNet()
    fwd = jax.jit(
        lambda p, imgs: model.apply({"params": p}, imgs)["landmarks"])

    def _decode(lm: np.ndarray) -> tuple[np.ndarray, bool]:
        detected = bool(lm[:, 3].mean() > detection_threshold)
        if not detected:
            return np.zeros((NUM_LANDMARKS, 4), np.float32), False
        return lm, True

    def _run(rgb_f32: np.ndarray) -> tuple[np.ndarray, bool]:
        return _decode(np.asarray(fwd(params, rgb_f32[None])[0],
                                  np.float32))

    def _prep(img: Image.Image) -> np.ndarray:
        img = img.convert("RGB").resize((image_size, image_size),
                                        Image.BILINEAR)
        return np.asarray(img, np.float32) / 255.0

    def process_array(img_bgr: np.ndarray):
        rgb = Image.fromarray(np.ascontiguousarray(img_bgr[..., ::-1]))
        return _run(_prep(rgb))

    def process_batch(frames_bgr) -> list[tuple[np.ndarray, bool]]:
        if not len(frames_bgr):
            return []
        batch = np.stack([
            _prep(Image.fromarray(np.ascontiguousarray(f[..., ::-1])))
            for f in frames_bgr])
        # pad the batch dim to a power of two so a video's final
        # partial batch doesn't trigger a fresh (remote) XLA compile
        n = len(batch)
        n_pad = 1 << (n - 1).bit_length()
        if n_pad != n:
            batch = np.concatenate(
                [batch, np.zeros((n_pad - n,) + batch.shape[1:],
                                 batch.dtype)])
        lms = np.asarray(fwd(params, batch)[:n], np.float32)
        return [_decode(lm) for lm in lms]

    def extract(image_path: str):
        try:
            img = Image.open(image_path)
        except OSError:
            return np.zeros((NUM_LANDMARKS, 4), np.float32), False
        return _run(_prep(img))

    extract.process_array = process_array
    extract.process_batch = process_batch
    return extract
