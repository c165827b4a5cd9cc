"""On-device synthetic pose dataset: articulated stick figures + labels.

Supports training the TPU-native pose-landmark model
(``surya_tpu.models.pose``) without MediaPipe or a real pose dataset
(no network egress in this environment). The reference's landmark
source is MediaPipe Pose (``experiment/1_prepare_still_image_dataset.py:30``,
``:222``); this module provides ground truth in the same 33-landmark
topology (``surya_tpu.features.landmarks``) so a trained network can
stand in for it end to end.

TPU-first design: both the pose sampler and the renderer are pure
jax — ``make_pose_batch`` is one jittable program (sample → articulate
→ render), so training data is synthesized ON DEVICE each step; the
host feeds nothing but a PRNG key. Rendering is vectorized
point-to-segment distance over the full pixel grid (one (P, K) map per
figure — elementwise + two small matmuls, no scatter).

Left/right disambiguation: a monochrome stick figure is chirally
ambiguous, so bones are colour-coded by side (left limbs → channel 0,
right → channel 1, torso/face → channel 2) — the standard trick used
by synthetic-pose pretraining pipelines. Depth is encoded by intensity
(nearer joints brighter), making z learnable from pixels.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from surya_tpu.features import landmarks as L

# Canonical 33-landmark template, MediaPipe topology/order, normalized
# image coords (x right, y DOWN), front-facing: the subject's LEFT side
# appears on the image's right (x > 0.5), matching what MediaPipe
# reports for a camera-facing person.
_T = {
    0: (0.50, 0.18),                                    # nose
    1: (0.52, 0.16), 2: (0.535, 0.16), 3: (0.55, 0.16),  # left eye i/c/o
    4: (0.48, 0.16), 5: (0.465, 0.16), 6: (0.45, 0.16),  # right eye i/c/o
    7: (0.57, 0.17), 8: (0.43, 0.17),                   # ears L/R
    9: (0.52, 0.20), 10: (0.48, 0.20),                  # mouth L/R
    11: (0.60, 0.30), 12: (0.40, 0.30),                 # shoulders
    13: (0.66, 0.42), 14: (0.34, 0.42),                 # elbows
    15: (0.70, 0.54), 16: (0.30, 0.54),                 # wrists
    17: (0.72, 0.585), 18: (0.28, 0.585),               # pinkies
    19: (0.715, 0.59), 20: (0.285, 0.59),               # index fingers
    21: (0.705, 0.575), 22: (0.295, 0.575),             # thumbs
    23: (0.56, 0.55), 24: (0.44, 0.55),                 # hips
    25: (0.57, 0.72), 26: (0.43, 0.72),                 # knees
    27: (0.57, 0.88), 28: (0.43, 0.88),                 # ankles
    29: (0.575, 0.915), 30: (0.425, 0.915),             # heels
    31: (0.60, 0.935), 32: (0.40, 0.935),               # foot index
}
TEMPLATE_XY = np.asarray([_T[i] for i in range(L.NUM_LANDMARKS)],
                         np.float32)

# (bones, channel): 0 = left limbs, 1 = right limbs, 2 = torso/face.
_BONE_SPEC = (
    # face
    ((0, 2), 2), ((2, 7), 2), ((0, 5), 2), ((5, 8), 2), ((9, 10), 2),
    # torso box
    ((11, 12), 2), ((11, 23), 2), ((12, 24), 2), ((23, 24), 2),
    # left arm + hand
    ((11, 13), 0), ((13, 15), 0), ((15, 17), 0), ((15, 19), 0),
    ((15, 21), 0),
    # right arm + hand
    ((12, 14), 1), ((14, 16), 1), ((16, 18), 1), ((16, 20), 1),
    ((16, 22), 1),
    # left leg + foot
    ((23, 25), 0), ((25, 27), 0), ((27, 29), 0), ((29, 31), 0),
    ((27, 31), 0),
    # right leg + foot
    ((24, 26), 1), ((26, 28), 1), ((28, 30), 1), ((30, 32), 1),
    ((28, 32), 1),
)
BONES = np.asarray([b for b, _ in _BONE_SPEC], np.int32)        # (K, 2)
BONE_CHANNEL = np.asarray([c for _, c in _BONE_SPEC], np.int32)  # (K,)

# Joint blob channel by side. From landmark 7 (ears) on, MediaPipe
# numbering alternates odd=left / even=right; the eye landmarks don't
# (1-3 are ALL left eye inner/center/outer, 4-6 all right eye), and the
# midline nose (0) gets the torso channel.
JOINT_CHANNEL = np.asarray(
    [2]
    + [0] * 3 + [1] * 3                                  # eyes L, R
    + [0 if i % 2 == 1 else 1 for i in range(7, L.NUM_LANDMARKS)],
    np.int32)

# Articulation chains: (pivot, moved landmark indices). Rotating each
# chain about its pivot produces kinematically consistent limb poses
# (the distal chain follows the proximal rotation because chains are
# applied proximal-first).
_CHAINS = (
    (11, (13, 15, 17, 19, 21)),   # left arm about shoulder
    (13, (15, 17, 19, 21)),       # left forearm about elbow
    (12, (14, 16, 18, 20, 22)),   # right arm about shoulder
    (14, (16, 18, 20, 22)),       # right forearm about elbow
    (23, (25, 27, 29, 31)),       # left leg about hip
    (25, (27, 29, 31)),           # left shank about knee
    (24, (26, 28, 30, 32)),       # right leg about hip
    (26, (28, 30, 32)),           # right shank about knee
)
_CHAIN_PIVOTS = np.asarray([p for p, _ in _CHAINS], np.int32)
_CHAIN_MASKS = np.zeros((len(_CHAINS), L.NUM_LANDMARKS), np.float32)
for _ci, (_, _moved) in enumerate(_CHAINS):
    _CHAIN_MASKS[_ci, list(_moved)] = 1.0
# Max swing per chain (radians): shoulders/hips wide, distal smaller.
_CHAIN_RANGE = np.asarray([1.2, 1.0, 1.2, 1.0, 0.6, 0.7, 0.6, 0.7],
                          np.float32)


def _rot2(theta):
    c, s = jnp.cos(theta), jnp.sin(theta)
    return jnp.array([[c, -s], [s, c]], jnp.float32)


def articulate(swings: jax.Array) -> jax.Array:
    """Deterministic forward kinematics: (8,) chain angles → (33,2) xy.

    The articulation half of :func:`sample_pose`, factored out so a
    pose identity (its joint angles) can be rendered under SEVERAL
    camera transforms — the oracle novel-view generator behind the
    augmentation-value study (the synthetic stand-in for Zero123-Plus
    multiview generation, ``Zero123/batch_aug.py:47``)."""
    xy = jnp.asarray(TEMPLATE_XY)
    for ci in range(len(_CHAINS)):
        pivot = xy[_CHAIN_PIVOTS[ci]]
        rotated = (xy - pivot) @ _rot2(swings[ci]).T + pivot
        m = _CHAIN_MASKS[ci][:, None]
        xy = m * rotated + (1.0 - m) * xy
    return xy


def camera_transform(xy: jax.Array, scale, theta, trans) -> jax.Array:
    """Global similarity transform (the 'camera'): rotate by ``theta``
    about the body center, scale, translate. Same math as the random
    global transform inside :func:`sample_pose`."""
    center = jnp.array([0.5, 0.55], jnp.float32)
    return ((xy - center) @ _rot2(theta).T * scale + center
            + jnp.asarray(trans, jnp.float32))


def sample_pose(key: jax.Array, swing_center: jax.Array | None = None,
                swing_spread: float = 1.0
                ) -> tuple[jax.Array, jax.Array, jax.Array]:
    """One random articulated pose → (xy (33,2), z (33,), vis (33,)).

    xy is in normalized [0,1] image coords (some joints may exit the
    frame — their visibility target drops accordingly, like MediaPipe's
    low-visibility scores for out-of-view landmarks).

    ``swing_center`` (8,) makes sampling CLASS-CONDITIONAL: articulation
    angles are drawn around that preset (within ``swing_spread`` of the
    usual range, clipped to the kinematic limits) instead of uniformly —
    a fixed center *is* a pose class, which is how the end-to-end
    pose-classification demos synthesize sun-salutation-style classes
    (the reference's classes are likewise articulation presets of one
    body). Defaults reproduce the unconditional sampler bit-for-bit.
    """
    ks = jax.random.split(key, 7)

    # Limb articulation, proximal chains first.
    swings = jax.random.uniform(
        ks[0], (len(_CHAINS),), minval=-1.0, maxval=1.0) * _CHAIN_RANGE
    if swing_center is not None:
        swings = jnp.clip(jnp.asarray(swing_center)
                          + swing_spread * swings,
                          -_CHAIN_RANGE, _CHAIN_RANGE)
    xy = articulate(swings)

    # Global similarity transform.
    scale = jax.random.uniform(ks[1], minval=0.55, maxval=0.95)
    theta = jax.random.uniform(ks[2], minval=-0.5, maxval=0.5)
    trans = jax.random.uniform(ks[3], (2,), minval=-0.12, maxval=0.12)
    xy = camera_transform(xy, scale, theta, trans)

    # Per-joint jitter (uncorrelated detail the net must localize).
    xy = xy + 0.01 * jax.random.normal(ks[4], xy.shape)

    # Depth: a global forward/backward lean makes z a linear function of
    # template height + noise; encoded in render intensity.
    lean = jax.random.uniform(ks[5], minval=-0.35, maxval=0.35)
    z = lean * (jnp.asarray(TEMPLATE_XY)[:, 1] - 0.55)
    z = z + 0.02 * jax.random.normal(ks[6], z.shape)

    # Visibility target: smoothly drops as a joint leaves the frame.
    inside = jnp.prod(
        jax.nn.sigmoid(xy / 0.01) * jax.nn.sigmoid((1.0 - xy) / 0.01),
        axis=-1)
    vis = jnp.clip(inside, 0.0, 1.0)
    return xy.astype(jnp.float32), z.astype(jnp.float32), vis


def render_pose(xy: jax.Array, z: jax.Array, image_size: int = 256,
                bone_sigma: float = 0.010, joint_sigma: float = 0.018
                ) -> jax.Array:
    """(33,2) coords + (33,) depth → (S,S,3) float32 image in [0,1].

    Pure jnp: distances from every pixel center to every bone segment
    and joint, gaussian falloff, per-side channel assignment via two
    one-hot matmuls. Depth modulates intensity (near = bright).
    """
    s = image_size
    centers = (jnp.arange(s, dtype=jnp.float32) + 0.5) / s
    px, py = jnp.meshgrid(centers, centers, indexing="xy")
    pix = jnp.stack([px.reshape(-1), py.reshape(-1)], axis=-1)  # (P,2)

    depth_gain = jnp.clip(1.0 - 1.5 * z, 0.35, 1.65)           # (33,)

    # Bones: point-to-segment distance.
    p = xy[BONES[:, 0]]                                        # (K,2)
    q = xy[BONES[:, 1]]
    seg = q - p
    len2 = jnp.sum(seg * seg, axis=-1) + 1e-8                  # (K,)
    rel = pix[:, None, :] - p[None, :, :]                      # (P,K,2)
    t = jnp.clip(jnp.sum(rel * seg[None], axis=-1) / len2, 0.0, 1.0)
    d2 = jnp.sum((rel - t[..., None] * seg[None]) ** 2, axis=-1)  # (P,K)
    bone_gain = 0.5 * (depth_gain[BONES[:, 0]] + depth_gain[BONES[:, 1]])
    bone_int = jnp.exp(-d2 / (2.0 * bone_sigma**2)) * bone_gain[None]
    bone_rgb = bone_int @ jax.nn.one_hot(BONE_CHANNEL, 3)      # (P,3)

    # Joint blobs.
    d2j = jnp.sum((pix[:, None, :] - xy[None]) ** 2, axis=-1)  # (P,33)
    joint_int = jnp.exp(-d2j / (2.0 * joint_sigma**2)) * depth_gain[None]
    joint_rgb = joint_int @ jax.nn.one_hot(JOINT_CHANNEL, 3)

    img = jnp.clip(0.65 * bone_rgb + joint_rgb, 0.0, 1.0)
    return img.reshape(s, s, 3)


def augment_pose_batch(key: jax.Array, imgs: jax.Array, xy: jax.Array,
                       occlude_p: float = 0.0, mirror_p: float = 0.0
                       ) -> tuple[jax.Array, jax.Array]:
    """Occlusion + mirror augmentation, on device, inside the jitted
    data program. Returns (imgs, xy); z and visibility are unchanged —
    an occluded joint keeps its coordinate target (the net must infer
    it from kinematic context, matching the robustness eval's contract,
    ``scripts/pose_robustness_eval.py``).

    occlude_p — per-sample probability of a random black square patch
      (side S/4..S/2) pasted after rendering.
    mirror_p — per-sample probability of a horizontal flip with x→1−x
      targets and UNCHANGED landmark indices: the subject's left limbs
      now appear on the image's left, so side identity is readable only
      from the renderer's per-side channel coding — exactly MediaPipe's
      chirality contract on mirrored video.
    """
    b, s = imgs.shape[0], imgs.shape[1]
    ko1, ko2, ko3, ko4, km = jax.random.split(key, 5)
    if occlude_p > 0.0:
        side = jax.random.randint(ko1, (b,), s // 4, s // 2 + 1)
        oy = jax.random.randint(ko2, (b,), 0, s - s // 4)
        ox = jax.random.randint(ko3, (b,), 0, s - s // 4)
        gate = jax.random.bernoulli(ko4, occlude_p, (b,))
        yy = jnp.arange(s)[None, :, None]
        xx = jnp.arange(s)[None, None, :]
        patch = ((yy >= oy[:, None, None])
                 & (yy < (oy + side)[:, None, None])
                 & (xx >= ox[:, None, None])
                 & (xx < (ox + side)[:, None, None]))
        imgs = jnp.where((patch & gate[:, None, None])[..., None],
                         0.0, imgs)
    if mirror_p > 0.0:
        gate = jax.random.bernoulli(km, mirror_p, (b,))
        imgs = jnp.where(gate[:, None, None, None],
                         imgs[:, :, ::-1, :], imgs)
        xy = jnp.where(gate[:, None, None],
                       xy.at[..., 0].set(1.0 - xy[..., 0]), xy)
    return imgs, xy


def make_pose_batch(key: jax.Array, batch_size: int,
                    image_size: int = 256, noise: float = 0.03,
                    occlude_p: float = 0.0, mirror_p: float = 0.0):
    """One jittable program: (key) → (images (B,S,S,3), xy, z, vis).

    Intended use: ``jax.jit(partial(make_pose_batch, batch_size=B,
    image_size=S))`` — the whole data pipeline for the pose model runs
    on device, nothing crosses the host boundary but the key.

    ``occlude_p`` / ``mirror_p`` enable :func:`augment_pose_batch`
    (static gates: the defaults compile to the exact pre-augmentation
    program, bit-for-bit).
    """
    kp, kn = jax.random.split(key)
    xy, z, vis = jax.vmap(sample_pose)(jax.random.split(kp, batch_size))
    imgs = jax.vmap(lambda a, b: render_pose(a, b, image_size))(xy, z)
    imgs = jnp.clip(
        imgs + noise * jax.random.normal(kn, imgs.shape), 0.0, 1.0)
    if occlude_p > 0.0 or mirror_p > 0.0:
        imgs, xy = augment_pose_batch(jax.random.fold_in(key, 7),
                                      imgs, xy, occlude_p, mirror_p)
    return imgs, xy, z, vis


def class_swing_centers(num_classes: int, seed: int = 1234) -> np.ndarray:
    """Deterministic per-class articulation presets, (C, 8).

    Each row is a fixed joint-angle configuration — a pose class the
    way the reference's eight sun-salutation asanas are (distinct limb
    configurations of one body). Drawn inside ±0.85 of the kinematic
    range so conditional sampling retains jitter room.
    """
    rng = np.random.default_rng(seed)
    return (rng.uniform(-0.85, 0.85, (num_classes, len(_CHAINS)))
            * _CHAIN_RANGE).astype(np.float32)


def make_pose_class_batch(key: jax.Array, labels: jax.Array,
                          centers: jax.Array, image_size: int = 256,
                          noise: float = 0.03,
                          swing_spread: float = 0.25):
    """Class-conditional variant of :func:`make_pose_batch`.

    (key, labels (B,) int32) → (images (B,S,S,3), xy, z, vis); one
    jittable program like the unconditional sampler. ``centers`` is
    (C, 8) from :func:`class_swing_centers` (or custom choreography).
    """
    labels = jnp.asarray(labels)
    centers = jnp.asarray(centers)
    kp, kn = jax.random.split(key)
    keys = jax.random.split(kp, labels.shape[0])
    xy, z, vis = jax.vmap(
        lambda k, c: sample_pose(k, swing_center=c,
                                 swing_spread=swing_spread)
    )(keys, centers[labels])
    imgs = jax.vmap(lambda a, b: render_pose(a, b, image_size))(xy, z)
    imgs = jnp.clip(
        imgs + noise * jax.random.normal(kn, imgs.shape), 0.0, 1.0)
    return imgs, xy, z, vis
