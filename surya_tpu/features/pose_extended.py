"""Extended per-frame pose feature set (the sequence pipeline's features).

Parity with ``sqn process/processing_image_sequence.py:96-247``
(``calculate_all_features``), vectorized over whole (…, T, 33, 4)
landmark sequences:

1. 33 × (norm x, y, z, visibility)                              = 132
2. 10 joint angles from PIXEL coords, visibility-gated at 0.65  =  10
   (ANGLE_DEFINITIONS ``:42-53`` — incl. TORSO_VERTICAL_ANGLE and
   TORSO_HORIZONTAL_ALIGNMENT as 3-point angles, which differ from the
   47-feature set's vector-angle variants)
3. 3 body-scale-normalized pixel distances                      =   3
   (scale = shoulder width if > 0.05·W, else hip width if > 0.05·W,
   else H/3; ``:121-141``)
4. 33 × mid-hip-relative normalized coords (vis-gated)          =  99
5. 33 × (vx, vy, vz, ax, ay, az) pixel dynamics from a 2-frame
   history, NaN when any of the 3 frames' landmark is invisible = 198
6. torso variance ratio (var_x+1e-6)/(var_y+1e-6), ≥2 visible   =   1
                                                           total = 443

NOTE on the "575" figure: the reference's own
``img process/analyze_flat_image_counts.py:119-137`` builds its column
list with ``range(LEFT_SHOULDER + 1)`` (12 landmarks → 170 columns)
while its comment claims 575; neither matches. This implementation
follows what ``calculate_all_features`` actually computes for all 33
landmarks (443 features), which is what the per-clip feature CSVs
contain.

Dynamics need temporal context, so the public API takes a sequence and
returns per-frame features; the first two frames' dynamics are NaN
(the reference's 2-deep landmark history deque, ``:375,410-416``).
"""

from __future__ import annotations

import jax.numpy as jnp

from surya_tpu.features import landmarks as L

VIS = L.VISIBILITY_THRESHOLD  # 0.65

# ANGLE_DEFINITIONS (processing_image_sequence.py:42-53)
ANGLES_EXTENDED = (
    ("LEFT_ELBOW_ANGLE", (L.LEFT_SHOULDER, L.LEFT_ELBOW, L.LEFT_WRIST)),
    ("RIGHT_ELBOW_ANGLE", (L.RIGHT_SHOULDER, L.RIGHT_ELBOW,
                           L.RIGHT_WRIST)),
    ("LEFT_SHOULDER_ANGLE", (L.LEFT_ELBOW, L.LEFT_SHOULDER, L.LEFT_HIP)),
    ("RIGHT_SHOULDER_ANGLE", (L.RIGHT_ELBOW, L.RIGHT_SHOULDER,
                              L.RIGHT_HIP)),
    ("LEFT_KNEE_ANGLE", (L.LEFT_HIP, L.LEFT_KNEE, L.LEFT_ANKLE)),
    ("RIGHT_KNEE_ANGLE", (L.RIGHT_HIP, L.RIGHT_KNEE, L.RIGHT_ANKLE)),
    ("LEFT_HIP_ANGLE", (L.LEFT_SHOULDER, L.LEFT_HIP, L.LEFT_KNEE)),
    ("RIGHT_HIP_ANGLE", (L.RIGHT_SHOULDER, L.RIGHT_HIP, L.RIGHT_KNEE)),
    ("TORSO_VERTICAL_ANGLE", (L.NOSE, L.LEFT_SHOULDER, L.LEFT_HIP)),
    ("TORSO_HORIZONTAL_ALIGNMENT", (L.LEFT_SHOULDER, L.RIGHT_SHOULDER,
                                    L.LEFT_HIP)),
)

FEATURE_NAMES_EXTENDED = tuple(
    [f"LM{i}_{s}" for i in range(33)
     for s in ("norm_x", "norm_y", "norm_z", "visibility")]
    + [name for name, _ in ANGLES_EXTENDED]
    + ["DIST_LR_WRIST_NORM", "DIST_LR_ANKLE_NORM",
       "DIST_L_WRIST_HIP_NORM"]
    + [f"LM{i}_rel_{a}_norm" for i in range(33) for a in "xyz"]
    + [f"LM{i}_{s}_px" for i in range(33)
       for s in ("vx", "vy", "vz", "ax", "ay", "az")]
    + ["TORSO_VAR_XY_RATIO"])
NUM_FEATURES_EXTENDED = len(FEATURE_NAMES_EXTENDED)
assert NUM_FEATURES_EXTENDED == 443, NUM_FEATURES_EXTENDED

_NAN = jnp.float32(jnp.nan)


def extract_features_extended(landmarks: jnp.ndarray, img_width,
                              img_height) -> jnp.ndarray:
    """(…, T, 33, 4) normalized landmarks → (…, T, 443) features.

    ``img_width``/``img_height`` may be scalars or per-frame arrays of
    shape ``landmarks.shape[:-2]`` (the reference reads h, w from each
    frame, ``processing_image_sequence.py:386`` — mixed-size clips need
    per-frame sizes for correct pixel coordinates)."""
    xyz = landmarks[..., :3]
    vis = landmarks[..., 3]
    visible = vis > VIS

    img_width = jnp.asarray(img_width, jnp.float32)
    img_height = jnp.asarray(img_height, jnp.float32)
    # Pixel coords: (x·W, y·H, z·W) (``:57-68``).
    whw = jnp.stack(jnp.broadcast_arrays(img_width, img_height,
                                         img_width), axis=-1)
    px = xyz * whw[..., None, :]

    feats = []

    # 1. Raw normalized coords + visibility, LM-major interleaved.
    for i in range(33):
        feats += [xyz[..., i, 0], xyz[..., i, 1], xyz[..., i, 2],
                  vis[..., i]]

    # 2. Angles from pixel coords, NaN unless all three visible.
    def p(i):
        return px[..., i, :]

    for _, (a, b, c) in ANGLES_EXTENDED:
        ba = p(a) - p(b)
        bc = p(c) - p(b)
        nprod = (jnp.linalg.norm(ba, axis=-1)
                 * jnp.linalg.norm(bc, axis=-1))
        # degenerate zero-length vector → angle 0.0, matching the
        # reference's explicit guard (processing_image_sequence.py:88-89)
        cos = jnp.where(nprod > 0,
                        jnp.sum(ba * bc, axis=-1)
                        / jnp.maximum(nprod, 1e-12), 1.0)
        ang = jnp.degrees(jnp.arccos(jnp.clip(cos, -1.0, 1.0)))
        ok = visible[..., a] & visible[..., b] & visible[..., c]
        feats.append(jnp.where(ok, ang, _NAN))

    # 3. Normalized pixel distances with the fallback body scale.
    def pdist(i, j):
        return jnp.linalg.norm(p(i) - p(j), axis=-1)

    sw_ok = visible[..., L.LEFT_SHOULDER] & visible[..., L.RIGHT_SHOULDER]
    hw_ok = visible[..., L.LEFT_HIP] & visible[..., L.RIGHT_HIP]
    shoulder_w = jnp.where(sw_ok, pdist(L.LEFT_SHOULDER,
                                        L.RIGHT_SHOULDER), 0.0)
    hip_w = jnp.where(hw_ok, pdist(L.LEFT_HIP, L.RIGHT_HIP), 0.0)
    thresh = 0.05 * img_width
    body_scale = jnp.where(shoulder_w > thresh, shoulder_w,
                           jnp.where(hip_w > thresh, hip_w,
                                     img_height / 3.0))
    body_scale = jnp.where(body_scale == 0, 1.0, body_scale)
    for i, j in ((L.LEFT_WRIST, L.RIGHT_WRIST),
                 (L.LEFT_ANKLE, L.RIGHT_ANKLE),
                 (L.LEFT_WRIST, L.LEFT_HIP)):
        ok = visible[..., i] & visible[..., j]
        feats.append(jnp.where(ok, pdist(i, j) / body_scale, _NAN))

    # 4. Mid-hip-relative normalized coords (hips fallback → image
    #    center (0.5, 0.5, 0)); per-landmark NaN when invisible.
    hips_ok = visible[..., L.LEFT_HIP] & visible[..., L.RIGHT_HIP]
    mid_hip = 0.5 * (xyz[..., L.LEFT_HIP, :] + xyz[..., L.RIGHT_HIP, :])
    center = jnp.asarray([0.5, 0.5, 0.0], xyz.dtype)
    mid_hip = jnp.where(hips_ok[..., None], mid_hip, center)
    rel = xyz - mid_hip[..., None, :]
    for i in range(33):
        for a in range(3):
            feats.append(jnp.where(visible[..., i], rel[..., i, a],
                                   _NAN))

    # 5. Pixel velocity/acceleration over the time axis; all three
    #    frames' landmark must be visible. Frames t<2 are NaN.
    prev = jnp.roll(px, 1, axis=-3)
    prev2 = jnp.roll(px, 2, axis=-3)
    v_prev = jnp.roll(visible, 1, axis=-2)
    v_prev2 = jnp.roll(visible, 2, axis=-2)
    t_idx = jnp.arange(landmarks.shape[-3])
    has_hist = (t_idx >= 2)
    while has_hist.ndim < visible.ndim - 1:
        has_hist = has_hist[None]
    dyn_ok = (visible & v_prev & v_prev2
              & has_hist[..., :, None])
    vel = px - prev
    acc = vel - (prev - prev2)
    for i in range(33):
        ok = dyn_ok[..., i]
        for a in range(3):
            feats.append(jnp.where(ok, vel[..., i, a], _NAN))
        for a in range(3):
            feats.append(jnp.where(ok, acc[..., i, a], _NAN))

    # 6. Torso variance ratio with epsilons (``:226-245``).
    torso_idx = jnp.asarray(L.TORSO)
    tx = xyz[..., torso_idx, 0]
    ty = xyz[..., torso_idx, 1]
    tv = visible[..., torso_idx]
    cnt = jnp.sum(tv, axis=-1)
    denom = jnp.maximum(cnt, 1)

    def mvar(v):
        mean = jnp.sum(jnp.where(tv, v, 0.0), axis=-1) / denom
        return jnp.sum(jnp.where(tv, (v - mean[..., None]) ** 2, 0.0),
                       axis=-1) / denom

    ratio = (mvar(tx) + 1e-6) / (mvar(ty) + 1e-6)
    feats.append(jnp.where(cnt > 1, ratio, _NAN))

    return jnp.stack(feats, axis=-1).astype(jnp.float32)
