"""The 47 engineered pose features as batched jax.numpy math.

Feature-for-feature parity with the reference extractor
(``experiment/1_prepare_still_image_dataset.py:33-113,226-295``), but
vectorized over a whole batch of landmark arrays instead of one Python
dict per frame — the per-frame feature math becomes a single fused XLA
program (only the MediaPipe landmark *detection* remains a host-side
dependency; see ``surya_tpu.data.prep.still_image_dataset``).

Layout: ``landmarks`` is (..., 33, 4) float32 = (x, y, z, visibility) in
MediaPipe normalized coordinates. Output is (..., 47) float32, NaN where
the reference emits NaN (failed guards), and all-NaN with zero
visibilities when ``pose_detected`` is False for a frame
(``:291-295``).

Feature order (asserted == 47 like the reference ``:113``):
  [0:33)  LM{i}_visibility
  [33:41) 8 joint angles (see landmarks.ANGLES_47), degrees
  [41]    TORSO_VERTICAL_ANGLE        [42] TORSO_HORIZONTAL_ALIGNMENT
  [43]    DIST_LR_WRIST_NORM  [44] DIST_LR_ANKLE_NORM
  [45]    DIST_L_WRIST_HIP_NORM
  [46]    TORSO_VAR_XY_RATIO
"""

from __future__ import annotations

import jax.numpy as jnp

from surya_tpu.features import landmarks as L

FEATURE_NAMES_47 = tuple(
    [f"LM{i}_visibility" for i in range(33)]
    + [name for name, _ in L.ANGLES_47]
    + ["TORSO_VERTICAL_ANGLE", "TORSO_HORIZONTAL_ALIGNMENT",
       "DIST_LR_WRIST_NORM", "DIST_LR_ANKLE_NORM",
       "DIST_L_WRIST_HIP_NORM", "TORSO_VAR_XY_RATIO"])
NUM_FEATURES = len(FEATURE_NAMES_47)
assert NUM_FEATURES == 47, NUM_FEATURES

_NAN = jnp.float32(jnp.nan)


def _angle_deg(p1, p2, p3):
    """3D angle at vertex p2, degrees (calculate_angle, ``:34-43``)."""
    ba = p1 - p2
    bc = p3 - p2
    cos = jnp.sum(ba * bc, axis=-1) / (
        jnp.linalg.norm(ba, axis=-1) * jnp.linalg.norm(bc, axis=-1))
    # reference does NOT clip; arccos of slightly-out-of-range → NaN there
    # too. We clip by eps only to avoid NaN from pure float rounding while
    # preserving NaN for genuinely degenerate inputs (zero-length limbs).
    return jnp.degrees(jnp.arccos(jnp.clip(cos, -1.0, 1.0)))


def _fold_180(deg):
    deg = jnp.abs(deg)
    return jnp.where(deg > 180.0, 360.0 - deg, deg)


def extract_features_47(landmarks: jnp.ndarray,
                        pose_detected: jnp.ndarray | None = None
                        ) -> jnp.ndarray:
    """(..., 33, 4) landmark array → (..., 47) features."""
    xyz = landmarks[..., :3]
    vis = landmarks[..., 3]

    def pt(i):
        return xyz[..., i, :]

    # [0:33) visibilities.
    feats = [vis[..., i] for i in range(L.NUM_LANDMARKS)]

    # 8 joint angles.
    for _, (a, b, c) in L.ANGLES_47:
        feats.append(_angle_deg(pt(a), pt(b), pt(c)))

    # TORSO_VERTICAL_ANGLE (``:52-81``): 2D angle between the torso
    # vector (mid_shoulder - mid_hip) and +y, via atan2 difference.
    mid_hip = 0.5 * (pt(L.LEFT_HIP) + pt(L.RIGHT_HIP))
    mid_shoulder = 0.5 * (pt(L.LEFT_SHOULDER) + pt(L.RIGHT_SHOULDER))
    torso = mid_shoulder - mid_hip
    angle_rad = (jnp.arctan2(1.0, 0.0)
                 - jnp.arctan2(torso[..., 1], torso[..., 0]))
    feats.append(_fold_180(jnp.degrees(angle_rad)))

    # TORSO_HORIZONTAL_ALIGNMENT (``:84-99``): |shoulder-line angle −
    # hip-line angle| folded to [0, 180].
    sh_vec = pt(L.RIGHT_SHOULDER)[..., :2] - pt(L.LEFT_SHOULDER)[..., :2]
    hip_vec = pt(L.RIGHT_HIP)[..., :2] - pt(L.LEFT_HIP)[..., :2]
    sh_ang = jnp.degrees(jnp.arctan2(sh_vec[..., 1], sh_vec[..., 0]))
    hip_ang = jnp.degrees(jnp.arctan2(hip_vec[..., 1], hip_vec[..., 0]))
    feats.append(_fold_180(sh_ang - hip_ang))

    # Body-scale-normalized distances (``:258-274``): body_scale =
    # mean(shoulder_width, hip_width) if both > 0 else 1.0; distances are
    # NaN unless body_scale > 0.05.
    def dist(i, j):
        return jnp.linalg.norm(pt(i) - pt(j), axis=-1)

    shoulder_w = dist(L.LEFT_SHOULDER, L.RIGHT_SHOULDER)
    hip_w = dist(L.LEFT_HIP, L.RIGHT_HIP)
    body_scale = jnp.where((shoulder_w > 0) & (hip_w > 0),
                           0.5 * (shoulder_w + hip_w), 1.0)
    body_scale = jnp.where(body_scale == 0, 1.0, body_scale)
    ok = body_scale > 0.05
    for i, j in ((L.LEFT_WRIST, L.RIGHT_WRIST),
                 (L.LEFT_ANKLE, L.RIGHT_ANKLE),
                 (L.LEFT_WRIST, L.LEFT_HIP)):
        feats.append(jnp.where(ok, dist(i, j) / body_scale, _NAN))

    # TORSO_VAR_XY_RATIO (``:276-291``): variance of x over variance of
    # y for torso landmarks with visibility > 0.65; needs ≥ 2 visible;
    # NaN when var_y == 0.
    torso_idx = jnp.asarray(L.TORSO)
    tx = xyz[..., torso_idx, 0]
    ty = xyz[..., torso_idx, 1]
    tv = vis[..., torso_idx] > L.VISIBILITY_THRESHOLD
    cnt = jnp.sum(tv, axis=-1)
    denom = jnp.maximum(cnt, 1)

    def masked_var(v):
        mean = jnp.sum(jnp.where(tv, v, 0.0), axis=-1) / denom
        sq = jnp.sum(jnp.where(tv, (v - mean[..., None]) ** 2, 0.0),
                     axis=-1)
        return sq / denom

    var_x = masked_var(tx)
    var_y = masked_var(ty)
    ratio = jnp.where((cnt >= 2) & (var_y != 0), var_x / var_y, _NAN)
    feats.append(ratio)

    out = jnp.stack(feats, axis=-1).astype(jnp.float32)

    if pose_detected is not None:
        # No-pose frames: all features NaN except visibilities = 0.0
        # (reference ``:291-295``).
        detected = pose_detected[..., None]
        nanrow = jnp.concatenate(
            [jnp.zeros(out.shape[:-1] + (33,), jnp.float32),
             jnp.full(out.shape[:-1] + (14,), jnp.nan, jnp.float32)],
            axis=-1)
        out = jnp.where(detected, out, nanrow)
    return out
