"""Golden tests: batched jnp 47-feature math vs a per-frame numpy oracle.

The oracle re-implements the reference formulas
(experiment/1_prepare_still_image_dataset.py:33-113,226-295) naively,
one frame at a time, and the batched jnp version must agree.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from surya_tpu.features import FEATURE_NAMES_47, NUM_FEATURES, extract_features_47
from surya_tpu.features import landmarks as L


def _oracle_one(lm):
    """lm: (33, 4). Returns (47,) with NaNs where the reference emits."""
    xyz = lm[:, :3]
    vis = lm[:, 3]
    out = list(vis)

    def angle(a, b, c):
        ba, bc = xyz[a] - xyz[b], xyz[c] - xyz[b]
        cos = np.dot(ba, bc) / (np.linalg.norm(ba) * np.linalg.norm(bc))
        return np.degrees(np.arccos(np.clip(cos, -1, 1)))

    for _, (a, b, c) in L.ANGLES_47:
        out.append(angle(a, b, c))

    mid_hip = (xyz[L.LEFT_HIP] + xyz[L.RIGHT_HIP]) / 2
    mid_sh = (xyz[L.LEFT_SHOULDER] + xyz[L.RIGHT_SHOULDER]) / 2
    t = (mid_sh - mid_hip)[:2]
    ang = np.degrees(np.arctan2(1, 0) - np.arctan2(t[1], t[0]))
    ang = abs(ang)
    out.append(360 - ang if ang > 180 else ang)

    sv = xyz[L.RIGHT_SHOULDER][:2] - xyz[L.LEFT_SHOULDER][:2]
    hv = xyz[L.RIGHT_HIP][:2] - xyz[L.LEFT_HIP][:2]
    diff = abs(np.degrees(np.arctan2(sv[1], sv[0]))
               - np.degrees(np.arctan2(hv[1], hv[0])))
    out.append(360 - diff if diff > 180 else diff)

    def d(i, j):
        return np.linalg.norm(xyz[i] - xyz[j])

    sw, hw = d(L.LEFT_SHOULDER, L.RIGHT_SHOULDER), d(L.LEFT_HIP, L.RIGHT_HIP)
    scale = np.mean([sw, hw]) if (sw > 0 and hw > 0) else 1.0
    if scale == 0:
        scale = 1.0
    for i, j in ((L.LEFT_WRIST, L.RIGHT_WRIST),
                 (L.LEFT_ANKLE, L.RIGHT_ANKLE),
                 (L.LEFT_WRIST, L.LEFT_HIP)):
        out.append(d(i, j) / scale if scale > 0.05 else np.nan)

    tis = [11, 12, 23, 24]
    xs = [xyz[i, 0] for i in tis if vis[i] > 0.65]
    ys = [xyz[i, 1] for i in tis if vis[i] > 0.65]
    if len(xs) >= 2 and len(ys) >= 2:
        vy = np.var(ys)
        out.append(np.var(xs) / vy if vy != 0 else np.nan)
    else:
        out.append(np.nan)
    return np.array(out, np.float32)


@pytest.fixture
def random_landmarks():
    rng = np.random.default_rng(42)
    lm = rng.uniform(0, 1, (32, 33, 4)).astype(np.float32)
    # mix of visibility regimes so the torso-variance gating is exercised
    lm[..., 3] = rng.uniform(0, 1, (32, 33))
    return lm


def test_feature_names_and_count():
    assert NUM_FEATURES == 47
    assert FEATURE_NAMES_47[0] == "LM0_visibility"
    assert FEATURE_NAMES_47[33] == "LEFT_ELBOW_ANGLE"
    assert FEATURE_NAMES_47[46] == "TORSO_VAR_XY_RATIO"


def test_matches_oracle(random_landmarks):
    got = np.asarray(extract_features_47(jnp.asarray(random_landmarks)))
    want = np.stack([_oracle_one(lm) for lm in random_landmarks])
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_no_pose_row():
    lm = np.random.default_rng(0).uniform(0, 1, (4, 33, 4)).astype(
        np.float32)
    detected = jnp.asarray([True, False, True, False])
    got = np.asarray(extract_features_47(jnp.asarray(lm), detected))
    # undetected rows: visibilities zero, engineered features NaN
    assert np.all(got[1, :33] == 0.0)
    assert np.all(np.isnan(got[1, 33:]))
    assert np.all(np.isfinite(got[0, :33]))


def test_body_scale_guard():
    # All landmarks identical → widths 0 → scale falls back to 1.0 →
    # distances are 0.0 (reference semantics, not NaN).
    lm = np.zeros((1, 33, 4), np.float32)
    got = np.asarray(extract_features_47(jnp.asarray(lm)))
    assert np.all(got[0, 43:46] == 0.0)

    # Tiny-but-nonzero widths → scale ≤ 0.05 → NaN (guard at :264).
    lm2 = np.zeros((1, 33, 4), np.float32)
    lm2[0, L.RIGHT_SHOULDER, 0] = 0.01   # shoulder width 0.01
    lm2[0, L.RIGHT_HIP, 0] = 0.01        # hip width 0.01
    got2 = np.asarray(extract_features_47(jnp.asarray(lm2)))
    assert np.all(np.isnan(got2[0, 43:46]))


def test_batched_shapes():
    lm = jnp.zeros((2, 5, 33, 4))
    out = extract_features_47(lm)
    assert out.shape == (2, 5, 47)
