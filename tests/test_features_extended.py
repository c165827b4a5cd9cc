"""Extended (443-)feature set vs a per-frame numpy oracle."""

import numpy as np

import jax.numpy as jnp

from surya_tpu.features import landmarks as L
from surya_tpu.features.pose_extended import (
    ANGLES_EXTENDED,
    FEATURE_NAMES_EXTENDED,
    NUM_FEATURES_EXTENDED,
    extract_features_extended,
)

W, H = 640, 480
VIS = 0.65


def _px(lm):
    return np.stack([lm[:, 0] * W, lm[:, 1] * H, lm[:, 2] * W], axis=-1)


def _oracle_frame(lm, prev, prev2, has_hist):
    out = []
    xyz, vis = lm[:, :3], lm[:, 3]
    px = _px(lm)
    visible = vis > VIS
    for i in range(33):
        out += [xyz[i, 0], xyz[i, 1], xyz[i, 2], vis[i]]
    for _, (a, b, c) in ANGLES_EXTENDED:
        if visible[a] and visible[b] and visible[c]:
            ba, bc = px[a] - px[b], px[c] - px[b]
            cos = ba @ bc / (np.linalg.norm(ba) * np.linalg.norm(bc))
            out.append(np.degrees(np.arccos(np.clip(cos, -1, 1))))
        else:
            out.append(np.nan)
    sw = np.linalg.norm(px[L.LEFT_SHOULDER] - px[L.RIGHT_SHOULDER]) \
        if visible[L.LEFT_SHOULDER] and visible[L.RIGHT_SHOULDER] else 0
    hw = np.linalg.norm(px[L.LEFT_HIP] - px[L.RIGHT_HIP]) \
        if visible[L.LEFT_HIP] and visible[L.RIGHT_HIP] else 0
    scale = sw if sw > 0.05 * W else (hw if hw > 0.05 * W else H / 3)
    for i, j in ((L.LEFT_WRIST, L.RIGHT_WRIST),
                 (L.LEFT_ANKLE, L.RIGHT_ANKLE),
                 (L.LEFT_WRIST, L.LEFT_HIP)):
        out.append(np.linalg.norm(px[i] - px[j]) / scale
                   if visible[i] and visible[j] else np.nan)
    if visible[L.LEFT_HIP] and visible[L.RIGHT_HIP]:
        mid = (xyz[L.LEFT_HIP] + xyz[L.RIGHT_HIP]) / 2
    else:
        mid = np.array([0.5, 0.5, 0.0])
    for i in range(33):
        for a in range(3):
            out.append(xyz[i, a] - mid[a] if visible[i] else np.nan)
    for i in range(33):
        ok = (has_hist and visible[i] and prev[i, 3] > VIS
              and prev2[i, 3] > VIS)
        if ok:
            v = px[i] - _px(prev)[i]
            a_ = v - (_px(prev)[i] - _px(prev2)[i])
            out += list(v) + list(a_)
        else:
            out += [np.nan] * 6
    t_ids = list(L.TORSO)
    xs = [xyz[i, 0] for i in t_ids if visible[i]]
    ys = [xyz[i, 1] for i in t_ids if visible[i]]
    if len(xs) > 1:
        out.append((np.var(xs) + 1e-6) / (np.var(ys) + 1e-6))
    else:
        out.append(np.nan)
    return np.array(out, np.float32)


def test_count_and_names():
    assert NUM_FEATURES_EXTENDED == 443
    assert FEATURE_NAMES_EXTENDED[0] == "LM0_norm_x"
    assert FEATURE_NAMES_EXTENDED[-1] == "TORSO_VAR_XY_RATIO"


def test_matches_oracle():
    rng = np.random.default_rng(0)
    seq = rng.uniform(0, 1, (6, 33, 4)).astype(np.float32)
    seq[..., 3] = rng.uniform(0.3, 1.0, (6, 33))  # mixed visibility
    got = np.asarray(extract_features_extended(jnp.asarray(seq), W, H))
    assert got.shape == (6, 443)
    for t in range(6):
        want = _oracle_frame(seq[t], seq[t - 1] if t >= 1 else seq[0],
                             seq[t - 2] if t >= 2 else seq[0],
                             has_hist=t >= 2)
        np.testing.assert_allclose(got[t], want, rtol=2e-3, atol=2e-3,
                                   err_msg=f"frame {t}")


def test_batched_sequences():
    seq = jnp.asarray(np.random.default_rng(1).uniform(
        0, 1, (2, 5, 33, 4)), jnp.float32)
    out = extract_features_extended(seq, W, H)
    assert out.shape == (2, 5, 443)
