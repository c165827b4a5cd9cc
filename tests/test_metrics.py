"""Golden tests: on-device metrics vs sklearn (reference's metric source)."""

import numpy as np
import pytest
from sklearn.metrics import (
    accuracy_score,
    confusion_matrix as sk_confusion,
    precision_recall_fscore_support,
    r2_score as sk_r2,
)

import jax.numpy as jnp

from surya_tpu.core.metrics import (
    accuracy,
    confusion_matrix,
    precision_recall_f1,
    r2_score,
)


@pytest.fixture
def labels_preds():
    rng = np.random.default_rng(0)
    labels = rng.integers(0, 8, 200)
    preds = labels.copy()
    flip = rng.random(200) < 0.3
    preds[flip] = rng.integers(0, 8, flip.sum())
    return labels.astype(np.int32), preds.astype(np.int32)


def test_confusion_matrix(labels_preds):
    labels, preds = labels_preds
    got = np.asarray(confusion_matrix(jnp.asarray(labels),
                                      jnp.asarray(preds), 8))
    want = sk_confusion(labels, preds, labels=range(8))
    np.testing.assert_array_equal(got, want)


def test_accuracy(labels_preds):
    labels, preds = labels_preds
    got = float(accuracy(jnp.asarray(labels), jnp.asarray(preds)))
    assert got == pytest.approx(accuracy_score(labels, preds))


def test_weighted_prf1(labels_preds):
    labels, preds = labels_preds
    cm = confusion_matrix(jnp.asarray(labels), jnp.asarray(preds), 8)
    p, r, f1 = precision_recall_f1(cm, average="weighted")
    sp, sr, sf1, _ = precision_recall_fscore_support(
        labels, preds, average="weighted", zero_division=0)
    assert float(p) == pytest.approx(sp, abs=1e-5)
    assert float(r) == pytest.approx(sr, abs=1e-5)
    assert float(f1) == pytest.approx(sf1, abs=1e-5)


def test_r2(labels_preds):
    labels, preds = labels_preds
    got = float(r2_score(jnp.asarray(labels), jnp.asarray(preds)))
    assert got == pytest.approx(sk_r2(labels, preds), abs=1e-5)
