"""Per-class feature imputation + standardization.

Parity with the reference's NaN handling: per-class mean imputation
keyed by the sample's own label (``experiment/dataloader_cnn.py:98-109``)
and optional (x−μ_c)/σ_c standardization (``3dcnn/dataloaders.py:
119-139``). Stats come from the ``class_feature_means.json`` /
``class_feature_stds.json`` artifacts produced by the dataset prep
(``1_prepare_still_image_dataset.py:342-349``, std guarded by +1e-6).

Vectorized: stats become (num_classes, F) matrices; imputation is one
``jnp.where`` over the batch — runs on device inside the input fusion.
"""

from __future__ import annotations

import json

import jax.numpy as jnp
import numpy as np


class ClassFeatureStats:
    """(num_classes, F) mean/std tables indexed by integer label."""

    def __init__(self, means: np.ndarray, stds: np.ndarray | None,
                 class_names: list[str],
                 feature_names: list[str] | None = None):
        self.means = jnp.asarray(means, jnp.float32)
        self.stds = (jnp.asarray(stds, jnp.float32)
                     if stds is not None else None)
        self.class_names = list(class_names)
        self.feature_names = feature_names

    @classmethod
    def from_json(cls, means_path: str, stds_path: str | None = None,
                  feature_names: list[str] | None = None
                  ) -> "ClassFeatureStats":
        """Load the reference's JSON artifacts: {class: {feature: val}}."""
        with open(means_path) as f:
            means_raw = json.load(f)
        class_names = sorted(means_raw)
        if feature_names is None:
            from surya_tpu.features import FEATURE_NAMES_47
            feature_names = list(FEATURE_NAMES_47)

        def table(raw):
            out = np.zeros((len(class_names), len(feature_names)),
                           np.float32)
            for ci, cname in enumerate(class_names):
                row = raw.get(cname, {})
                for fi, fname in enumerate(feature_names):
                    out[ci, fi] = float(row.get(fname, 0.0))
            return out

        means = table(means_raw)
        stds = None
        if stds_path:
            with open(stds_path) as f:
                stds = table(json.load(f))
        return cls(means, stds, class_names, feature_names)

    def aligned_to(self, class_names) -> "ClassFeatureStats":
        """Reorder the stat rows to a dataset's class order.

        The JSON artifacts are keyed by name; nothing guarantees their
        sorted order matches the dataset's directory scan (extra or
        pruned classes shift every later index) — indexing by label
        without this check silently imputes with the WRONG class's
        means."""
        wanted = list(class_names)
        if wanted == self.class_names:
            return self
        try:
            idx = [self.class_names.index(c) for c in wanted]
        except ValueError:
            missing = sorted(set(wanted) - set(self.class_names))
            raise ValueError(
                f"feature stats cover classes {self.class_names} but "
                f"the dataset has {wanted} (missing {missing}); "
                "regenerate class_feature_means.json")
        return ClassFeatureStats(
            np.asarray(self.means)[idx],
            np.asarray(self.stds)[idx] if self.stds is not None else None,
            wanted, self.feature_names)

    def impute(self, features: jnp.ndarray,
               labels: jnp.ndarray) -> jnp.ndarray:
        """NaN → per-class mean (then any still-NaN → 0, matching the
        reference's nan_to_num fallback for unseen stats)."""
        m = self.means[labels]
        out = jnp.where(jnp.isnan(features), m, features)
        return jnp.nan_to_num(out)

    def standardize(self, features: jnp.ndarray,
                    labels: jnp.ndarray) -> jnp.ndarray:
        """(x − μ_c) / (σ_c + 1e-6) after imputation; features with
        σ_c < 1e-6 standardize to 0 (3dcnn/dataloaders.py:204-207)."""
        if self.stds is None:
            raise ValueError("no stds loaded")
        x = self.impute(features, labels)
        std = self.stds[labels]
        z = (x - self.means[labels]) / (std + 1e-6)
        return jnp.where(std < 1e-6, 0.0, z)


def compute_class_stats(features: np.ndarray, labels: np.ndarray,
                        num_classes: int) -> tuple[np.ndarray, np.ndarray]:
    """Train-split per-class NaN-aware mean/std (prep-time helper,
    parity with ``1_prepare_still_image_dataset.py:323-349``)."""
    f = features.shape[-1]
    means = np.zeros((num_classes, f), np.float32)
    stds = np.ones((num_classes, f), np.float32)
    for c in range(num_classes):
        rows = features[labels == c]
        if len(rows) == 0:
            continue
        with np.errstate(all="ignore"):
            m = np.nanmean(rows, axis=0)
            s = np.nanstd(rows, axis=0)
        means[c] = np.nan_to_num(m)
        stds[c] = np.nan_to_num(s)
    return means, stds
